package graft.nba

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{exprs, relational, windows}

/** The reference's cleaning pipelines on its OWN table shapes — the domain
  * API a user of `oseghalepatrick/nba_pipeline` would migrate to. Each
  * function is the declarative equivalent of one scraper's pandas
  * transform chain, composed from the `graft.ops` operator layer; the
  * NbaSpec fixtures reproduce the reference's edge cases row for row.
  */
object NbaPipelines {

  /** The full 37-entry team→abbreviation dict (`playByplay.py:84-96`,
    * `boxScores.py:18-32`) as a broadcastable dim — includes every
    * historical franchise name the reference maps (relocations and
    * renames: SEA/VAN/NJN/WSB/NOH/NOK/CHA...), so an inner join against
    * real multi-season data never silently drops rows. */
  def teamAbbrevs(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Atlanta Hawks", "ATL"), ("Boston Celtics", "BOS"),
      ("Brooklyn Nets", "BRK"), ("Charlotte Bobcats", "CHA"),
      ("Charlotte Hornets", "CHO"), ("Chicago Bulls", "CHI"),
      ("Cleveland Cavaliers", "CLE"), ("Dallas Mavericks", "DAL"),
      ("Denver Nuggets", "DEN"), ("Detroit Pistons", "DET"),
      ("Golden State Warriors", "GSW"), ("Houston Rockets", "HOU"),
      ("Indiana Pacers", "IND"), ("Los Angeles Clippers", "LAC"),
      ("Los Angeles Lakers", "LAL"), ("Memphis Grizzlies", "MEM"),
      ("Miami Heat", "MIA"), ("Milwaukee Bucks", "MIL"),
      ("Minnesota Timberwolves", "MIN"), ("New Jersey Nets", "NJN"),
      ("New Orleans Hornets", "NOH"),
      ("New Orleans/Oklahoma City Hornets", "NOK"),
      ("New Orleans Pelicans", "NOP"), ("New York Knicks", "NYK"),
      ("Oklahoma City Thunder", "OKC"), ("Orlando Magic", "ORL"),
      ("Philadelphia 76ers", "PHI"), ("Phoenix Suns", "PHO"),
      ("Portland Trail Blazers", "POR"), ("Sacramento Kings", "SAC"),
      ("San Antonio Spurs", "SAS"), ("Seattle SuperSonics", "SEA"),
      ("Toronto Raptors", "TOR"), ("Utah Jazz", "UTA"),
      ("Vancouver Grizzlies", "VAN"), ("Washington Bullets", "WSB"),
      ("Washington Wizards", "WAS")
    ).toDF("teamName", "abbreviation")
  }

  /** `fixHornets` (`playByplay.py:5-9`): pre-2014 Charlotte Hornets used
    * the CHH code; override the joined abbreviation conditionally (J2). */
  def fixHornets(df: DataFrame, seasonCol: String): DataFrame =
    relational.overrideWhen(df, "abbreviation",
      col(seasonCol) < 2014 && col("teamName") === "Charlotte Hornets",
      lit("CHH"))

  /** `scrapeGames` cleanup (`games.py:34-88`): drop 'Playoffs' section
    * headers (F2), drop unplayed games (F1), parse the date (M4), flag
    * regular-season games via the season→playoff-start lookup (J4+M8),
    * drop pre-bubble exhibition rows of the COVID season (F6), sort and
    * assign deterministic game ids (O1+M7).
    *
    * @param playoffStarts (seasonStartYear, playoffStartDate) dim — the
    *                      26-entry dict at `games.py:56-61`.
    */
  def cleanGames(rawGames: DataFrame, playoffStarts: DataFrame): DataFrame =
    rawGames
      .filter(col("date") =!= "Playoffs")                            // F2
      .filter(col("pointsAway").isNotNull)                           // F1
      .withColumn("gameDate",
        to_date(regexp_replace(col("date"), "^[A-Za-z]+, ", ""),
          "MMM d, yyyy"))                                            // M4
      .join(broadcast(playoffStarts), Seq("seasonStartYear"))        // J4
      .withColumn("isRegular",
        exprs.boolFlag(col("gameDate") < col("playoffStart")))       // M8
      .filter(col("gameDate") > "2020-07-01" ||
              col("seasonStartYear") =!= 2019)                       // F6
      .orderBy(col("gameDate"), col("awayTeam"), col("homeTeam"))    // O1
      .select(
        col("seasonStartYear"), col("awayTeam"), col("pointsAway"),
        col("homeTeam"), col("pointsHome"), col("attendance"),
        col("notes"), col("startET"), col("gameDate"), col("isRegular"),
        exprs.detId(col("gameDate"), col("awayTeam"), col("homeTeam"))
          .as("game_id"))                                            // M7

  /** `scrapePlayByPlay` (`playByplay.py:97-132`): manifest join (J3),
    * clock parse (M1) + header-row filter (F5), period counter (W1),
    * score parse (M3) + forward-fill seeded 0-0 (W2), duplicate null-out
    * (M9), deterministic play ids (M7). */
  /** The gameKey manifest both raw-table joins share: the key format
    * is a JOIN CONTRACT with the scraped tables — one copy so a format
    * change cannot silently desync the two pipelines' manifests. */
  private def gameManifest(games: DataFrame): DataFrame =
    games.select(col("game_id"),
      concat_ws("|", col("gameDate"), col("awayTeam"), col("homeTeam"))
        .as("gameKey"))

  def cleanPlayByPlay(games: DataFrame, rawPbp: DataFrame): DataFrame = {
    val manifest = gameManifest(games)
    val w = windows.running(Seq(col("game_id")), Seq(col("seq")))

    rawPbp
      .join(manifest, Seq("gameKey"))                                // J3
      .withColumn("secondsLeft",
        exprs.clockToSeconds(col("periodTime")))                     // M1
      .filter(col("secondsLeft").isNotNull)                          // F5
      .withColumn("period",
        windows.runningCounter(col("secondsLeft") === 720, w))       // W1
      .withColumn("parsedScore", exprs.parseScore(col("score")))     // M3
      .withColumn("awayPoints",
        windows.forwardFill(col("parsedScore.away"), w, lit(0)))     // W2
      .withColumn("homePoints",
        windows.forwardFill(col("parsedScore.home"), w, lit(0)))
      .withColumn("event_away",
        exprs.nullOutWhen(col("eventAway"),
          // the reference's TWO-branch rule (playByplay.py:68-74):
          // null when equal to the companion column OR when the
          // companion is null/None — not equality alone
          col("eventAway") === col("eventHome") ||
            col("eventHome").isNull))                                // M9
      .select(col("game_id"),
        exprs.detId(col("game_id"), col("seq")).as("play_id"),       // M7
        col("seq"), col("period"), col("secondsLeft"),
        col("awayPoints"), col("homePoints"),
        col("event_away"), col("eventHome").as("event_home"))
  }

  /** `scrapeBoxScores` (`boxScores.py:34-81`): manifest join, starter
    * forward-fill from the 'Reserves'/'Team Totals' markers (W3), then
    * drop the marker rows themselves (F6). */
  def cleanBoxScores(games: DataFrame, rawBox: DataFrame): DataFrame = {
    val manifest = gameManifest(games)
    val w = windows.running(Seq(col("game_id"), col("teamName")),
      Seq(col("seq")))

    rawBox
      .join(manifest, Seq("gameKey"))
      .withColumn("isStarter",
        windows.markerFill(
          when(col("playerName") === "Reserves", 0)
            .when(col("playerName") === "Team Totals", 1), w,
          lit(1)))                                                   // W3
      .filter(col("playerName") =!= "Reserves" &&
              col("playerName") =!= "Team Totals")                   // F6
      .select(col("game_id"), col("teamName"), col("playerName"),
        col("mp"), col("pts"), col("isStarter"))
  }

  /** `scrapeCoaches` (`coaches.py:58-111`): season-pattern filter (F3),
    * season start year (M2), career-total row filter (F4), coach-type
    * classification (M6). */
  def cleanCoaches(rawCoaches: DataFrame): DataFrame =
    rawCoaches
      .filter(size(split(col("season"), "-")) === 2)                 // F3
      .withColumn("seasonStartYear",
        exprs.seasonStartYear(col("season")))                        // M2
      .filter(col("g_reg").try_cast("int").isNotNull)                // F4
      .withColumn("coachType",
        // the reference classifies BEFORE its isNumber mask, but the
        // mask keeps only int-parsable g_reg — so the surviving rows
        // are all "Head Coach" there too; filter-then-classify is
        // output-equivalent and skips classifying dropped rows
        exprs.classifyCoach(col("g_reg"), col("role"),
          "Player Development"))                                     // M6
      .select(col("coachName"), col("seasonStartYear"), col("tm"),
        col("g_reg").cast("int").as("g_reg"),
        col("w_reg").cast("int").as("w_reg"),
        col("l_reg").cast("int").as("l_reg"),
        col("coachType"),
        exprs.detId(col("coachName"), col("season")).as("coach_id"))

  /** `scrapePlayersSalary` (`playerSalary.py:11-25`): per-season page
    * union (A1/S2) with positional renames (P2/P4) happens at read; here
    * the post-union normalization. */
  def cleanSalaries(rawSalaries: DataFrame): DataFrame =
    rawSalaries
      .withColumn("salary",
        regexp_replace(col("salary"), "[$,]", "").try_cast("double"))
      .withColumn("inflationAdjSalary",
        regexp_replace(col("inflationAdjSalary"), "[$,]", "")
          .try_cast("double"))
      .filter(col("salary").isNotNull)
}
