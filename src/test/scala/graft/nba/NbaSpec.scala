package graft.nba

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden tests over NBA-shaped fixtures reproducing the reference's edge
  * cases (SURVEY.md §5 item 2/4): 'Playoffs' section-header rows, unplayed
  * games, COVID exhibition rows, unparsable clock rows, period reset +
  * score seeding, 'Reserves'/'Team Totals' markers, career-total coach
  * rows, CHH-before-2014. */
class NbaSpec extends SparkSpec {
  import spark.implicits._

  private val playoffStarts = Seq(
    (1996, Date.valueOf("1997-04-19")),
    (2019, Date.valueOf("2020-08-15")))
    .toDF("seasonStartYear", "playoffStart")

  private def rawGames = Seq(
    // (date, startET, away, ptsA, home, ptsH, att, notes, season)
    ("Tue, Oct 29, 1996", "7:30p", "Chicago Bulls", Some(100),
      "Boston Celtics", Some(92), 18000, "", 1996),
    ("Playoffs", null, null, None, null, None, 0, "", 1996), // header row
    ("Wed, Apr 23, 1997", "8:00p", "Utah Jazz", Some(110),
      "Houston Rockets", Some(104), 17000, "", 1996),  // playoff game
    ("Fri, Nov 1, 1996", "7:00p", "New York Knicks", None,
      "Atlanta Hawks", None, 0, "", 1996),             // unplayed
    ("Sun, Mar 1, 2020", "3:00p", "Dallas Mavericks", Some(111),
      "Denver Nuggets", Some(97), 19000, "", 2019),    // pre-bubble: drop
    ("Sat, Aug 1, 2020", "8:00p", "Dallas Mavericks", Some(114),
      "Houston Rockets", Some(117), 0, "bubble", 2019))
    .toDF("date", "startET", "awayTeam", "pointsAway", "homeTeam",
      "pointsHome", "attendance", "notes", "seasonStartYear")

  test("cleanGames: headers/unplayed/exhibition dropped, flags + ids right") {
    val games = NbaPipelines.cleanGames(rawGames, playoffStarts).cache()
    val rows = games.collect()
    assert(rows.length === 3)
    // the COVID-season pre-bubble game is gone; bubble game kept
    assert(games.filter(col("seasonStartYear") === 2019).count() === 1)
    // playoff game flagged 0, regular game 1
    val byDate = rows.map(r => (r.getAs[Date]("gameDate").toString,
      r.getAs[Int]("isRegular"))).toMap
    assert(byDate("1996-10-29") === 1)
    assert(byDate("1997-04-23") === 0)
    // ids deterministic + distinct
    assert(games.select("game_id").distinct().count() === 3)
    games.unpersist()
  }

  test("cleanPlayByPlay: clock filter, period counter, score forward-fill") {
    val games = NbaPipelines.cleanGames(rawGames, playoffStarts)
    val key = "1996-10-29|Chicago Bulls|Boston Celtics"
    val rawPbp = Seq(
      (key, 1, "12:00.0", "Jump ball", null, null),
      (key, 2, "11:38.0", "J. Smith makes 2-pt", "2-0", null),
      (key, 3, "1st Quarter", null, null, null),       // header junk → F5
      (key, 4, "5:00.0", null, null, "Timeout"),
      (key, 5, "12:00.0", "Start of 2nd", null, null), // period bump
      (key, 6, "11:00.0", "T. Kukoc makes 3-pt", "5-0", null))
      .toDF("gameKey", "seq", "periodTime", "eventAway", "score",
        "eventHome")

    val pbp = NbaPipelines.cleanPlayByPlay(games, rawPbp)
      .orderBy("seq").collect()
    assert(pbp.length === 5) // junk row filtered
    val periods = pbp.map(_.getAs[Long]("period")).toSeq
    assert(periods === Seq(1L, 1L, 1L, 2L, 2L))
    val away = pbp.map(_.getAs[Int]("awayPoints")).toSeq
    assert(away === Seq(0, 2, 2, 2, 5)) // seeded 0, carried, updated
  }

  test("cleanBoxScores: starter fill from markers, markers dropped") {
    val games = NbaPipelines.cleanGames(rawGames, playoffStarts)
    val key = "1996-10-29|Chicago Bulls|Boston Celtics"
    val rawBox = Seq(
      (key, "Chicago Bulls", 1, "M. Jordan", "40:00", Some(44)),
      (key, "Chicago Bulls", 2, "S. Pippen", "38:00", Some(22)),
      (key, "Chicago Bulls", 3, "Reserves", null, None),
      (key, "Chicago Bulls", 4, "T. Kukoc", "20:00", Some(12)),
      (key, "Chicago Bulls", 5, "Team Totals", "240:00", Some(100)),
      (key, "Boston Celtics", 6, "A. Walker", "36:00", Some(31)))
      .toDF("gameKey", "teamName", "seq", "playerName", "mp", "pts")

    val box = NbaPipelines.cleanBoxScores(games, rawBox)
    val starters = box.select("playerName", "isStarter")
      .as[(String, Int)].collect().toMap
    assert(starters === Map(
      "M. Jordan" -> 1, "S. Pippen" -> 1,   // before Reserves marker
      "T. Kukoc" -> 0,                       // after Reserves
      "A. Walker" -> 1))                     // fresh partition default
  }

  test("cleanCoaches: career rows out, season split, classification") {
    val raw = Seq(
      ("1996-97", 54, "CHI", "NBA", "82", "69", "13", "P. Jackson",
        "Head Coach stuff"),
      ("Career", 60, "CHI", "NBA", "545", "450", "95", "P. Jackson",
        "whatever"),                         // F3: no season split
      ("1996-97", 44, "BOS", "NBA", "Did not coach", "0", "0", "M. L. Carr",
        "Assistant Coach for development"),  // F4: non-numeric games
      ("1997-98", 35, "NYK", "NBA", "82", "43", "39", "J. Van Gundy",
        "Player Development"))
      .toDF("season", "age", "tm", "lg", "g_reg", "w_reg", "l_reg",
        "coachName", "role")

    val coaches = NbaPipelines.cleanCoaches(raw)
    val rows = coaches.select("coachName", "seasonStartYear", "coachType")
      .as[(String, Int, String)].collect().toSet
    assert(rows === Set(
      ("P. Jackson", 1996, "Head Coach"),
      ("J. Van Gundy", 1997, "Head Coach")))
  }

  test("fixHornets: CHH before 2014, joined abbreviation after") {
    val df = Seq(
      ("Charlotte Hornets", 2010), ("Charlotte Hornets", 2016),
      ("Chicago Bulls", 2010))
      .toDF("teamName", "seasonStartYear")
      .join(broadcast(NbaPipelines.teamAbbrevs(spark)), Seq("teamName"))
    val fixed = NbaPipelines.fixHornets(df, "seasonStartYear")
      .select("teamName", "seasonStartYear", "abbreviation")
      .as[(String, Int, String)].collect().toSet
    assert(fixed === Set(
      ("Charlotte Hornets", 2010, "CHH"),
      ("Charlotte Hornets", 2016, "CHO"),
      ("Chicago Bulls", 2010, "CHI")))
  }

  test("cleanSalaries: currency strip + unparsable filter") {
    val raw = Seq(
      ("M. Jordan", "$30,140,000", "$55,000,000", 1996),
      ("Unknown", "n/a", "n/a", 1996))
      .toDF("playerName", "salary", "inflationAdjSalary", "seasonStartYear")
    val got = NbaPipelines.cleanSalaries(raw)
      .select("playerName", "salary").as[(String, Double)].collect()
    assert(got === Array(("M. Jordan", 3.014e7)))
  }

  test("NbaSchemas raw schemas are the cleaners' live input contract") {
    // each cleaner must ANALYZE against an empty frame of the declared
    // raw schema — a column the pipeline references but the schema
    // lacks (or vice-versa drift) fails here instead of at a CSV edge
    def empty(s: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), s)
    val games = NbaPipelines.cleanGames(
      empty(NbaSchemas.gamesRaw), playoffStarts)
    assert(games.count() === 0)
    assert(NbaPipelines.cleanPlayByPlay(games,
      empty(NbaSchemas.playByPlayRaw)).count() === 0)
    assert(NbaPipelines.cleanBoxScores(games,
      empty(NbaSchemas.boxScoresRaw)).count() === 0)
    assert(NbaPipelines.cleanCoaches(
      empty(NbaSchemas.coachesRaw)).count() === 0)
  }
}
