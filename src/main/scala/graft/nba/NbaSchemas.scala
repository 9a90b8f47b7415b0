package graft.nba

import org.apache.spark.sql.types._

/** Declared schemas for the reference's six logical tables (SURVEY.md §1).
  * The reference infers these from scraped HTML + CSV round-trips; here
  * they are explicit so the CSV edge is the only place inference exists.
  * Reference column sets: `playerInfo.py:5,11`, `playerSalary.py:9,15,22`,
  * `coaches.py:79-80,96`, `games.py:86-87`, `playByplay.py:103-125`,
  * `boxScores.py:37-39,76,80`.
  */
object NbaSchemas {

  val playersInfo: StructType = StructType(Seq(
    StructField("playerName", StringType),
    StructField("fromYear", IntegerType),
    StructField("toYear", IntegerType),
    StructField("pos", StringType),
    StructField("height", StringType),
    StructField("weight", IntegerType),
    StructField("birthDate", StringType),
    StructField("colleges", StringType)))

  val playersSalary: StructType = StructType(Seq(
    StructField("playerName", StringType),
    StructField("salary", DoubleType),
    StructField("inflationAdjSalary", DoubleType),
    StructField("seasonStartYear", IntegerType)))

  /** Raw coaches rows as scraped: 2-level header flattened into reg/playoff
    * column families (reference `coaches.py:50-53,79-80`). */
  val coachesRaw: StructType = StructType(Seq(
    StructField("season", StringType),
    StructField("age", IntegerType),
    StructField("tm", StringType),
    StructField("lg", StringType),
    StructField("g_reg", StringType),     // stringly: career rows say "Career"
    StructField("w_reg", StringType),
    StructField("l_reg", StringType),
    StructField("coachName", StringType),
    StructField("role", StringType)))

  val gamesRaw: StructType = StructType(Seq(
    StructField("date", StringType),      // "Tue, Oct 29, 1996" / 'Playoffs'
    StructField("startET", StringType),
    StructField("awayTeam", StringType),
    StructField("pointsAway", IntegerType),
    StructField("homeTeam", StringType),
    StructField("pointsHome", IntegerType),
    StructField("attendance", IntegerType),
    StructField("notes", StringType),
    StructField("seasonStartYear", IntegerType)))

  val playByPlayRaw: StructType = StructType(Seq(
    StructField("gameKey", StringType),   // manifest key before id-gen
    StructField("seq", IntegerType),      // stable scrape order (SURVEY §2.8)
    StructField("periodTime", StringType), // "12:00.0" / header junk
    StructField("eventAway", StringType),
    StructField("score", StringType),     // "98-102"
    StructField("eventHome", StringType)))

  val boxScoresRaw: StructType = StructType(Seq(
    StructField("gameKey", StringType),
    StructField("teamName", StringType),
    StructField("seq", IntegerType),
    StructField("playerName", StringType), // incl 'Reserves'/'Team Totals'
    StructField("mp", StringType),
    StructField("pts", IntegerType)))
}
