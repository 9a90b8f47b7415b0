package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column expressions — SURVEY.md §2.7 (M1-M11).
  *
  * Every reference "UDF" is a pandas row function; all of them are
  * re-expressed as built-in Column expressions so they stay inside
  * whole-stage codegen and Catalyst can fold/push them. No Scala UDFs here.
  */
object exprs {

  /** M1 — clock string "MM:SS.f" → seconds (reference `playByplay.py:11-17`
    * `createTime`). Unparsable input → null (the reference lets such rows
    * pass through, then filters them — F5). `try_cast`-style null-on-failure
    * keeps ANSI mode happy.
    */
  def clockToSeconds(clock: Column): Column = {
    val parts = split(clock, ":")
    val mins = parts.getItem(0).try_cast("int")
    val secs = split(parts.getItem(1), "\\.").getItem(0).try_cast("int")
    mins * 60 + secs
  }

  /** M2 — "1999-00"-style season string → start year int
    * (reference `coaches.py:76`). */
  def seasonStartYear(season: Column): Column =
    split(season, "-").getItem(0).try_cast("int")

  /** M3 — "A-B" score string → (away, home) ints (reference
    * `playByplay.py:43-47` `createScore`). Returns a 2-field struct. */
  def parseScore(score: Column): Column = {
    val parts = split(score, "-")
    struct(
      parts.getItem(0).try_cast("int").as("away"),
      parts.getItem(1).try_cast("int").as("home"))
  }

  /** M7 — deterministic surrogate id. The reference uses `uuid.uuid4().hex`
    * per row (`games.py:83`, `playByplay.py:113`); its downstream logic only
    * needs uniqueness + stability within a run, so we swap in a content hash
    * (md5 of the natural key) — deterministic across runs and engines, which
    * the DuckDB oracle requires. Fully codegen'd, no shuffle.
    */
  def detId(naturalKey: Column*): Column = md5(concat_ws("|", naturalKey: _*))

  /** M8 — boolean → 0/1 int flag (reference `games.py:63-65` isRegular). */
  def boolFlag(cond: Column): Column = when(cond, 1).otherwise(0)

  /** M9 — conditional null-out (reference `playByplay.py:67-76`
    * `cleanDuplicateValues`): null the column when `cond` holds. */
  def nullOutWhen(c: Column, cond: Column): Column =
    when(cond, lit(null)).otherwise(c)

  /** M6 — conditional classify (reference `coaches.py:86-96`
    * `defineCoachType`): int-parsable games column → "Head Coach";
    * a passthrough sentinel keeps itself; anything else is truncated at the
    * word "Coach" and gets "Coach" re-appended. */
  def classifyCoach(games: Column, role: Column, sentinel: String): Column =
    when(games.try_cast("int").isNotNull, lit("Head Coach"))
      .when(role === sentinel, role)
      .otherwise(concat(split(role, "Coach").getItem(0), lit("Coach")))

  /** Classic American Soundex of a lowercase word, as a scan-local
    * aggregate-HOF fold (codegen'd, zero shuffle) — the PHONETIC
    * blocking key for record linkage (complements the Jaro-Winkler
    * scorer: block phonetically, score lexically).
    *
    * One `translate` maps every letter to its consonant class
    * ('9' = h/w, transparent; '0' = vowel, resets adjacency), then the
    * fold keeps a digit iff it is 1-6 and differs from the previous
    * non-transparent class — the textbook rules, verified against the
    * canonical robert/rupert/ashcraft/tymczak/pfister vectors in
    * ExprsSpec. */
  def soundexKey(word: Column): Column = {
    val digits = translate(word, "abcdefghijklmnopqrstuvwxyz",
      "01230129022455012623019202")
    aggregate(
      split(substring(digits, 2, 1000000), ""),
      struct(substring(digits, 1, 1).as("prev"),
        substring(word, 1, 1).as("key")),
      (acc, d) => struct(
        when(d === "9", acc("prev")).otherwise(d).as("prev"),
        when(d.between("1", "6") && d =!= acc("prev") &&
          length(acc("key")) < 4, concat(acc("key"), d))
          .otherwise(acc("key")).as("key")),
      acc => rpad(acc("key"), 4, "0"))
  }
}
