package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Reference edge cases from SURVEY.md §5 item 2: unparsable clock values
  * (F5/M1), classify fallthrough (M6), conditional null-out (M9),
  * deterministic ids (M7). */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  test("M1 clockToSeconds parses MM:SS.f and nulls junk") {
    val df = Seq("12:00.0", "0:34.5", "7:05.0", "Start of 2nd quarter", "")
      .toDF("clock")
      .select(exprs.clockToSeconds(col("clock")).as("secs"))
    assert(df.collect().map(r => Option(r.get(0))) ===
      Seq(Some(720), Some(34), Some(425), None, None))
  }

  test("M2 seasonStartYear splits '1999-00' style") {
    val df = Seq("1999-00", "2013-14", "Career").toDF("season")
      .select(exprs.seasonStartYear(col("season")).as("y"))
    assert(df.collect().map(r => Option(r.get(0))) ===
      Seq(Some(1999), Some(2013), None))
  }

  test("M3 parseScore splits 'A-B'") {
    val r = Seq("98-102").toDF("s")
      .select(exprs.parseScore(col("s")).as("p"))
      .select("p.away", "p.home").as[(Int, Int)].head()
    assert(r === ((98, 102)))
  }

  test("M6 classifyCoach: head coach / sentinel / truncate") {
    val df = Seq(("82", "whatever"), ("Did not coach", "Player Development"),
      ("x", "Assistant Coach for development"))
      .toDF("g", "role")
      .select(exprs.classifyCoach(col("g"), col("role"),
        "Player Development").as("t"))
    assert(df.as[String].collect().toSeq ===
      Seq("Head Coach", "Player Development", "Assistant Coach"))
  }

  test("M7 detId is deterministic and distinct per key") {
    val df = Seq((1L, "a"), (2L, "b"), (1L, "a")).toDF("k", "v")
      .select(exprs.detId(col("k"), col("v")).as("id"))
    val ids = df.as[String].collect()
    assert(ids(0) === ids(2))
    assert(ids(0) !== ids(1))
    assert(ids(0).matches("[0-9a-f]{32}"))
  }

  test("M9 nullOutWhen nulls duplicate home/away values") {
    val df = Seq(("A", "A"), ("A", "B"), ("A", null))
      .toDF("ev", "pt")
      .select(exprs.nullOutWhen(col("ev"),
        col("ev") === col("pt") || col("pt").isNull).as("c"))
    assert(df.collect().map(r => Option(r.get(0))) ===
      Seq(None, Some("A"), None))
  }

  test("M8 boolFlag") {
    val df = Seq(1, 10).toDF("x")
      .select(exprs.boolFlag(col("x") < 5).as("f"))
    assert(df.as[Int].collect().toSeq === Seq(1, 0))
  }

  test("soundexKey matches the canonical Soundex vectors") {
    // the standard published test vectors, incl. the h/w-transparent
    // (ashcraft) and first-letter-duplicate (pfister) rules
    val want = Map(
      "robert" -> "r163", "rupert" -> "r163", "ashcraft" -> "a261",
      "ashcroft" -> "a261", "tymczak" -> "t522", "pfister" -> "p236",
      "honeyman" -> "h555", "blue" -> "b400", "a" -> "a000",
      "wu" -> "w000")
    val got = want.keys.toSeq.toDF("w")
      .select(col("w"), exprs.soundexKey(col("w")).as("k"))
      .as[(String, String)].collect().toMap
    want.foreach { case (w, k) => assert(got(w) === k, s"soundex($w)") }
  }
}
