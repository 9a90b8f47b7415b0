package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: Seq[String]): Map[Int, Double] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select(col("id"),
        (call_function("graft_deflate_len", col("text")).cast("double") /
          octet_length(col("text"))).as("r"))
      .as[(Int, Double)].collect().toMap

  test("compression ratio separates repetitive, prose, and noise") {
    // deterministic pseudo-noise: md5 hex chunks (no java Random)
    val noise = (0 until 200).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"chunk$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    val prose = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump").mkString(" ") * 40
    val repetitive = "spam ham " * 800
    val r = ratios(Seq(repetitive, prose, noise))
    assert(r(0) < 0.05, s"repetitive should collapse: ${r(0)}")
    assert(r(1) > r(0) && r(1) < 0.5, s"prose mid-range: ${r(1)}")
    assert(r(2) > r(1), s"noise must compress worst: ${r(2)}")
    assert(r(2) > 0.4, s"hex noise barely compresses: ${r(2)}")
  }

  test("deflate length is deterministic and codegen matches eval") {
    val df = Seq((1, "alpha beta gamma " * 100)).toDF("id", "text")
    val a = df.select(call_function("graft_deflate_len", col("text")))
      .as[Int].head()
    val b = df.select(call_function("graft_deflate_len", col("text")))
      .as[Int].head()
    assert(a === b && a > 0)
    // interpreted path (no codegen) must agree with the compiled one
    val c = DeflateLen.deflatedLen(
      org.apache.spark.unsafe.types.UTF8String
        .fromString("alpha beta gamma " * 100))
    assert(c === a)
  }

  test("empty and null inputs") {
    val df = Seq((1, Some("")), (2, Option.empty[String]))
      .toDF("id", "text")
    val got = df.select(col("id"),
      call_function("graft_deflate_len", col("text")).as("l"))
      .as[(Int, Option[Int])].collect().toMap
    assert(got(1).exists(l => l > 0 && l <= 16)) // zlib empty frame
    assert(got(2).isEmpty) // null in, null out
  }
}
