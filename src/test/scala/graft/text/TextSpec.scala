package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens normalizes case and punctuation") {
    val got = Seq("The QUICK, brown-fox!").toDF("text")
      .select(Text.tokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(got === Seq("the", "quick", "brown", "fox"))
  }

  test("shingles produces k-grams; short docs yield empty") {
    val got = Seq("a b c d").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].head()
    assert(got === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("langId picks the language with most stopword hits") {
    val got = Seq(
      "the cat sat of the mat and that is that",
      "el gato que y en un es la casa").toDF("text")
      .select(Text.langId(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(got === Seq("en", "es"))
  }

  test("tokenCount and quality metrics") {
    val q = Seq("hello world!!").toDF("text")
      .select(Text.tokenCount(col("text")).as("n"),
        Text.qualityScore(col("text")).as("q"))
    val row = q.select(col("n"), col("q.punct_ratio")).as[(Int, Double)]
      .head()
    assert(row._1 === 2)
    assert(row._2 > 0.0 && row._2 < 0.5)
  }

  test("exactFingerprint is stable under case/punct noise") {
    val fps = Seq("Hello World", "hello, world!").toDF("text")
      .select(Text.exactFingerprint(col("text")).as("f"))
      .as[String].collect()
    assert(fps(0) === fps(1))
  }
}
