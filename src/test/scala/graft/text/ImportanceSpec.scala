package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // target docs talk about "wiki facts"; raw pool is "spam offer" noise;
  // two probe docs (raw) lean one way each
  private val docs = Seq(
    (0L, "en", "wiki facts wiki facts wiki facts"),
    (1L, "en", "wiki facts figures wiki"),
    (2L, "de", "spam offer spam offer spam offer"),
    (3L, "de", "spam offer click spam"),
    (10L, "de", "wiki facts and more wiki facts"), // target-like probe
    (11L, "de", "spam offer and more spam offer")  // raw-like probe
  ).toDF("doc_id", "lang", "text")

  test("target-like docs outscore raw-like docs") {
    val scores = Importance
      .dsirScoreMicro(docs, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 64)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(scores(10L) > scores(11L),
      s"wiki-ish probe must outscore spam-ish probe: $scores")
    assert(scores(0L) > 0L && scores(2L) < 0L,
      s"exemplars must score with their own side: $scores")
  }

  test("scores are partitioning-independent and count tokens exactly") {
    def get(df: org.apache.spark.sql.DataFrame) = Importance
      .dsirScoreMicro(df, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 64)
      .as[(Long, Long, Long)].collect().toSet
    val a = get(docs)
    assert(a === get(docs.repartition(5)))
    val nTokens = a.map(r => r._1 -> r._2).toMap
    assert(nTokens(0L) === 6L && nTokens(10L) === 6L)
  }
}
