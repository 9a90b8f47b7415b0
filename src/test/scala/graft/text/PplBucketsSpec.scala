package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the CCNet-style tercile bucketing over the bigram LM score. */
class PplBucketsSpec extends SparkSpec {
  import spark.implicits._

  // 7 docs with ≥2 tokens (ranked) and one single-token doc (dropped);
  // "aa bb" repeated makes those docs the most probable (lowest nll)
  private def docs = Seq(
    (0L, "aa bb aa bb aa bb"),
    (1L, "aa bb aa bb"),
    (2L, "aa bb cc dd"),
    (3L, "cc dd ee ff"),
    (4L, "ee ff gg hh"),
    (5L, "gg hh ii jj"),
    (6L, "ii jj kk ll"),
    (7L, "solo")
  ).toDF("doc_id", "text")

  test("buckets cut the nll ranking into ceil-thirds, 1-based") {
    val got = Text.perplexityBuckets(docs, "doc_id", "text")
      .select("doc_id", "nll", "rank", "ppl_bucket")
      .as[(Long, Double, Long, String)].collect().sortBy(_._3)
    assert(got.length === 7)              // the 1-token doc dropped
    assert(!got.map(_._1).contains(7L))
    // ranks are 1..7 and nll is non-decreasing along them
    assert(got.map(_._3).toSeq === (1L to 7L))
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    // ceil(7/3)=3 head, ceil(14/3)=5 → ranks 4-5 middle, 6-7 tail
    assert(got.map(_._4).toSeq ===
      Seq("head", "head", "head", "middle", "middle", "tail", "tail"))
    // the all-repeat docs are the most predictable → head
    assert(got.take(2).map(_._1).toSet === Set(0L, 1L))
  }

  test("bucketing is deterministic across runs") {
    val a = Text.perplexityBuckets(docs, "doc_id", "text")
      .select("doc_id", "rank", "ppl_bucket")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val b = Text.perplexityBuckets(docs, "doc_id", "text")
      .select("doc_id", "rank", "ppl_bucket")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
