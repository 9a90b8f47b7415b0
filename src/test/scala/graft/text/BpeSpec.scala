package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain learns the hand-computed merge sequence") {
    // corpus: "aaab"×3, "ab"×2
    //   r1: (a,a)=6 vs (a,b)=5 → merge aa
    //   r2: (aa,a)=3 vs (a,b)=5 → merge ab
    //   r3: only (aa,ab)=3     → merge aaab
    val docs = Seq((1L, "aaab aaab aaab"), (2L, "ab ab"))
      .toDF("doc_id", "text")
    val got = Bpe.bpeTrain(docs, "doc_id", "text", rounds = 3)
      .select("round", "left", "right", "merged", "weight")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(got === Array(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val got = Bpe.bpeTrain(docs, "doc_id", "text", rounds = 10)
    // after merging (a,b) every word is a single symbol — 1 merge only
    assert(got.count() === 1L)
  }

  test("bpeSegmentWord applies merges greedily left-to-right") {
    val merges = Seq(("a", "a"), ("a", "b"))
    val segs = Seq("aaab", "ab", "aaaa", "x")
      .toDF("w")
      .select(Bpe.bpeSegmentWord(col("w"), merges).as("s"))
      .as[Seq[String]].collect()
    assert(segs(0) === Seq("aa", "ab"))
    assert(segs(1) === Seq("ab"))
    // "aaaa": greedy (a,a) pass → aa|aa; no (aa,aa) rule learned here
    assert(segs(2) === Seq("aa", "aa"))
    assert(segs(3) === Seq("x"))
  }
}
