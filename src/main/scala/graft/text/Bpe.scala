package graft.text

import graft.Staging._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge induction (Sennrich et al. '16) — tokenizer
  * training as a corpus operator. Learns the top-`rounds` merge rules by
  * the classic loop: count adjacent symbol pairs weighted by word
  * frequency, merge the most frequent pair everywhere, repeat.
  *
  * Shape at scale — the part that matters at 100 TB: the corpus is
  * touched EXACTLY ONCE, by the word-frequency groupBy (map-side
  * combined, one shuffle of distinct words). Every BPE round then runs
  * on the VOCABULARY table (|distinct words| rows, corpus-size-free) and
  * collects exactly one argmax row to the driver per round. This is the
  * standard trick real BPE trainers use (word-counts first), expressed
  * as Spark aggregations.
  *
  * Segmentations are stored as `(sym)(sym)...` wrapped strings: applying
  * a merge is then a literal `replace(seg, '(a)(b)', '(ab)')`, whose
  * non-overlapping left-to-right semantics IS the greedy left fold BPE
  * applies — and since every symbol is individually wrapped, adjacent
  * matches share no characters, so `"(a)(b)(a)(b)"` merges to
  * `"(ab)(ab)"` in one pass. Symbols are `[a-z0-9]` (the tokenizer
  * strips everything else), so the parens can never collide with
  * content.
  *
  * Returns the merge table (round, left, right, merged, weight) —
  * deterministic: ties on weight break lexicographically on the pair.
  */
object Bpe {

  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
               rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpeTrain needs rounds >= 1, got $rounds")
    val spark = docs.sparkSession
    // the ONLY corpus-volume pass: word → frequency
    var vocab = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("seg", regexp_replace(col("w"), "(.)", "($1)"))
      .stage()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // adjacent symbol pairs of each segmentation, weighted by word
      // count; overlapping occurrences all count (the classic heuristic)
      val syms = expr(
        "split(substring(seg, 2, length(seg) - 2), '\\\\)\\\\(')")
      val top = vocab
        .select(col("c"), explode(call_function("graft_shingle_spans",
          syms, lit(2))).as("p"))
        .groupBy("p").agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("p"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(l, rt) = top.head.getString(0).split(" ", 2)
        val n = top.head.getLong(1)
        merges += ((r, l, rt, l + rt, n))
        vocab = vocab.withColumn("seg",
          expr(s"replace(seg, '($l)($rt)', '($l$rt)')"))
          .stage()
        r += 1
      }
    }
    val schema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("weight", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(merges.result().map(m =>
        Row(m._1, m._2, m._3, m._4, m._5)): _*), schema)
  }

  /** Segment one WORD with a learned merge list — the apply half of
    * BPE (merges never cross word boundaries, per the algorithm; the
    * caller explodes tokens first). Scan-local: the merge table is a
    * driver-side Seq (bounded by the vocab a tokenizer ships with)
    * folded into a literal-replace chain — one string pass per rule,
    * no joins, no shuffle. Returns the word's symbol array. */
  def bpeSegmentWord(word: org.apache.spark.sql.Column,
                     merges: Seq[(String, String)])
  : org.apache.spark.sql.Column = {
    val wrapped = regexp_replace(word, "(.)", "($1)")
    val applied = merges.foldLeft(wrapped) { case (seg, (l, rt)) =>
      call_function("replace", seg, lit(s"($l)($rt)"), lit(s"($l$rt)"))
    }
    split(regexp_replace(applied, "^\\(|\\)$", ""), "\\)\\(")
  }
}
