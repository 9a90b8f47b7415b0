package graft.text

import graft.ops.windows
import graft.Staging._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents in a
  * deterministic order and cut the token stream into fixed-size context
  * windows ("concat-then-chunk" packing, the standard pretraining data
  * layout). A document is assigned to chunk `floor(tokens_before / maxLen)`
  * — the chunk its first token lands in.
  *
  * The core is a GLOBAL running token count, which naively is a
  * single-partition window — a one-task bottleneck at corpus scale. This
  * implementation is the classic two-pass distributed prefix sum instead:
  *
  *  1. `repartitionByRange(idCol)` makes partition boundaries follow the
  *     document order, so "all docs before mine" = "earlier docs in my
  *     partition" + "all docs in earlier partitions";
  *  2. a window PARTITIONED by `spark_partition_id()` computes the
  *     within-partition running sum (parallel across partitions);
  *  3. per-partition totals (one row per partition — a few thousand rows
  *     on any cluster) are prefix-summed on a single tiny partition and
  *     broadcast back.
  *
  * Every stage is bounded: no single task ever sees more than one range
  * partition of documents.
  */
object Packing {

  /** Per-document packing assignment: adds `cum_before` (tokens of all
    * earlier docs) and `seq_id` (context-window index) to `docs`.
    *
    * @param docs    input frame
    * @param idCol   unique orderable id defining the concatenation order
    * @param tokCol  per-document token count (long)
    * @param maxLen  context window length in tokens
    */
  def packAssignments(docs: DataFrame, idCol: String, tokCol: String,
                      maxLen: Int, numPartitions: Int = 0): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    // numPartitions > 0 pins the range-partition count (specs use it to
    // force a genuinely multi-partition run that AQE would coalesce at
    // test scale); 0 defers to spark.sql.shuffle.partitions
    // pinned ONCE: __pid is read by two independent consumers (the
    // in-partition running sum and the per-partition offsets) — the
    // same hazard Text.rankNormalize documents; without the
    // materialization their agreement hinges on exchange reuse, which
    // AQE or reuseExchange=false can silently break
    val parted = (if (numPartitions > 0)
        docs.repartitionByRange(numPartitions, col(idCol))
      else docs.repartitionByRange(col(idCol)))
      .withColumn("__pid", spark_partition_id())
      .stage()
    val wIn = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inPart = parted.withColumn("__cum_in",
      coalesce(sum(col(tokCol)).over(wIn), lit(0L)))

    // one row per partition; the running sum over partition ids runs on
    // a single task by construction, which is fine at that cardinality
    val wOff = Window.partitionBy(windows.boundedGlobal(col("__pid"))).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col(tokCol)).as("__ptot"))
      .withColumn("__offset",
        coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__offset"))

    inPart.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum_before", col("__cum_in") + col("__offset"))
      // integer division: exact on longs (a double floor() would wobble
      // past 2^53 tokens — a real corpus size)
      .withColumn("seq_id", expr(s"cum_before div $maxLen"))
      .drop("__pid", "__cum_in", "__offset")
  }

  /** Packed-sequence manifest: one row per context window with its doc
    * span and fill statistics. `fill_tokens` can exceed `maxLen` for the
    * window holding a document that straddles a boundary — documents are
    * assigned whole (where their first token lands), matching packers
    * that let the tokenizer split at materialization time. */
  def packManifest(docs: DataFrame, idCol: String, tokCol: String,
                   maxLen: Int): DataFrame =
    packAssignments(docs, idCol, tokCol, maxLen)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol)).as("fill_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Sliding context-window chunking with overlap — the per-document
    * twin of packAssignments (chunk WITHIN each doc instead of packing
    * across docs): the token stream is cut into windows of `width`
    * tokens every `stride` tokens. A tail window survives only if it
    * contributes tokens no earlier window covers (`len > width -
    * stride`), so coverage is complete and no window is a subset of its
    * predecessor. Scan-local — a per-row sequence explode, no shuffle;
    * fan-out per doc is `ceil(n/stride)`, bounded by doc length.
    */
  def chunkWindows(docs: DataFrame, idCol: String, toksCol: String,
                   width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width, got width=$width stride=$stride")
    docs.select(col(idCol), col(toksCol).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") >= 1)
      .select(col(idCol), col("__n"), col("__t"),
        explode(expr(s"sequence(1, __n, $stride)")).as("start"))
      .withColumn("chunk", expr(s"slice(__t, start, $width)"))
      .withColumn("chunk_len", size(col("chunk")))
      .filter(col("start") === 1 ||
        col("chunk_len") > width - stride)
      .select(col(idCol),
        ((col("start") - 1) / stride).cast("int").as("chunk_idx"),
        col("start"), col("chunk_len"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
