package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Staging.StageOps

/** Mergeable quantile sketch over positive integers with a GUARANTEED
  * relative-error bound — the HDR-histogram bucket layout (public design:
  * hdrhistogram.org; DDSketch's log-bucket cousin with integer-exact
  * math). A value keeps only its top `s`+1 significant bits:
  *
  *   shift  = max(floor(log2 v) − s, 0)
  *   bucket = (v >> shift) << shift          (the bucket's LOWER bound)
  *
  * so each bucket spans [bucket, bucket + 2^shift − 1] and the relative
  * width is ≤ 2^−s. Everything is integer bit arithmetic (`bin`/shifts —
  * no float log whose libm rounding could differ across engines), which
  * is what makes the estimates oracle-reproducible bit-for-bit.
  *
  * Scale shape: the sketch is a groupBy over ≤ 64·2^s buckets — VALUE-
  * SPACE bounded, independent of row count, so it is mergeable across
  * partitions/days/streams by simple count addition (map-side combine
  * does the heavy lifting; the final frame is ≤ a few thousand rows no
  * matter how many trillions of values went in).
  */
object qsketch {

  /** The bucket lower bound for value column `v` (positive longs):
    * v truncated to its top s+1 significant bits. Values below 2^(s+1)
    * are exact (shift 0). Pure codegen expressions. */
  def bucketLo(v: Column, s: Int): Column = {
    val sh = shiftOf(v, s)
    // functions.shiftleft/right only take Int shifts; the SQL forms
    // accept a column shift
    call_function("shiftleft", call_function("shiftright", v, sh), sh)
  }

  private def shiftOf(v: Column, s: Int): Column =
    greatest((length(bin(v)) - 1).cast("int") - s, lit(0))

  /** Build the sketch: (bkt_lo, bkt_hi, cnt), one row per occupied
    * bucket. Mergeable: union two sketches and re-aggregate
    * (sum(cnt) grouped by the bucket bounds). */
  def build(df: DataFrame, valueCol: String, s: Int): DataFrame = {
    require(s >= 1 && s <= 20, s"sub-bucket bits s must be in [1,20], got $s")
    val lo = bucketLo(col(valueCol), s)
    val hi = lo +
      call_function("shiftleft", lit(1L), shiftOf(col(valueCol), s)) - 1
    df.select(lo.as("bkt_lo"), hi.as("bkt_hi"))
      .groupBy("bkt_lo", "bkt_hi")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Integer target rank ceil(q/1000 · n) — `div`, never float `/`. */
  private val targetRank: Column =
    expr("CAST((q_permille * n + 999) DIV 1000 AS BIGINT)")

  /** Quantile bounds from a sketch: for each requested permille q, the
    * bucket holding the ceil(q/1000 · n)-th smallest value — the true
    * quantile is CERTAIN to lie in [est_lo, est_hi], and
    * (est_hi − est_lo)/est_lo ≤ 2^−s. The cumulative sum runs over the
    * bucket frame, which is value-space bounded (≤ 64·2^s rows) — a
    * report-sized window, not a data-sized one. */
  def quantiles(sketch: DataFrame, permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1,1000], got $permilles")
    val spark = sketch.sparkSession
    import spark.implicits._
    // window over ≤ 64·2^s bucket rows — bounded by the VALUE SPACE,
    // not the data (same justification as the skyline frontier)
    val cum = sketch.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(windows.boundedGlobal(col("bkt_lo"))).orderBy(col("bkt_lo"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .stage() // n and every permille probe read it
    val n = cum.agg(sum(col("cnt")).cast("long").as("n"))
    val probes = permilles.map(_.toLong).toDF("q_permille")
      .crossJoin(broadcast(n))
      .withColumn("target", targetRank)
    probes.join(cum, col("cum") >= col("target"))
      .groupBy("q_permille", "n", "target")
      .agg(min(col("bkt_lo")).as("est_lo"),
        min_by(col("bkt_hi"), col("bkt_lo")).as("est_hi"))
  }

  /** Per-GROUP quantile report — the grouped-percentile telemetry shape
    * (latency per endpoint, length per language): the same integer
    * bucket math as [[quantiles]], with every frame carrying the group
    * key. The per-group sketch is ≤ 64·2^s rows (value-space bounded),
    * the cumulative window partitions BY GROUP (each group's frame is
    * report-sized; groups spread across the cluster), and the probe
    * join fans out to ≤ |groups|·|permilles|·buckets rows — never
    * data-sized. Same guarantee per group: the true quantile lies in
    * [est_lo, est_hi], relative width ≤ 2^−s.
    * @return (groupCol, q_permille, n, est_lo, est_hi) */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       s: Int, permilles: Seq[Int]): DataFrame = {
    require(s >= 1 && s <= 20, s"sub-bucket bits s must be in [1,20], got $s")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1,1000], got $permilles")
    val spark = df.sparkSession
    import spark.implicits._
    val lo = bucketLo(col(valueCol), s)
    val hi = lo +
      call_function("shiftleft", lit(1L), shiftOf(col(valueCol), s)) - 1
    val sk = df.select(col(groupCol).as("__g"), lo.as("bkt_lo"),
        hi.as("bkt_hi"))
      .groupBy("__g", "bkt_lo", "bkt_hi")
      .agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("bkt_lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sk.withColumn("cum", sum(col("cnt")).over(wg))
      .stage() // per-group n and every probe read it
    val probes = cum.groupBy("__g")
      .agg(sum(col("cnt")).cast("long").as("n"))
      .crossJoin(broadcast(permilles.map(_.toLong).toDF("q_permille")))
      .withColumn("target", targetRank)
    probes.join(cum, Seq("__g"))
      .filter(col("cum") >= col("target"))
      .groupBy("__g", "q_permille", "n", "target")
      .agg(min(col("bkt_lo")).as("est_lo"),
        min_by(col("bkt_hi"), col("bkt_lo")).as("est_hi"))
      .drop("target")
      .withColumnRenamed("__g", groupCol)
  }

  /** Equi-depth binning (feature discretization) driven by the sketch:
    * bin boundaries are the `est_hi` bucket bounds at permilles
    * i·1000/nBins (i = 1..nBins−1), and a value's bin is the count of
    * boundaries strictly below it — so bin populations are equal up to
    * the sketch's ≤2^−s relative bucket width. The boundary frame is
    * ≤ nBins−1 rows collapsed into ONE array row and broadcast; the
    * assignment is a scan-local HOF (`filter` + `size`) — at 100 TB the
    * only non-scan work is the value-space-bounded sketch groupBy.
    * Output: (bin, cnt, min_v, max_v), one row per occupied bin. */
  def equiDepthBins(df: DataFrame, valueCol: String, s: Int,
                    nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins must be in [2,1000], got $nBins")
    val perms = (1 until nBins).map(i => (i * 1000) / nBins)
    // est_hi is non-decreasing in the permille (the cum threshold only
    // grows), so sorting by the bound itself reproduces permille order
    val bounds = quantiles(build(df, valueCol, s), perms)
      .agg(sort_array(collect_list(col("est_hi"))).as("__bs"))
    df.select(col(valueCol).as("v"))
      .crossJoin(broadcast(bounds))
      .select(col("v"),
        size(filter(col("__bs"), b => col("v") > b)).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }

  /** Winsorization (tail clipping) at sketch-estimated percentiles: the
    * lower bound is `est_lo` at `loPermille`, the upper `est_hi` at
    * `hiPermille` — each certain to bracket the true quantile, so the
    * clip is conservative on both tails. Pure integer math; the bound
    * frame is 2 values broadcast, the clip scan-local. Output is the
    * audit row a pipeline gate wants: (n, lo_bound, hi_bound,
    * n_clipped_lo, n_clipped_hi, sum_winsorized). */
  def winsorize(df: DataFrame, valueCol: String, s: Int,
                loPermille: Int, hiPermille: Int): DataFrame = {
    require(loPermille < hiPermille,
      s"lo must be < hi, got $loPermille >= $hiPermille")
    val q = quantiles(build(df, valueCol, s), Seq(loPermille, hiPermille))
    val bounds = q.agg(
      min(when(col("q_permille") === loPermille, col("est_lo")))
        .as("lo_bound"),
      min(when(col("q_permille") === hiPermille, col("est_hi")))
        .as("hi_bound"))
    // grouped on the (single) bound pair, not a global agg: an EMPTY
    // input then yields zero rows — matching the SQL twin's GROUP BY —
    // instead of one (n=0, null-bounds) row no oracle produces
    df.select(col(valueCol).as("v"))
      .crossJoin(broadcast(bounds))
      .groupBy("lo_bound", "hi_bound")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("lo_bound"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col("v") > col("hi_bound"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        sum(greatest(least(col("v"), col("hi_bound")), col("lo_bound")))
          .as("sum_winsorized"))
      .select(col("n"), col("lo_bound"), col("hi_bound"),
        col("n_clipped_lo"), col("n_clipped_hi"),
        col("sum_winsorized"))
  }

  /** End-to-end report with the bound VERIFIED against the exact
    * quantile (computed by a distributed per-value cumulative count —
    * no data-sized single-task window): per permille,
    * (q_permille, n, est_lo, est_hi, exact_v, within_bound). The
    * `within_bound` column is the sketch's correctness claim — true
    * by construction, so an oracle hash-compare proves the bucket
    * math end to end, not just the plumbing. */
  def quantileReport(df: DataFrame, valueCol: String, s: Int,
                     permilles: Seq[Int]): DataFrame = {
    val est = quantiles(build(df, valueCol, s), permilles)
    // exact: cumulative counts over DISTINCT values via the distributed
    // prefix sum (value-count frame, range-partitioned)
    val perValue = df.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = windows.distributedPrefixSum(perValue, Seq(col("v")),
      col("c"), cumName = "cum", rankName = "__rk").drop("__rk")
    est.join(cum, col("cum") >= col("target"))
      .groupBy("q_permille", "n", "est_lo", "est_hi")
      .agg(min(col("v")).as("exact_v"))
      .select(col("q_permille"), col("n"), col("est_lo"), col("est_hi"),
        col("exact_v"),
        (col("exact_v") >= col("est_lo") &&
          col("exact_v") <= col("est_hi")).as("within_bound"))
  }
}
