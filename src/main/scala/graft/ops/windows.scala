package graft.ops

import graft.Staging._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Stateful sequential ops — SURVEY.md §2.8 (W1-W3).
  *
  * The reference implements these as single-threaded pandas `iterrows` state
  * machines relying on implicit file order. Here they are window expressions
  * over an explicit `(partition, seq)` order: one shuffle by partition key,
  * then a per-partition sort — fully distributed, no driver state. At 100 TB
  * the partition key (game_id analog) has high cardinality, so the shuffle
  * spreads evenly; a running frame (`rowsBetween(unboundedPreceding,
  * currentRow)`) is evaluated in one pass per partition.
  */
object windows {

  /** Metadata key marking a column as a genuine `spark_partition_id()`
    * product — written where [[groupedPrefixSum]] defines `__pid`, read
    * by the test-side straggler plan guard to exempt the offset-lift's
    * bounded offsets window. Attribute metadata survives checkpoints
    * and self-join attribute re-instancing (both re-mint exprIds), so
    * the guard can key on the DEFINITION rather than the attribute
    * name a corpus column could coincidentally share. */
  val PartitionIdMetaKey = "graft.spark_partition_id"
  private[graft] val partitionIdMeta =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean(PartitionIdMetaKey, true).build()

  /** Type-independent constant partition key for a window whose frame is
    * KNOWN to be bounded (≤ partition count / value space) — `pmod(x, 1)`
    * keeps Catalyst from folding the key away (which re-raises the
    * `No Partition Defined` warning), and the explicit bigint cast makes
    * the constant 0 for ANY input type: a raw `pmod(x, 1)` on a double or
    * decimal column is the FRACTIONAL PART, silently splitting the
    * "global" window into many partitions and restarting every running
    * aggregate. Every bounded-frame window in the engine routes through
    * here so the idiom cannot be mis-instantiated again. */
  def boundedGlobal(c: Column): Column = pmod(c.cast("bigint"), lit(1))

  /** Running frame over (part, order) — the common spec for W1-W3. */
  def running(part: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(part: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** W1 — running counter that bumps on `bumpCond` (reference
    * `create_period`, `playByplay.py:19-41`: +1 whenever periodTime==720,
    * reset at game boundary). The reset is the partition boundary; the first
    * row of each game satisfies the bump condition, so the cumulative sum
    * reproduces the seeded counter exactly.
    */
  def runningCounter(bumpCond: Column, w: WindowSpec): Column =
    sum(when(bumpCond, 1).otherwise(0)).over(w)

  /** W2 — forward-fill with seed (reference `createHomeAwayPoints`,
    * `playByplay.py:49-65`: carry last parsed value, seed `default` at
    * partition start). */
  def forwardFill(c: Column, w: WindowSpec, default: Column): Column =
    coalesce(last(c, ignoreNulls = true).over(w), default)

  /** W3 — marker forward-fill (reference isStarter, `boxScores.py:64-76`):
    * `markerValue` is non-null only on marker rows; rows carry the last
    * marker value seen, seeded with `default` before the first marker. */
  def markerFill(markerValue: Column, w: WindowSpec,
                 default: Column): Column =
    coalesce(last(markerValue, ignoreNulls = true).over(w), default)

  /** Distributed global running sum + rank: the two-level rewrite of
    * `Window.orderBy(order…)` with NO partition key — which Spark
    * executes by funnelling the ENTIRE frame through one task (the
    * `WindowExec: No Partition Defined` warning). Here:
    *
    *  1. range-partition by the full `order` key — a real exchange that
    *     load-balances even when the frame is the whole corpus;
    *  2. a window PARTITIONED by `spark_partition_id()` computes the
    *     in-partition inclusive running sum and row number (each task
    *     sorts only its own range);
    *  3. per-partition totals (one row per partition) get a running
    *     offset on a frame bounded by the PARTITION COUNT, then
    *     broadcast back.
    *
    * The result is exactly `sum(value) over (order by order…)` and
    * `row_number() over (order by order…)` for any data size — the
    * single-task frame left anywhere is ≤ `spark.sql.shuffle.partitions`
    * rows. `order` must be a total order (unique key) for `rankName`
    * to be deterministic; descending columns (`col.desc`) are fine.
    *
    * The range-partitioned frame is staged once because two consumers
    * (the in-partition window and the offsets aggregate) must see the
    * SAME physical partitioning — the [[graft.text.Packing]] /
    * `Text.rankNormalize` exchange-reuse hazard.
    *
    * @param value summed column (long); rank is independent of it
    * @return df + `cumName` (inclusive running sum) + `rankName`
    *         (1-based global rank)
    */
  def distributedPrefixSum(df: DataFrame, order: Seq[Column],
                           value: Column, cumName: String = "cum",
                           rankName: String = "rk",
                           numPartitions: Int = 0): DataFrame =
    distributedPrefixSums(df, order, Seq(value), Seq(cumName), rankName,
      numPartitions)

  /** [[distributedPrefixSum]] for SEVERAL value columns at once: all
    * running sums share the single range exchange and the single
    * in-partition sort instead of paying one exchange each (a second
    * sequential pass would also re-walk the first pass's window output
    * in its sampling job). Sum types follow Spark's `sum` (longs stay
    * long, decimals stay decimal). */
  def distributedPrefixSums(df: DataFrame, order: Seq[Column],
                            values: Seq[Column], cumNames: Seq[String],
                            rankName: String = "rk",
                            numPartitions: Int = 0): DataFrame = {
    require(values.nonEmpty && values.length == cumNames.length,
      s"need one cum name per value, got ${values.length} values / " +
        s"${cumNames.length} names")
    val vCols = values.indices.map(i => s"__psv$i")
    val withV = values.zip(vCols).foldLeft(df) {
      case (d, (v, n)) => d.withColumn(n, v) }
    val parted = (if (numPartitions > 0)
        withV.repartitionByRange(numPartitions, order: _*)
      else withV.repartitionByRange(order: _*))
      .withColumn("__pid", spark_partition_id())
      .stage()
    val wIn = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val wRun = wIn.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val inPart = vCols.zipWithIndex.foldLeft(
        parted.withColumn("__rk_in", row_number().over(wIn))) {
      case (d, (n, i)) =>
        d.withColumn(s"__cum_in$i", sum(col(n)).over(wRun)) }
    val wOff = Window.partitionBy(boundedGlobal(col("__pid")))
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pc"),
        vCols.zipWithIndex.map { case (n, i) =>
          sum(col(n)).as(s"__pt$i") }: _*)
      .withColumn("__coff",
        coalesce(sum(col("__pc")).over(wOff), lit(0L)))
    val offsets2 = vCols.indices.foldLeft(offsets) { case (d, i) =>
        d.withColumn(s"__voff$i",
          sum(col(s"__pt$i")).over(wOff)) }
      .select(col("__pid") +: col("__coff") +:
        vCols.indices.map(i => col(s"__voff$i")): _*)
    val joined = inPart.join(broadcast(offsets2), Seq("__pid"))
      .withColumn(rankName, col("__rk_in") + col("__coff"))
    cumNames.zipWithIndex.foldLeft(joined) { case (d, (cn, i)) =>
        d.withColumn(cn, col(s"__cum_in$i") +
          coalesce(col(s"__voff$i"), lit(0))) }
      .drop("__pid" +: "__rk_in" +: "__coff" +:
        vCols.indices.flatMap(i =>
          Seq(s"__psv$i", s"__cum_in$i", s"__voff$i")): _*)
  }

  /** Distributed PER-GROUP running sum + rank — the grouped analog of
    * [[distributedPrefixSum]], and the offset-lift rewrite of
    * `Window.partitionBy(group).orderBy(order…)` for when one group can
    * be a dominant share of the corpus (a pretraining source, a crawl
    * domain): the naive window buffers each group in ONE task, so the
    * big group becomes a straggler no AQE rule can split. Here:
    *
    *  1. range-partition by the FULL (group, order…) key — load-
    *     balanced even when one group is half the data;
    *  2. a window partitioned by `(spark_partition_id(), group)`
    *     computes the in-partition per-group rank and running sum
    *     (each task sorts only its own range);
    *  3. per-(partition, group) counts/sums — a frame bounded by
    *     #partitions·#groups rows, NOT by data volume — get running
    *     offsets on a per-group frame of ≤ #partitions rows, then
    *     join back NULL-SAFELY (`<=>`: a NULL group key is a regular
    *     group to Window.partitionBy and groupBy, so the join-back
    *     must not drop it — an equi-join would).
    *
    * CONTRACT: the offsets frame (#partitions·#groups rows) is
    * broadcast — this helper is for the FEW-HUGE-GROUPS regime, where
    * that product is small. With millions of tiny groups the plain
    * per-group window is the right operator (no group dominates, so
    * there is no straggler to lift away), and the broadcast here
    * would hit Spark's hard broadcast limits; callers that auto-route
    * (domainCap, tokenBudgetMix) document the same boundary.
    *
    * The range-partitioned frame is staged once because two consumers
    * (the in-partition window and the offsets aggregate) must see the
    * SAME physical partitioning — the `Text.rankNormalize`
    * exchange-reuse hazard.
    *
    * `order` must be a total order WITHIN each group (include a unique
    * tiebreak) for `rankName` to be deterministic.
    *
    * @param groupCols  group key column NAMES (join-back key)
    * @param value      summed column (long); pass `lit(0L)` for
    *                   rank-only use
    * @param cumName    inclusive per-group running sum of `value`;
    *                   null to omit
    * @param totalName  per-group row count; null to omit
    * @return df + rankName (1-based rank within group) [+ cumName]
    *         [+ totalName] */
  def groupedPrefixSum(df: DataFrame, groupCols: Seq[String],
                       order: Seq[Column], value: Column,
                       cumName: String = null,
                       rankName: String = "rk",
                       totalName: String = null): DataFrame = {
    require(groupCols.nonEmpty, "groupedPrefixSum needs a group key")
    val gCols = groupCols.map(col)
    val parted = df.withColumn("__gpv", value)
      .repartitionByRange(gCols ++ order: _*)
      // the metadata marker is what the straggler plan guard keys its
      // offsets-window exemption on: it identifies THIS column as a
      // genuine spark_partition_id() product across checkpoints and
      // self-join re-instancing (both of which re-mint exprIds), where
      // a name match would also wave through any corpus column merely
      // named __pid
      .select(col("*"),
        spark_partition_id().as("__pid", partitionIdMeta))
      .stage()
    val wIn = Window.partitionBy(col("__pid") +: gCols: _*)
      .orderBy(order: _*)
    val inPart = parted
      .withColumn("__rk_in", row_number().over(wIn))
      .withColumn("__cum_in", sum(col("__gpv")).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // one row per (partition, group): every window below is bounded by
    // that cardinality (≤ #partitions rows per group), never by volume
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid") +: gCols: _*)
      .agg(count(lit(1)).as("__pn"), sum(col("__gpv")).as("__pv"))
      .withColumn("__coff", coalesce(sum(col("__pn")).over(wOff), lit(0L)))
      .withColumn("__voff", sum(col("__pv")).over(wOff))
      .withColumn("__ng", sum(col("__pn")).over(
        Window.partitionBy(gCols: _*)))
      .select(col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+ col("__coff") :+
        col("__voff") :+ col("__ng"): _*)
    // null-safe join-back: <=> on every group column, so NULL groups
    // rank exactly as the window form ranks them
    val cond = groupCols.foldLeft(
      inPart("__pid") === offsets("__opid")) { (c, g) =>
      c && (inPart(g) <=> offsets(s"__og_$g")) }
    val joined = inPart.join(broadcast(offsets), cond)
      .withColumn(rankName, col("__rk_in") + col("__coff"))
    val withCum =
      if (cumName == null) joined
      else joined.withColumn(cumName,
        col("__cum_in") + coalesce(col("__voff"), lit(0)))
    val withTot =
      if (totalName == null) withCum
      else withCum.withColumn(totalName, col("__ng"))
    withTot.drop(Seq("__gpv", "__pid", "__opid", "__rk_in", "__cum_in",
      "__coff", "__voff", "__ng") ++
      groupCols.map(c => s"__og_$c"): _*)
  }

  /** Distributed global DENSE rank over `keys` — equal key tuples get
    * equal rank, ranks are 1..#distinct with no gaps — WITHOUT the
    * distinct → rank → join-back detour (three data-sized shuffles).
    * One range exchange does it:
    *
    *  1. range-partition by `keys` — Spark's RangePartitioner sends
    *     EQUAL keys to the same partition (boundaries come from a
    *     sample, assignment is a binary search over them), so no key
    *     group straddles a partition;
    *  2. in-partition dense rank = running sum of the new-group
    *     indicator (lag ≠ current);
    *  3. per-partition distinct counts (a max over the computed
    *     in-partition rank — rides the same staged frame, no extra
    *     data shuffle) prefix-sum into offsets on a ≤#partitions frame,
    *     broadcast back.
    *
    * The staged frame is the one materialization both consumers (the
    * final projection and the offsets aggregate) read — same
    * exchange-reuse rationale as [[distributedPrefixSum]].
    */
  def distributedDenseRank(df: DataFrame, keys: Seq[Column],
                           rankName: String): DataFrame = {
    val parted = df.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    val ks = struct(keys: _*)
    val inPart = parted
      .withColumn("__new",
        when(lag(ks, 1).over(wIn).isNull ||
          lag(ks, 1).over(wIn) =!= ks, 1L).otherwise(0L))
      .withColumn("__dr_in", sum(col("__new")).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .stage()
    val wOff = Window.partitionBy(boundedGlobal(col("__pid"))).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = inPart.groupBy(col("__pid"))
      .agg(max(col("__dr_in")).as("__pk"))
      .withColumn("__doff",
        coalesce(sum(col("__pk")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__doff"))
    inPart.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankName, col("__dr_in") + col("__doff"))
      .drop("__pid", "__new", "__dr_in", "__doff")
  }
}
