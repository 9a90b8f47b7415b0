package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles as a sort-based, spillable plan.
  *
  * Spark's built-in exact `percentile` is a TypedImperativeAggregate that
  * buffers every value of a group in executor memory — fine while groups
  * are bounded, an OOM risk when a 100 TB table concentrates into few
  * groups. This formulation has no unbounded buffer anywhere: one shuffle
  * by group + per-partition sort (both spillable), a rank/count window
  * pass over the sorted run, then a map-side-combined aggregation that
  * keeps only the two boundary rows per requested percentile.
  *
  * Interpolation matches `percentile()` bit-for-bit — Spark's Percentile
  * evaluates t = p·(n−1); result = (⌈t⌉−t)·v[⌊t⌋] + (t−⌊t⌋)·v[⌈t⌉]
  * (the two-sided weighted form, NOT lo + frac·(hi−lo), which differs in
  * the last ulp), with the ⌈t⌉=⌊t⌋ case short-circuited to v[⌊t⌋].
  */
object quantiles {

  /** @param ps (output column name, percentile in [0,1]) pairs */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[(String, Double)]): DataFrame = {
    val wSorted = Window.partitionBy(groupCol).orderBy(col("__v"))
    val wAll = Window.partitionBy(groupCol)
    // nulls are skipped, matching the built-in Percentile (which ignores
    // null inputs); the one divergence is an all-null group, which drops
    // out entirely here where the built-in would emit (group, null)
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(wSorted).cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(wAll))

    def target(p: Double) = lit(p) * (col("__n") - 1).cast("double")

    val boundaryAggs = ps.flatMap { case (name, p) =>
      val isLo = col("__rn") === floor(target(p)).cast("long")
      val isHi = col("__rn") === ceil(target(p)).cast("long")
      Seq(max(when(isLo, col("__v"))).as(s"__lo_$name"),
        max(when(isHi, col("__v"))).as(s"__hi_$name"))
    }
    val agged = ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("__cnt"), boundaryAggs: _*)

    val outCols = col(groupCol) +: ps.map { case (name, p) =>
      val t = lit(p) * (col("__cnt") - 1).cast("double")
      when(ceil(t) === floor(t), col(s"__lo_$name"))
        .otherwise((ceil(t) - t) * col(s"__lo_$name") +
          (t - floor(t)) * col(s"__hi_$name"))
        .as(name)
    }
    agged.select(outCols: _*)
  }
}
