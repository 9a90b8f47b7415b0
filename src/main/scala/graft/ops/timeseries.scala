package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling: densify a per-key daily series so downstream
  * window math (moving averages, forward fills) sees every day.
  *
  * Fully distributed: each key's calendar is generated FROM ITS OWN
  * span with `sequence()` + `explode` — no driver-side date collection,
  * no global calendar cross join. Fan-out per key is bounded by its
  * active span in days, and the fill join is a left join on
  * (key, day), the same shuffle key the aggregate already produced.
  */
object timeseries {

  /** Densify `daily` (one row per (key, day) with observed values) to
    * one row per (key, every day in the key's [min, max] span), filling
    * absent days with each column's default.
    *
    * @param fills (column, default) — output columns beyond key/day
    */
  def fillDailyGaps(daily: DataFrame, keyCol: String, dayCol: String,
                    fills: Seq[(String, Column)]): DataFrame = {
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val cal = spans.select(col(keyCol),
      explode(expr("sequence(__lo, __hi)")).as(dayCol))
    val out = col(keyCol) +: col(dayCol) +: fills.map {
      case (name, default) => coalesce(col(name), default).as(name)
    }
    cal.join(daily, Seq(keyCol, dayCol), "left").select(out: _*)
  }

  /** Linear interpolation of nulls in a (key, day, value) series: each
    * null day gets the straight line between its nearest observed
    * neighbors; leading/trailing nulls back-/forward-fill the nearest
    * single neighbor.
    *
    * Two running-frame window passes (backward and forward) over ONE
    * (key, day) sort — the forward pass reuses the backward pass's
    * shuffle partitioning, so the whole op is one exchange per key
    * regardless of gap length. No per-gap joins, no driver state.
    */
  def interpolateLinear(series: DataFrame, keyCol: String, dayCol: String,
                        valueCol: String): DataFrame = {
    val v = col(valueCol)
    val base = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(v.isNotNull, col(dayCol))
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevD = last(obsDay, ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextD = first(obsDay, ignoreNulls = true).over(fwd)
    val interp = prevV + (nextV - prevV) *
      datediff(col(dayCol), prevD) / datediff(nextD, prevD)
    series.withColumn(valueCol,
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV)
        .when(nextV.isNull, prevV)
        .otherwise(interp))
  }
}
