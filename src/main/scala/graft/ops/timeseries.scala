package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
