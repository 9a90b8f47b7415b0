package graft.ops

import org.apache.spark.sql.Column
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
}
