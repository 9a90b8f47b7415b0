package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, attach the
  * payload of the latest right row with `rightTs <= leftTs` on the same
  * key — left-join semantics (no match → null payload).
  *
  * Spark has no native as-of operator, so this composes one from a union +
  * ordered window scan: tag both sides, union by name, sort each key
  * partition by (ts, side) with right rows first at equal ts (inclusive
  * match), and forward-fill the payload columns. One shuffle + one sort,
  * NO row explosion — unlike the naive `join + filter + argmax`, whose
  * intermediate is |left| × |right-per-key| and collapses at 100 TB.
  *
  * Requirement: the right side must be unique per (key, rightTs); dedupe
  * first (e.g. keep max surrogate key) or the fill picks an arbitrary row
  * among equal timestamps.
  */
object asof {

  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs).cast("timestamp"))
      .withColumn("__is_left", lit(1))
    // the payload travels as ONE struct, not per-column: a right row
    // whose payload FIELD is legitimately null must still win the fill
    // (attach the null, as a real as-of join would) — per-column
    // last(ignoreNulls) would skip it and resurrect a superseded older
    // value. The struct itself is non-null for every right row, so the
    // fill distinguishes "no match yet" (null struct) from "matched a
    // null value" (non-null struct, null field).
    val r = right
      .select(col(key), col(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__is_left"),
        struct(payload.map(col): _*).as("__pay"))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__pay.$p").as(p)): _*)
  }
}
