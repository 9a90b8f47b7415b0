package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: match point rows to interval rows
  * (`start <= point < end`) as an EQUI join instead of the
  * BroadcastNestedLoopJoin Spark plans for a raw inequality condition.
  *
  * Technique (standard in interval-join engines): pick a bin width ≥ the
  * maximum interval length, explode each interval onto the bins it
  * overlaps (≤ 2 bins when width ≥ max length), map each point to its
  * bin, hash-join on the bin id, then apply the exact containment filter.
  * The O(|points|·|intervals|) nested loop becomes a shuffle join whose
  * fan-out is bounded by bins-per-interval — this is what survives a
  * 100 TB fact table where a BNLJ would not.
  *
  * Both sides' timestamps are binned via epoch-second division (NTZ
  * inputs go through a timestamp cast first — the session is pinned UTC),
  * so the rewrite is exact: no boundary drift.
  */
object rangejoin {

  /** @param points     rows with a timestamp column `pointTs`
    * @param intervals  rows with `startTs` (inclusive) and `endTs`
    *                   (exclusive) columns
    * @param binSeconds bin width in seconds. Intervals longer than the
    *                   width still match correctly — they explode onto
    *                   every covered bin — the width only tunes the
    *                   fan-out / bucket-size trade-off.
    */
  def binnedRangeJoin(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startTs: String, endTs: String,
                      binSeconds: Long,
                      extraKeys: Seq[String] = Nil): DataFrame = {
    val p = points.withColumn("__bin",
      (col(pointTs).cast("timestamp").cast("long") / binSeconds).cast("long"))
    val i = intervals
      // empty/inverted intervals (end <= start) can match nothing, but
      // an UNGUARDED sequence(sbin, ebin) with ebin < sbin silently
      // generates a DESCENDING step — one corrupt zero-default end
      // would explode onto every bin between the epochs (tens of
      // millions of rows) before the containment filter discards them
      .filter(col(endTs) > col(startTs))
      .withColumn("__sbin", (col(startTs).cast("timestamp").cast("long") / binSeconds)
        .cast("long"))
      .withColumn("__ebin",
        ((col(endTs).cast("timestamp").cast("long") - 1) / binSeconds).cast("long"))
      .withColumn("__bin",
        explode(sequence(col("__sbin"), col("__ebin"))))
      .drop("__sbin", "__ebin")
    p.join(i, "__bin" +: extraKeys)
      .filter(col(startTs) <= col(pointTs) && col(pointTs) < col(endTs))
      .drop("__bin")
  }
}
