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

  /** Interval × interval overlap join (`aStart < bEnd && bStart < aEnd`,
    * half-open intervals) as an EQUI join on time bins — the two-sided
    * generalization of [[binnedRangeJoin]].
    *
    * Both sides explode onto every bin they cover and hash-join on the
    * bin id. A pair overlapping k shared bins would surface k times, so
    * instead of a distinct (a second shuffle over the full candidate
    * set) each pair is kept only in the bin that OWNS it: the bin
    * containing the overlap's start, `floor(max(aStart, bStart) / w)`.
    * That bin is covered by both intervals whenever they truly overlap,
    * so exactly one joined row survives per matching pair — dedup costs
    * one scan-local predicate, not an exchange.
    *
    * Column names must be disjoint across the two inputs (same contract
    * as a plain join).
    */
  def intervalOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                          b: DataFrame, bStart: String, bEnd: String,
                          binSeconds: Long,
                          extraKeys: Seq[String] = Nil): DataFrame = {
    def binned(df: DataFrame, s: String, e: String, tag: String): DataFrame =
      df.filter(col(e) > col(s)) // see the inverted-interval guard above
        .withColumn(s"__${tag}s",
          (col(s).cast("timestamp").cast("long") / binSeconds).cast("long"))
        .withColumn(s"__${tag}e",
          ((col(e).cast("timestamp").cast("long") - 1) / binSeconds)
            .cast("long"))
        .withColumn("__bin",
          explode(sequence(col(s"__${tag}s"), col(s"__${tag}e"))))
        .drop(s"__${tag}e")
    val ab = binned(a, aStart, aEnd, "a")
    val bb = binned(b, bStart, bEnd, "b")
    ab.join(bb, "__bin" +: extraKeys)
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bin") === greatest(col("__as"), col("__bs")))
      .drop("__bin", "__as", "__bs")
  }

  /** Allen's interval algebra (Allen '83): join every pair of intervals
    * in CONTACT (sharing at least a boundary instant — everything except
    * `before`/`after`, which are unbounded and excluded by design) and
    * classify the pair into one of the 11 contact relations:
    * equals, meets, met_by, starts, started_by, finishes, finished_by,
    * during, contains, overlaps, overlapped_by.
    *
    * Same binned equi-join machinery as [[intervalOverlapJoin]] with two
    * deltas: the end-bin is INCLUSIVE (`floor(end / w)`, not `end − 1`)
    * so a `meets` pair whose only shared instant is the boundary still
    * lands on a common bin, and the pairing predicate is the closed
    * contact test `aStart <= bEnd && bStart <= aEnd`. The ownership bin
    * is the one holding the contact start `max(aStart, bStart)` — both
    * sides cover it whenever the pair is in contact, so each pair
    * survives exactly once without a distinct pass. The relation itself
    * is one scan-local CASE over the four boundary comparisons.
    *
    * The WHEN chain tests relations in a fixed order (equality shapes
    * first, then containment, then plain overlap) — each arm's guard is
    * mutually exclusive with every earlier arm, and the DuckDB twin
    * mirrors the identical chain.
    */
  def allenRelations(a: DataFrame, aStart: String, aEnd: String,
                     b: DataFrame, bStart: String, bEnd: String,
                     binSeconds: Long,
                     extraKeys: Seq[String] = Nil): DataFrame = {
    def binned(df: DataFrame, s: String, e: String, tag: String): DataFrame =
      df.filter(col(e) > col(s))
        .withColumn(s"__${tag}s",
          (col(s).cast("timestamp").cast("long") / binSeconds).cast("long"))
        .withColumn(s"__${tag}e",
          (col(e).cast("timestamp").cast("long") / binSeconds).cast("long"))
        .withColumn("__bin",
          explode(sequence(col(s"__${tag}s"), col(s"__${tag}e"))))
        .drop(s"__${tag}e")
    val ab = binned(a, aStart, aEnd, "a")
    val bb = binned(b, bStart, bEnd, "b")
    val (aS, aE, bS, bE) = (col(aStart), col(aEnd), col(bStart), col(bEnd))
    val relation =
      when(aS === bS && aE === bE, "equals")
        .when(aE === bS, "meets")
        .when(bE === aS, "met_by")
        .when(aS === bS && aE < bE, "starts")
        .when(aS === bS, "started_by")
        .when(aE === bE && aS > bS, "finishes")
        .when(aE === bE, "finished_by")
        .when(aS > bS && aE < bE, "during")
        .when(aS < bS && aE > bE, "contains")
        .when(aS < bS, "overlaps")
        .otherwise("overlapped_by")
    ab.join(bb, "__bin" +: extraKeys)
      .filter(aS <= bE && bS <= aE &&
        col("__bin") === greatest(col("__as"), col("__bs")))
      .withColumn("relation", relation)
      .drop("__bin", "__as", "__bs")
  }
}
