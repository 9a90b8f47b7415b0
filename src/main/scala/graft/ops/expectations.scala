package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation (the Deequ/Great-Expectations shape): a
  * suite of named column constraints evaluated in ONE aggregation pass
  * over the table, returning a long-format report
  * (check, metric, lo, hi, ok) — the quality gate a lake pipeline runs
  * before publishing a snapshot.
  *
  * Every constraint reduces to a scalar metric plus a [lo, hi] acceptance
  * band, so the whole suite is a single `df.agg(...)` — one scan, one
  * partial-agg collapse to a 1-row frame, then a scan-local explode to
  * rows. No per-check passes, no driver-side evaluation: at 100 TB the
  * cost is exactly one full-table aggregate regardless of suite size.
  *
  * Exact `uniqueness` checks use `countDistinct`, which Expands the scan
  * once per distinct-column — fine alongside a handful of checks, but
  * the 100 TB profile wants [[approxUniqueness]] (HLL, no Expand,
  * ±~2.3%); widen the acceptance band accordingly.
  *
  * Determinism: ratio metrics are integer-count divisions (bit-equal on
  * any engine); value-bound metrics over doubles must route through the
  * decimal-sum pattern (see [[mean]]) so summation order cannot move the
  * metric across a band edge. Metrics are rounded to 6dp.
  */
object expectations {

  /** One constraint: an aggregate metric expression and its acceptance
    * band (inclusive on both ends). */
  final case class Check(name: String, metric: Column,
                         lo: Double, hi: Double)

  /** Fraction of non-null values — 1.0 means the column is complete. */
  def completeness(c: Column): Column =
    avg(when(c.isNotNull, 1.0d).otherwise(0.0d))

  /** Zero-denominator-safe ratio: NULL (→ the fail-closed path in
    * [[validateBy]]) instead of the DIVIDE_BY_ZERO error the session's
    * default ANSI mode raises — an all-null column must fail its
    * uniqueness/mean check, not abort the whole release gate. */
  private def ratio(num: Column, denom: Column): Column =
    when(denom > 0, num / denom)

  /** Distinct-to-total ratio over non-null values — 1.0 means unique. */
  def uniqueness(c: Column): Column =
    ratio(count_distinct(c).cast("double"),
      sum(when(c.isNotNull, 1L).otherwise(0L)).cast("double"))

  /** HLL uniqueness for the no-Expand scale path (±~2.3% std error at
    * the default rsd) — band must absorb the sketch error. */
  def approxUniqueness(c: Column): Column =
    ratio(approx_count_distinct(c).cast("double"),
      sum(when(c.isNotNull, 1L).otherwise(0L)).cast("double"))

  /** Fraction of non-null values matching a Java/RE2-common regex
    * (keep patterns to character classes both engines agree on). */
  def matchRate(c: Column, pattern: String): Column =
    avg(when(c.isNull, lit(null))
      .otherwise(when(regexp_like(c.cast("string"), lit(pattern)), 1.0d)
        .otherwise(0.0d)))

  /** Fraction of non-null values inside an accepted set. */
  def inSetRate(c: Column, values: Seq[String]): Column =
    avg(when(c.isNull, lit(null))
      .otherwise(when(c.cast("string").isInCollection(values), 1.0d)
        .otherwise(0.0d)))

  /** Order-free mean of a numeric column: decimal(18,2) partial sums are
    * associative, so Spark's and any other engine's reduction order
    * produce the identical double. */
  def mean(c: Column): Column =
    ratio(sum(c.cast("decimal(18,2)")).cast("double"),
      count(c).cast("double"))

  /** Evaluate the suite: one aggregation pass, then explode the 1-row
    * result into (check, metric, lo, hi, ok) rows. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame =
    validateBy(df, Seq.empty, checks)

  /** Group-wise suite: the same one-pass evaluation per `groupCols`
    * value — "every source/partition must satisfy the contract"
    * (per-partition row-count bands, per-source completeness). One
    * map-side-combined groupBy regardless of suite size; the report is
    * |groups|·|checks| rows. */
  def validateBy(df: DataFrame, groupCols: Seq[String],
                 checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val cols = checks.zipWithIndex.map { case (c, i) =>
      round(c.metric.cast("double"), 6).as(s"__m$i")
    }
    val agged =
      if (groupCols.isEmpty) df.agg(cols.head, cols.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(cols.head, cols.tail: _*)
    val rows = array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"__m$i").as("metric"),
        lit(c.lo).as("lo"), lit(c.hi).as("hi"))
    }: _*)
    agged.select(groupCols.map(col) :+ explode(rows).as("c"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("c.check").as("check"), col("c.metric").as("metric"),
        col("c.lo").as("lo"), col("c.hi").as("hi"),
        // fail CLOSED: a null metric (e.g. matchRate over an all-null
        // column) is a failed check, not an unknown — a release gate
        // must not wave through what it could not measure
        coalesce(col("c.metric") >= col("c.lo") &&
          col("c.metric") <= col("c.hi"), lit(false)).as("ok")): _*)
  }
}
