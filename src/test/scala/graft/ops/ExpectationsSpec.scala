package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import expectations._

  private val df = Seq(
    (1L, Some("a-X"), Some(10.0)),
    (2L, Some("b-Y"), Some(20.0)),
    (2L, None, Some(30.0)), // duplicate key + null code
    (3L, Some("zz"), None)) // format violation + null value
    .toDF("id", "code", "v")

  test("validate flags failing constraints and passes holding ones") {
    val report = validate(df, Seq(
      Check("id_unique", uniqueness(col("id")), 1.0, 1.0),
      Check("code_complete", completeness(col("code")), 1.0, 1.0),
      Check("code_format", matchRate(col("code"), "^[a-z]-[A-Z]$"),
        1.0, 1.0),
      Check("v_mean", mean(col("v")), 0.0, 100.0)))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getBoolean(4)))).toMap
    assert(report("id_unique") === ((0.75, false))) // 3 distinct / 4
    assert(report("code_complete") === ((0.75, false)))
    // nulls are EXCLUDED from the match denominator: 2 of 3 match,
    // rounded through the fixed 6dp scale
    assert(report("code_format") === ((0.666667, false)))
    assert(report("v_mean") === ((20.0, true)))
  }

  test("one aggregation pass: the plan has a single Aggregate pair") {
    val report = validate(df, Seq(
      Check("id_unique", uniqueness(col("id")), 1.0, 1.0),
      Check("v_mean", mean(col("v")), 0.0, 100.0)))
    val plan = report.queryExecution.executedPlan.toString
    // countDistinct Expands once, but there is no second scan of df and
    // no join — the suite collapses into one aggregation tree
    assert(!plan.contains("Join"), plan)
  }

  test("validateBy emits a per-group verdict row per check") {
    val grouped = Seq(("a", 1.0), ("a", 3.0), ("b", 100.0))
      .toDF("g", "v")
    val rep = validateBy(grouped, Seq("g"), Seq(
      Check("rows", count(lit(1)).cast("double"), 2.0, 10.0),
      Check("v_mean", mean(col("v")), 0.0, 50.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getBoolean(5)))).toMap
    assert(rep(("a", "rows")) === ((2.0, true)))
    assert(rep(("b", "rows")) === ((1.0, false)))
    assert(rep(("a", "v_mean")) === ((2.0, true)))
    assert(rep(("b", "v_mean")) === ((100.0, false)))
  }

  test("approxUniqueness tracks exact within sketch tolerance") {
    val big = spark.range(0, 10000).toDF("id")
    val r = validate(big, Seq(
      Check("exact", uniqueness(col("id")), 1.0, 1.0),
      Check("approx", approxUniqueness(col("id")), 0.9, 1.1)))
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(r("exact") && r("approx"))
  }

  test("all-null / empty inputs fail closed, never DIVIDE_BY_ZERO") {
    val allNull = Seq.fill(3)(Option.empty[Double]).toDF("v")
    val r = validate(allNull, Seq(
      Check("u", uniqueness(col("v")), 0.9, 1.0),
      Check("au", approxUniqueness(col("v")), 0.9, 1.0),
      Check("m", mean(col("v")), 0.0, 100.0)))
      .collect().map(x => x.getString(0) -> x.getBoolean(4)).toMap
    assert(r === Map("u" -> false, "au" -> false, "m" -> false))
  }
}
