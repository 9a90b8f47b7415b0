package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Self-test of the straggler plan guard: it must flag a window
  * partitioned solely by the group column even when an aggregate sits
  * below it (a per-record aggregate is still corpus-sized — the
  * blindspot a subtree-wide "any Aggregate" exemption would open),
  * and exempt ONLY the offset-lift idiom's window over the
  * partition-id-keyed bounded counts frame. */
class PlanGuardsSpec extends SparkSpec {
  import spark.implicits._

  test("flags a source-only window even above a corpus-sized aggregate") {
    val df = (0 until 200).map(i =>
      (i.toLong, if (i % 2 == 0) "big" else "small")).toDF("id", "src")
    val offending = PlanGuards.sourceOnlyWindows(spark, "src") {
      val agg = df.groupBy("id", "src").agg(count(lit(1)).as("n"))
      agg.withColumn("rk", row_number().over(
          Window.partitionBy("src").orderBy("id")))
        .collect()
    }
    assert(offending.nonEmpty,
      "a per-record aggregate below the window must NOT exempt it")
  }

  test("a column merely NAMED __pid does not exempt a window") {
    // the exemption is keyed by the spark_partition_id() DEFINITION
    // (exprId), not the attribute name — production code grouping a
    // corpus-sized frame by its own __pid column must still be flagged
    val df = (0 until 200).map(i =>
      (i.toLong, i.toLong % 7, if (i % 2 == 0) "big" else "small"))
      .toDF("id", "__pid", "src")
    val offending = PlanGuards.sourceOnlyWindows(spark, "src") {
      val agg = df.groupBy("__pid", "src").agg(count(lit(1)).as("n"))
      agg.withColumn("rk", row_number().over(
          Window.partitionBy("src").orderBy("__pid")))
        .collect()
    }
    assert(offending.nonEmpty,
      "a name-only __pid grouping must NOT exempt the window")
  }

  test("physicalNodes unwraps the AQE root; the naive traversal it " +
    "replaces is provably vacuous") {
    val df = (0 until 100).map(i => (i % 5, i)).toDF("g", "v")
      .groupBy("g").agg(sum(col("v")).as("s"))
    val plan = df.queryExecution.executedPlan
    // the trap the helper closes: the adaptive root reports NO
    // children pre-execution, so a naive p.children walk sees exactly
    // one node and any guard over it green-lights nothing
    assert(plan.isInstanceOf[org.apache.spark.sql.execution.adaptive
      .AdaptiveSparkPlanExec], "fixture must produce an AQE plan")
    assert(plan.children.isEmpty,
      "naive children traversal would see a single node here")
    val nodes = PlanGuards.physicalNodes(plan)
    assert(nodes.length > 3, "helper must see the real tree")
    assert(nodes.exists(_.nodeName.contains("HashAggregate")),
      s"real aggregate not reached: ${nodes.map(_.nodeName)}")
    // the mandatory tree-size pin turns a too-small traversal into a
    // loud failure instead of a vacuously green guard
    intercept[IllegalArgumentException] {
      PlanGuards.physicalNodes(plan, minNodes = nodes.length + 100)
    }
  }

  test("exempts the offset-lift's partition-bounded offsets window") {
    val df = (0 until 200).map(i =>
      (i.toLong, if (i % 2 == 0) "big" else "small")).toDF("id", "g")
    val offending = PlanGuards.sourceOnlyWindows(spark, "g") {
      graft.ops.windows.groupedPrefixSum(df, Seq("g"), Seq(col("id")),
        lit(0L), rankName = "rk").collect()
    }
    assert(offending.isEmpty, offending.mkString("\n"))
  }
}
