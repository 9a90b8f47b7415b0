package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Similarity

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.5f, -3.0f), Array(4.0f, 0.5f, 2.0f)),
    (2L, Array(0.1f, 0.2f, 0.3f), Array(0.0f, 0.0f, 0.0f)),
    (3L, Array.fill(64)(0.37f), Array.fill(64)(1.1f)))
    .toDF("id", "a", "b")

  test("native graft_dot is bit-identical to the HOF formulation") {
    val both = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ===
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("graft_dot resolves in SQL via the session extension") {
    vecs.createOrReplaceTempView("dot_vecs")
    val r = spark.sql(
      "SELECT graft_dot(a, b) AS d FROM dot_vecs WHERE id = 1")
      .as[Double].head()
    assert(math.abs(r - (1.0f * 4.0f + 2.5f * 0.5f + -3.0f * 2.0f)) < 1e-6)
  }

  test("graft_dot participates in codegen (no interpreted fallback)") {
    // LocalTableScan evaluates eagerly with no codegen span; use a range
    // source so the projection lands inside WholeStageCodegen
    val df = spark.range(100)
      .select(
        array((1 to 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
        array((1 to 8).map(i => (col("id") * i).cast("float")): _*).as("b"))
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_dot")))
    assert(df.count() === 100)
  }

  test("optimizer rule rewrites the HOF pattern to native graft_dot") {
    // non-literal source (a LocalRelation would be constant-folded before
    // the plan is observable); array() of float casts has containsNull=false
    val df = spark.range(3)
      .select(
        array((col("id") + 1).cast("float"),
          (col("id") + 2).cast("float")).as("a"),
        array((col("id") + 3).cast("float"),
          (col("id") + 4).cast("float")).as("b"))
      .select(Similarity.dotHof(col("a"), col("b")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"),
      s"HOF pattern not rewritten:\n$optimized")
    // id=0: [1,2]·[3,4] = 11
    assert(df.as[Double].collect().min === 11.0)
  }

  test("rolling hash: known value and codegen path") {
    val h = Seq("ab").toDF("s")
      .select(call_function("graft_rolling_hash", col("s")).as("h"))
      .as[Long].head()
    assert(h === ('a'.toLong * 31 + 'b'.toLong) % 1000000007L)
    val nullRes = Seq(Option.empty[String]).toDF("s")
      .select(call_function("graft_rolling_hash", col("s")).as("h"))
      .collect().head
    assert(nullRes.isNullAt(0))
  }

  test("null array → null result") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("length mismatch → null, matching the HOF form (both eval paths)") {
    // interpreted path: LocalRelation evaluates without codegen
    val local = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect().head
    assert(local.isNullAt(0) && local.isNullAt(1))
    // codegen path: range source keeps the projection in WholeStageCodegen
    val gen = spark.range(1)
      .select(
        array(lit(1.0f), lit(2.0f), lit(3.0f)).as("a"),
        array((col("id") + 1).cast("float"),
          (col("id") + 2).cast("float")).as("b"))
      .select(Similarity.dot(col("a"), col("b")).as("native"))
      .collect().head
    assert(gen.isNullAt(0))
  }
}
