package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The spillable sort-based percentile must reproduce the built-in
  * `percentile()` (same t = p·(n−1) linear interpolation) bit-for-bit —
  * it exists to replace the built-in's whole-group memory buffer with a
  * sort, not to change values. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactPercentiles ≡ built-in percentile() on grouped data") {
    val df = spark.range(1000).select(
      (col("id") % 3).cast("string").as("g"),
      ((col("id") * 37 % 997) + (col("id") % 7) * 0.25).as("v"))
    val ours = quantiles.exactPercentiles(df, "g", "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val builtin = df.groupBy("g").agg(
      expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
      expr("percentile(v, 0.9)"), expr("percentile(v, 1.0)"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(ours.keySet === builtin.keySet)
    ours.foreach { case (g, (a, b, c, e)) =>
      val (x, y, z, w) = builtin(g)
      assert(java.lang.Double.doubleToLongBits(a) ===
        java.lang.Double.doubleToLongBits(x), s"p25 group $g")
      assert(java.lang.Double.doubleToLongBits(b) ===
        java.lang.Double.doubleToLongBits(y), s"p50 group $g")
      assert(java.lang.Double.doubleToLongBits(c) ===
        java.lang.Double.doubleToLongBits(z), s"p90 group $g")
      assert(java.lang.Double.doubleToLongBits(e) ===
        java.lang.Double.doubleToLongBits(w), s"p100 group $g")
    }
  }

  test("single-row group and p=0/p=1 edges") {
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val got = quantiles.exactPercentiles(df, "g", "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("a") === ((5.0, 5.0, 5.0)))
    assert(got("b") === ((1.0, 1.5, 2.0)))
  }
}
