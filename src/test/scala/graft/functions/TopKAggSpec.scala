package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-k aggregator must be indistinguishable from the
  * row_number window formulation it replaces — including under exact
  * score ties (id-ascending break), k larger than the group, and any
  * partitioning (mergeable-summary property: partial tops merged
  * re-take the true top). */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("g", "id", "rnk", "score")
      .as[(Long, Long, Int, Double)].collect().toSet
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val rank = udaf(TopKAgg.topK(k),
      org.apache.spark.sql.Encoders.product[TopKAgg.Scored])
    df.groupBy("g")
      .agg(rank(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id").as("id"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.score").as("score"))
      .as[(Long, Long, Int, Double)].collect().toSet
  }

  private def nativeTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(call_function("graft_topk", col("score"), col("id"),
        lit(k)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id").as("id"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.score").as("score"))
      .as[(Long, Long, Int, Double)].collect().toSet

  test("native graft_topk ≡ udaf Aggregator ≡ row_number window") {
    // the engine path (TypedImperativeAggregate) must be bit-identical
    // to both the udaf twin and the window, including null-score rows
    // (skipped — the cosine NULL convention) and serialize/deserialize
    // across the partial-merge exchange
    val rnd = new scala.util.Random(47)
    val rows = (0 until 600).map { i =>
      (i % 6L, i.toLong,
        if (i % 37 == 0) None else Some(rnd.nextInt(15) / 10.0))
    }
    val df = rows.toDF("g", "id", "score")
      .select(col("g"), col("id"), col("score").cast("double"))
      .repartition(11)
    val nn = df.filter(col("score").isNotNull)
    for (k <- Seq(1, 4, 300)) {
      val native = nativeTopK(df, k) // nulls skipped inside the agg
      assert(native === aggTopK(nn, k), s"native != udaf at k=$k")
      assert(native === windowTopK(nn, k), s"native != window at k=$k")
    }
  }

  test("agg top-k ≡ row_number window, with exact ties and k > |group|") {
    val rnd = new scala.util.Random(31)
    // quantized scores force exact double ties; group 7 has fewer rows
    // than k so the short-group path is exercised too
    val rows = (0 until 800).map { i =>
      val g = (i % 8).toLong
      val score = if (g == 7 && i >= 100) -1.0 // keep group 7 tiny
        else (rnd.nextInt(12) / 10.0)
      (g, i.toLong, score)
    }.filter { case (g, _, s) => g != 7 || s != -1.0 }
    val df = rows.toDF("g", "id", "score")
      .repartition(13) // partials must merge across an odd partitioning
    for (k <- Seq(1, 3, 5, 200)) {
      assert(aggTopK(df, k) === windowTopK(df, k), s"diverged at k=$k")
    }
  }

  test("merge caps the buffer at k under adversarial partial order") {
    // ascending inserts are the worst case for a best-first buffer:
    // every insert displaces — the end state must still be the true top
    val df = (0 until 500).map(i => (0L, i.toLong, i.toDouble))
      .toDF("g", "id", "score").repartition(17)
    val got = aggTopK(df, 4).toSeq.sortBy(_._3) // by rnk
    assert(got.map(_._2).toSet === Set(496L, 497L, 498L, 499L))
    assert(got.map(_._4).max === 499.0)
  }
}
