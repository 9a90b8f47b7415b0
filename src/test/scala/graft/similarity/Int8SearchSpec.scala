package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the int8 search path: decode round-trip, asymmetric top-k over
  * the reconstructed corpus, and the recall@k eval harness. */
class Int8SearchSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated directions plus a near-copy of vec 0, so the
  // exact neighbor order is obvious and quantization cannot flip it
  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("int8Reconstruct inverts int8Quantize to within half a step") {
    val params = Similarity.int8QuantParams(vecs, "embedding", dim = 3)
    val codes = Similarity.int8Quantize(vecs, "vec_id", "embedding",
      params)
    val recon = Similarity.int8Reconstruct(codes, "vec_id", params)
      .as[(Long, Seq[Double])].collect().toMap
    val orig = vecs.as[(Long, Seq[Float])].collect().toMap
    val halfStep = 1.0 / 255.0 / 2.0 + 1e-9 // widest dim spans 1.0
    orig.foreach { case (id, xs) =>
      xs.zip(recon(id)).foreach { case (x, xh) =>
        assert(math.abs(x.toDouble - xh) <= halfStep,
          s"vec $id: $x vs $xh")
      }
    }
  }

  test("int8TopK ranks the near-copy first and matches exact order") {
    val params = Similarity.int8QuantParams(vecs, "embedding", dim = 3)
    val codes = Similarity.int8Quantize(vecs, "vec_id", "embedding",
      params)
    val got = Similarity
      .int8TopK(vecs.filter(col("vec_id") === 0), codes, params, k = 3)
      .orderBy("rnk")
      .as[(Long, Long, Int, Double)].collect()
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L)) // near-copy first
    assert(got.map(_._3).toSeq === Seq(1, 2, 3))
    assert(got.head._4 > 0.99)
  }

  test("annRecall reports hits over the exact set, missing queries = 0") {
    val exact = Seq((0L, 1L), (0L, 2L), (9L, 3L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((0L, 1L), (0L, 7L)).toDF("query_id", "neighbor_id")
    val got = Similarity.annRecall(exact, approx)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // query 0: 1 of 2 exact neighbors found; query 9: none found
    assert(got === Seq((0L, 2L, 1L, 0.5), (9L, 1L, 0L, 0.0)))
  }

  test("int8 search recall on separated clusters is perfect") {
    val params = Similarity.int8QuantParams(vecs, "embedding", dim = 3)
    val codes = Similarity.int8Quantize(vecs, "vec_id", "embedding",
      params)
    val q = vecs.filter(col("vec_id") < 2)
    val rec = Similarity.annRecall(
      Similarity.bruteForceTopK(q, vecs, k = 2),
      Similarity.int8TopK(q, codes, params, k = 2))
      .select("recall").as[Double].collect()
    assert(rec.forall(_ === 1.0))
  }
}
