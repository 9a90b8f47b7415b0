package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins int8 scalar quantization: calibration, encode, and the
  * reconstruction-error report. */
class Int8QuantSpec extends SparkSpec {
  import spark.implicits._

  // dim 0 spans [0,1]; dim 1 spans [-2,2]; dim 2 is constant (the
  // degenerate scale-0 path)
  private def vecs = Seq(
    (0L, Array(0.0f, -2.0f, 7.0f)),
    (1L, Array(0.5f, 0.0f, 7.0f)),
    (2L, Array(1.0f, 2.0f, 7.0f))
  ).toDF("vec_id", "embedding")

  test("int8QuantParams finds per-dim min/max") {
    val p = Similarity.int8QuantParams(vecs, "embedding", dim = 3)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(p === Seq((0, 0.0, 1.0), (1, -2.0, 2.0), (2, 7.0, 7.0)))
  }

  test("int8Quantize maps extremes to ±extremal codes, constants to 0") {
    val params = Similarity.int8QuantParams(vecs, "embedding", dim = 3)
    // tinyint array → int array for the encoder ([B would mean binary)
    val codes = Similarity.int8Quantize(vecs, "vec_id", "embedding", params)
      .select(col("vec_id"), col("codes").cast("array<int>"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    // min → floor(0.5)−128 = −128; max → floor(255+0.5)−128 = 127;
    // midpoint 0.5 of [0,1] → floor(127.5+0.5)−128 = 0
    assert(codes(0)._2.toSeq === Seq(-128, -128, 0))
    assert(codes(1)._2.toSeq === Seq(0, 0, 0))
    assert(codes(2)._2.toSeq === Seq(127, 127, 0))
  }

  test("int8ReconError bounds error by half a quantization step") {
    val params = Similarity.int8QuantParams(vecs, "embedding", dim = 3)
    val (n, meanMse, maxMse) = Similarity
      .int8ReconError(vecs, "vec_id", "embedding", dim = 3, params)
      .as[(Long, Double, Double)].head()
    assert(n === 3L)
    // worst per-dim error ≤ (scale/2)²; largest scale is 4/255
    val bound = math.pow(4.0 / 255.0 / 2.0, 2)
    assert(maxMse <= bound + 1e-12)
    assert(meanMse >= 0.0 && meanMse <= maxMse + 1e-12)
  }
}
