package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the PCA stack: exact-decimal moment sums → population
  * covariance → driver-side Jacobi eigen → broadcast projection. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // rank-1 data in dims (0,1) — x1 = 2·x0 — plus a constant dim 2, so
  // the covariance matrix and eigenstructure are known in closed form
  private def vecs = Seq(
    (0L, Array(1.0f, 2.0f, 0.5f)),
    (1L, Array(2.0f, 4.0f, 0.5f)),
    (2L, Array(3.0f, 6.0f, 0.5f)),
    (3L, Array(4.0f, 8.0f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("covariance matches hand-computed population covariance") {
    val cov = Similarity.covariance(vecs, "embedding", dim = 3)
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(cov.size === 6) // upper triangle of 3×3
    assert(math.abs(cov((0, 0)) - 1.25) < 1e-9)
    assert(math.abs(cov((0, 1)) - 2.5) < 1e-9)
    assert(math.abs(cov((1, 1)) - 5.0) < 1e-9)
    assert(math.abs(cov((0, 2))) < 1e-9)
    assert(math.abs(cov((2, 2))) < 1e-9)
  }

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    // [[2,1],[1,2]] → λ = 3, 1 with axes (1,1)/√2 and (1,−1)/√2
    val (eig, v) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(eig(0) - 3.0) < 1e-12)
    assert(math.abs(eig(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(v(0)(0)) - r) < 1e-12)
    assert(math.abs(v(0)(0) - v(0)(1)) < 1e-12)      // same sign
    assert(math.abs(v(1)(0) + v(1)(1)) < 1e-12)      // opposite sign
  }

  test("pcaComponents recovers the single variance direction") {
    val rows = Similarity.pcaComponents(vecs, "embedding", dim = 3, k = 3)
      .as[(Int, Double, Seq[Double])].collect().sortBy(_._1)
    // total variance 1.25 + 5 = 6.25, all on one axis ∝ (1,2,0)
    assert(math.abs(rows(0)._2 - 6.25) < 1e-9)
    assert(math.abs(rows(1)._2) < 1e-9)
    assert(math.abs(rows(2)._2) < 1e-9)
    val ax = rows(0)._3
    val s = 1.0 / math.sqrt(5.0)
    assert(math.abs(math.abs(ax(0)) - s) < 1e-9)
    assert(math.abs(math.abs(ax(1)) - 2 * s) < 1e-9)
    assert(math.abs(ax(1) / ax(0) - 2.0) < 1e-9)     // same sign, 2:1
    assert(math.abs(ax(2)) < 1e-9)
  }

  test("sampled fit at frac 1.0 ≡ full fit; sample is deterministic") {
    val full = Similarity
      .pcaProjectFitted(vecs, "vec_id", "embedding", dim = 3, k = 1)
      .as[(Long, Int, Double)].collect().toSet
    val sampled = Similarity.pcaProjectSampleFitted(
      vecs, "vec_id", "embedding", dim = 3, k = 1, sampleFrac = 1.0)
      .as[(Long, Int, Double)].collect().toSet
    assert(sampled === full)
    // a partial sample still projects EVERY vector, on axes fit from
    // the md5-chosen subset — rerun-identical. 0.8 is the smallest
    // round frac whose md5 buckets admit any of these 4 ids (it picks
    // ids 1 and 2); the data is rank-1 so the subset fit still
    // projects all rows onto the same axis.
    val s1 = Similarity.pcaProjectSampleFitted(
      vecs, "vec_id", "embedding", dim = 3, k = 1, sampleFrac = 0.8)
      .as[(Long, Int, Double)].collect().toSet
    val s2 = Similarity.pcaProjectSampleFitted(
      vecs, "vec_id", "embedding", dim = 3, k = 1, sampleFrac = 0.8)
      .as[(Long, Int, Double)].collect().toSet
    assert(s1 === s2)
    assert(s1.map(_._1) === (0L until 4L).toSet)
  }

  test("an empty fit sample fails loudly, not with null coords") {
    // at frac 0.6 the md5 buckets of ids 0..3 all miss the cut — the
    // fit set is empty, which must surface as an error instead of a
    // null-filled projection
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaProjectSampleFitted(
        vecs, "vec_id", "embedding", dim = 3, k = 1, sampleFrac = 0.6)
    }
    assert(e.getMessage.contains("fit set is empty"))
  }

  test("pcaVerdict: every invariant boolean holds and anchors match") {
    val out = Similarity
      .pcaVerdict(vecs, "vec_id", "embedding", dim = 3, k = 2)
      .collect()
    assert(out.length === 8) // 4 vecs × 2 components
    val bools = Seq("ok_proj", "ok_parseval", "ok_centered", "ok_unit",
      "ok_orth", "ok_order", "ok_var")
    out.foreach { r =>
      bools.foreach(b => assert(r.getAs[Boolean](b), s"$b on $r"))
      assert(r.getAs[Long]("n_rows") === 4L)
      // total variance = trace = 1.25 + 5.0 + 0.0, rounded at 4dp
      assert(r.getAs[Double]("total_var") === 6.25)
    }
  }

  test("pcaProject coords are centered with variance = eigenvalue") {
    val comps = Similarity.pcaComponents(vecs, "embedding", dim = 3, k = 1)
    val coords = Similarity
      .pcaProject(vecs, "vec_id", "embedding", dim = 3, comps)
      .filter(col("component") === 0)
      .select("coord").as[Double].collect()
    assert(coords.length === 4)
    assert(math.abs(coords.sum) < 1e-9)              // mean-centered
    val popVar = coords.map(c => c * c).sum / coords.length
    assert(math.abs(popVar - 6.25) < 1e-9)
    // extreme rows project to ±1.5·√5 along the (1,2,0)/√5 axis
    assert(math.abs(coords.map(math.abs).max - 1.5 * math.sqrt(5.0))
      < 1e-9)
  }
}
