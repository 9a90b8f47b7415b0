package graft.similarity

import graft.SparkSpec

/** Pins the Johnson-Lindenstrauss projection: sign-matrix regenerability
  * and the projection arithmetic. */
class RpProjectSpec extends SparkSpec {
  import spark.implicits._

  test("rpSignMatrix is ±1, deterministic, and axis-distinct") {
    val m1 = Similarity.rpSignMatrix(spark, dim = 16, k = 4)
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    val m2 = Similarity.rpSignMatrix(spark, dim = 16, k = 4)
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    assert(m1.toSeq === m2.toSeq)                   // regenerable
    assert(m1.length === 4)
    m1.foreach { case (_, ax) =>
      assert(ax.length === 16)
      assert(ax.forall(v => v == 1.0 || v == -1.0))
    }
    // md5 mixes (i, j): distinct axes (a collision of all 16 signs
    // across two of four axes would mean a broken hash)
    assert(m1.map(_._2).distinct.length === 4)
  }

  test("rpProject computes ⟨x, axis⟩/√k for a hand-checked row") {
    val vecs = Seq((0L, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val axes = Similarity.rpSignMatrix(spark, dim = 16, k = 4)
      .as[(Int, Seq[Double])].collect().map { case (j, ax) =>
        j -> ax.sum / math.sqrt(4.0)
      }.toMap
    val got = Similarity.rpProject(vecs, "vec_id", "embedding",
      dim = 16, k = 4)
      .as[(Long, Int, Double)].collect()
    assert(got.length === 4)
    got.foreach { case (_, j, coord) =>
      assert(math.abs(coord - axes(j)) < 1e-12)
    }
  }

  test("rpRerankTopK with full-width coarse pool ≡ exact brute force") {
    // coarseK ≥ corpus: every candidate survives the coarse cut, so the
    // exact rerank must reproduce bruteForceTopK verbatim — the recall
    // contract's boundary case
    val vecs = (0L until 12L).map(i => (i, Array.tabulate(16)(j =>
      (((i + 1) * (j + 3)) % 17).toFloat / 17f + 0.01f)))
      .toSeq.toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions.col
    val q = vecs.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val rerank = Similarity.rpRerankTopK(q, vecs, dim = 16, kProj = 8,
      coarseK = 12, k = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(rerank === exact)
  }

  test("rpProject preserves norms in expectation (JL sanity)") {
    // a 64-dim unit vector's projected squared norm should be near 1
    // for the ±1/√k ensemble; with k=16 the concentration is loose, so
    // just bound it away from degenerate collapse/blowup
    val one = Seq((0L, Array.tabulate(64)(i =>
      if (i == 7) 1.0f else 0.0f))).toDF("vec_id", "embedding")
    val sq = Similarity.rpProject(one, "vec_id", "embedding",
      dim = 64, k = 16)
      .as[(Long, Int, Double)].collect().map(r => r._3 * r._3).sum
    // e_7 projects to ±1/√16 per component → Σ = 16/16 = 1 exactly
    assert(math.abs(sq - 1.0) < 1e-12)
  }
}
