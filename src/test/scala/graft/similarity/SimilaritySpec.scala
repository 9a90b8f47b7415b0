package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),   // near 0
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.0f, 1.0f), 2),
    (4L, Array(1.0f, 0.05f, 0.0f), 0)   // nearer 0 than 1 is
  ).toDF("vec_id", "embedding", "label")

  test("cosine expression matches hand computation") {
    val c = vecs.filter(col("vec_id") === 0L)
      .crossJoin(vecs.filter(col("vec_id") === 2L)
        .select(col("embedding").as("e2")))
      .select(Similarity.cosine(col("embedding"), col("e2")).as("c"))
      .as[Double].head()
    assert(math.abs(c) < 1e-12) // orthogonal
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    val got = Similarity
      .bruteForceTopK(vecs.filter(col("vec_id") === 0L), vecs, k = 2)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toSet
    assert(got === Set((4L, 1), (1L, 2)))
  }

  test("ivfTopK only searches the query's cell") {
    val got = Similarity
      .ivfTopK(vecs.filter(col("vec_id") === 0L), vecs, "label", k = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got === Set(1L, 4L)) // label-0 cell only
  }

  test("kmeansCells groups the axis clusters and is deterministic") {
    val cells = Similarity.kmeansCells(vecs, k = 3, iters = 3)
      .as[(Long, Int)].collect().toMap
    // 0, 1, 4 point along x — same cell; 2 (y) and 3 (z) each their own
    assert(cells(0L) === cells(1L) && cells(1L) === cells(4L))
    assert(Set(cells(0L), cells(2L), cells(3L)).size === 3)
    val again = Similarity.kmeansCells(vecs, k = 3, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(again === cells)
  }

  test("ivfMultiProbe: more probes → brute-force result at full fan-out") {
    // 3 well-separated clusters so kmeans cells are stable
    val base = Seq(
      Array(10f, 0f, 0f), Array(0f, 10f, 0f), Array(0f, 0f, 10f))
    val corpus = (0L until 30L).map { i =>
      val c = base((i % 3).toInt)
      (i, c.zipWithIndex.map { case (v, j) =>
        v + (i * 7 % 5) * 0.01f * (j + 1) })
    }.toDF("vec_id", "embedding")
    val cells = Similarity.kmeansCells(corpus, k = 3, iters = 3)
    val qs = corpus.filter(col("vec_id") < 3)

    val brute = Similarity.bruteForceTopK(qs, corpus, k = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val full = Similarity.ivfMultiProbe(qs, corpus, cells, k = 4,
      nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === brute, "nProbe = |cells| must equal brute force")

    val one = Similarity.ivfMultiProbe(qs, corpus, cells, k = 4,
      nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall1 = (one & brute).size.toDouble / brute.size
    val recall3 = (full & brute).size.toDouble / brute.size
    assert(recall3 >= recall1, "recall must be monotone in probes")
    assert(one.nonEmpty && one.subsetOf(full))
  }

  test("hyperplane LSH: identical vectors share buckets") {
    val b = vecs
      .select(Similarity.hyperplaneBucket(col("embedding"), 3, 8).as("b"))
      .as[String].collect()
    assert(b(0).length === 8)
    assert(b.toSet.size > 1, "distinct directions should split buckets")
  }
}
