package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the label-supervised eval stack: per-label centroids,
  * nearest-centroid + LOO-kNN classification, cluster purity — each
  * with its documented tie rule on hand-sized data. */
class LabelEvalSpec extends SparkSpec {
  import spark.implicits._

  // two directional clusters (cosine-separable AND euclidean-separable):
  // label 0 points along (1,0), label 1 along (0,1); no zero vectors
  private def vecs = Seq(
    (0L, Array(10.0f, 0.0f), 0),
    (1L, Array(9.0f, 1.0f), 0),
    (2L, Array(10.0f, -1.0f), 0),
    (3L, Array(0.0f, 10.0f), 1),
    (4L, Array(1.0f, 9.0f), 1),
    (5L, Array(-1.0f, 10.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("labelCentroids is the per-label elementwise mean") {
    val c = LabelEval.labelCentroids(vecs, "embedding", "label")
      .as[(Int, Seq[Double])].collect().toMap
    assert(c(0) === Seq(29.0 / 3.0, 0.0))
    assert(c(1) === Seq(0.0, 29.0 / 3.0))
  }

  test("nearestCentroidClassify is perfect on separable clusters") {
    val got = LabelEval.nearestCentroidClassify(
      vecs, "vec_id", "embedding", "label")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(got.length === 6)
    assert(got.forall { case (_, l, p, c) => l === p && c === 1 })
  }

  test("centroid distance ties break toward the lower label") {
    // identical point sets under both labels → identical centroids →
    // every distance ties exactly → every pred must be the LOWER label
    val dup = Seq(
      (0L, Array(2.0f, 0.0f), 0), (1L, Array(0.0f, 2.0f), 0),
      (2L, Array(5.0f, 5.0f), 0),
      (3L, Array(2.0f, 0.0f), 1), (4L, Array(0.0f, 2.0f), 1),
      (5L, Array(5.0f, 5.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = LabelEval.nearestCentroidClassify(
      dup, "vec_id", "embedding", "label")
      .as[(Long, Int, Int, Int)].collect()
    assert(got.forall(_._3 === 0))
    assert(got.filter(_._2 === 0).forall(_._4 === 1))
    assert(got.filter(_._2 === 1).forall(_._4 === 0))
  }

  test("knnClassify LOO majority vote; vote ties to the lower label") {
    val got = LabelEval.knnClassify(
      vecs, "vec_id", "embedding", "label", k = 3)
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    // each point's top-3 other neighbors hold 2 same-cluster votes
    assert(got.length === 6)
    assert(got.forall { case (_, l, p, c) => l === p && c === 1 })
    // explicit vote tie: one vote per label → the LOWER label wins
    val votesTie = Seq(
      ("q", 1, 2), ("q", 1, 0)
    ).toDF("qid", "qlabel", "nlabel")
    val v = LabelEval.knnVote(votesTie)
      .select("pred").as[Int].head()
    assert(v === 0)
  }

  test("knnClassify excludes zero-norm vectors from the cosine space") {
    val withZero = vecs.union(
      Seq((9L, Array(0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label"))
    val got = LabelEval.knnClassify(
      withZero, "vec_id", "embedding", "label", k = 3)
      .as[(Long, Int, Int, Int)].collect()
    // the zero vector has no direction: it is neither classified nor
    // voted for, and the others still classify perfectly
    assert(got.map(_._1).toSet === (0L until 6L).toSet)
    assert(got.forall { case (_, l, p, c) => l === p && c === 1 })
  }

  test("negativePairs: deterministic, never self or same-label") {
    val p1 = LabelEval.negativePairs(vecs, "vec_id", "label", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    val p2 = LabelEval.negativePairs(vecs, "vec_id", "label", k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(p1 === p2)                       // rerun-identical
    assert(p1.nonEmpty)
    val labels = Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 1)
    p1.foreach { case (a, j, neg) =>
      assert(neg !== a)
      assert(labels(neg) !== labels(a))     // a true negative
      assert(j >= 0 && j < 3)
    }
    // at most k draws per anchor
    assert(p1.groupBy(_._1).values.map(_.size).max <= 3)
  }

  test("classReport aggregates per-class accuracy") {
    val pred = Seq((0, 1), (0, 1), (0, 0), (1, 1))
      .toDF("label", "correct")
    val rep = LabelEval.classReport(pred)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(rep(0) === ((0, 3L, 2L, 0.666667)))
    assert(rep(1) === ((1, 1L, 1L, 1.0)))
  }

  test("confusionMatrix counts (label, pred) pairs") {
    val pred = Seq((0, 0), (0, 0), (0, 1), (1, 1))
      .toDF("label", "pred")
    val got = LabelEval.confusionMatrix(pred)
      .as[(Int, Int, Long)].collect().toSet
    assert(got === Set((0, 0, 2L), (0, 1, 1L), (1, 1, 1L)))
  }

  test("labelOutliers z-scores within the label; sd=0 label scores 0") {
    // label 0: 1-D points 0, 2, 10 → centroid 4, dists 4/2/6,
    //   mu=4, sd=sqrt(8/3); label 1: two identical points → sd=0
    val pts = Seq(
      (0L, Array(0.0f), 0), (1L, Array(2.0f), 0), (2L, Array(10.0f), 0),
      (3L, Array(5.0f), 1), (4L, Array(5.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = LabelEval.labelOutliers(pts, "vec_id", "embedding", "label")
      .as[(Long, Int, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(0L) === ((4.0, 0.0)))
    assert(got(1L) === ((2.0, -1.2247)))
    assert(got(2L) === ((6.0, 1.2247)))
    assert(got(3L) === ((0.0, 0.0)) && got(4L) === ((0.0, 0.0)))
  }

  test("clusterPurity reports size + majority per cell, ties low") {
    val cells = Seq((0L, 0), (1L, 0), (2L, 0), (3L, 1), (4L, 1),
      (5L, 1), (6L, 1)).toDF("vec_id", "cell")
    val labels = Seq((0L, 7), (1L, 7), (2L, 8), (3L, 5), (4L, 5),
      (5L, 6), (6L, 6)).toDF("vec_id", "label")
    val got = LabelEval.clusterPurity(cells, labels,
      "vec_id", "cell", "label")
      .as[(Int, Long, Int, Long)].collect().sortBy(_._1)
    assert(got(0) === ((0, 3L, 7, 2L)))
    // cell 1: labels 5 and 6 tie at 2 each → majority is the LOWER (5)
    assert(got(1) === ((1, 4L, 5, 2L)))
  }

  test("cohensKappa matches the hand-computed textbook example") {
    // classic 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10 → N=50,
    // po=0.7, pe=(30*25 + 20*25)/2500 = 0.5, kappa = 0.4
    val pred = (Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")))
      .zipWithIndex.map { case ((l, p), i) => (i.toLong, l, p) }
      .toDF("vec_id", "label", "pred")
    val r = LabelEval.cohensKappa(pred)
      .as[(Double, Double, Double)].head()
    assert(r === ((0.7, 0.5, 0.4)))
  }

  test("cohensKappa: perfect agreement is 1, degenerate pe=1 is null") {
    val perfect = Seq((1L, "a", "a"), (2L, "b", "b"), (3L, "a", "a"))
      .toDF("vec_id", "label", "pred")
    assert(LabelEval.cohensKappa(perfect)
      .select("kappa").as[Double].head() === 1.0)
    // one class on both sides: pe = 1 → kappa undefined (null), not 0/0
    val degen = Seq((1L, "a", "a"), (2L, "a", "a"))
      .toDF("vec_id", "label", "pred")
    assert(LabelEval.cohensKappa(degen)
      .select("kappa").as[Option[Double]].head().isEmpty)
  }

  test("aucRank: perfect, inverted, and tied scorers") {
    def auc(rows: Seq[(Long, Boolean)]): Long =
      LabelEval.aucRank(rows.toDF("score", "pos"), "score", "pos")
        .select("auc_micro").as[Long].head()
    // perfect separation → 1.0; inverted → 0.0
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true)))
      === 1000000L)
    assert(auc(Seq((4L, false), (3L, false), (2L, true), (1L, true)))
      === 0L)
    // all scores equal → every pair is a tie → 0.5 exactly
    assert(auc(Seq((7L, true), (7L, false), (7L, true), (7L, false)))
      === 500000L)
  }

  test("aucRank equals the naive pairwise probability on random data") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextBoolean()))
    val posS = rows.filter(_._2).map(_._1)
    val negS = rows.filterNot(_._2).map(_._1)
    // AUC = P(pos > neg) + ½P(pos = neg) over all pos×neg pairs
    val wins = posS.map(p => negS.count(_ < p).toLong).sum
    val ties = posS.map(p => negS.count(_ == p).toLong).sum
    val want = (wins * 2 + ties) * 1000000L /
      (2L * posS.size * negS.size)
    val got = LabelEval.aucRank(rows.toDF("score", "pos"),
      "score", "pos").select("auc_micro").as[Long].head()
    assert(got === want)
  }

  test("ndcgAtK matches a hand-computed binary-relevance NDCG") {
    // 2-D unit-ish vectors: queries 0,1 of label 0; the neighbor order
    // by cosine is hand-derivable. w = [1000000, 630930, 500000]
    val vs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.8f, 0.3f), 1),
      (3L, Seq(0.0f, 1.0f), 0),
      (4L, Seq(-1.0f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = LabelEval.ndcgAtK(vs, "vec_id", "embedding", "label",
        k = 3, col("vec_id") < 2)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // brute-force the expectation with plain Scala cosine
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val all = Seq((0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.8f, 0.3f), 1), (3L, Seq(0.0f, 1.0f), 0),
      (4L, Seq(-1.0f, 0.1f), 1))
    val w = Seq(1000000L, 630930L, 500000L)
    val cum = w.scanLeft(0L)(_ + _).tail
    val want = (0L to 1L).map { q =>
      val (_, qe, qlab) = all.find(_._1 == q).get
      val nbrs = all.filter(_._1 != q)
        .map(v => (v._1, cos(qe, v._2), v._3))
        .sortBy { case (id, c, _) => (-c, id) }.take(3)
      val rels = nbrs.map(_._3 == qlab)
      val dcg = rels.zip(w).collect { case (true, wi) => wi }.sum
      val nRel = rels.count(identity).toLong
      val idcg = if (nRel > 0) cum(nRel.toInt - 1) else 0L
      val ndcg = if (idcg > 0) dcg * 1000L / idcg else 0L
      (q, nRel, dcg, idcg, ndcg)
    }
    assert(got === want)
  }

  test("mrrAtK finds the first same-label rank, 0 when absent") {
    val vs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 1),
      (2L, Seq(0.8f, 0.3f), 0),
      (3L, Seq(0.0f, 1.0f), 1),
      (4L, Seq(-1.0f, 0.1f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = LabelEval.mrrAtK(vs, "vec_id", "embedding", "label",
        k = 2, col("vec_id") === 0 || col("vec_id") === 4)
      .orderBy("query_id")
      .as[(Long, Long, Long)].collect().toSeq
    // q0 (label 0): neighbors by cos desc = 1 (lab 1), 2 (lab 0) ->
    //   first hit rank 2, rr 500000
    // q4 (label 2): top-2 neighbors are 3 then 2 (labels 1, 0) ->
    //   no hit, rr 0
    assert(got === Seq((0L, 2L, 500000L), (4L, 0L, 0L)))
  }
}
