package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = Graph.Scale

  /** Driver-side replica of the integer fixed-point iteration — the spec
    * oracle for exact rank values. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          dPct: Long = 85L): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val out = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val teleport = ((100L - dPct) * S / 100L) / n
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(v =>
        v -> (teleport + dPct * in.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("two-node symmetric graph is a fixpoint at S/2 each") {
    val edges = Seq((1L, 2L), (2L, 1L))
    assert(run(edges, 3) === Map(1L -> S / 2, 2L -> S / 2))
  }

  test("star graph: hub outranks leaves, mass ≈ conserved") {
    val leaves = (1L to 4L)
    val edges = leaves.flatMap(l => Seq((0L, l), (l, 0L)))
    val r = run(edges, 4)
    assert(leaves.forall(l => r(0L) > r(l)), s"hub must dominate: $r")
    val total = r.values.sum
    // floor divisions lose <1 unit per node per term per iteration
    assert(total <= S && total > S - 1000L, s"mass drifted: $total")
  }

  test("matches the driver-side integer reference on a random graph") {
    val rnd = new scala.util.Random(42)
    val base = (0 until 60).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2).distinct
    val sym = (base ++ base.map(_.swap)).distinct
    assert(run(sym, 3) === refPageRank(sym, 3))
  }

  test("empty edge list yields an empty ranking, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(empty, "src", "dst", 3).count() === 0L)
  }

  test("triangle count matches brute force on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 4
      val edges = (0 until n * 3).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val undirected = edges
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val adj = undirected.toSet
      val nodes = undirected.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val brute = nodes.combinations(3).count { case Seq(a, b, c) =>
        adj((a, b)) && adj((a, c)) && adj((b, c))
      }
      // feed RAW noisy edges (dups + both orientations) — the operator
      // must normalize
      val got = Graph.triangleCount(
        (edges ++ edges.map(_.swap)).toDF("src", "dst"), "src", "dst")
        .as[Long].head()
      assert(got === brute.toLong, s"trial $trial")
    }
  }

  test("triangle count: clique and triangle-free cases") {
    // K5 has C(5,3)=10 triangles
    val k5 = (0L to 4L).combinations(2).map(s => (s(0), s(1))).toSeq
    assert(Graph.triangleCount(k5.toDF("a", "b"), "a", "b")
      .as[Long].head() === 10L)
    // a bipartite (star) graph has none
    val star = (1L to 6L).map(i => (0L, i))
    assert(Graph.triangleCount(star.toDF("a", "b"), "a", "b")
      .as[Long].head() === 0L)
  }

  test("adamic-adar matches driver-side brute force on a random graph") {
    val rnd = new scala.util.Random(23)
    val raw = (0 until 120).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val und = raw.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val expected = und.flatMap { case (a, b) =>
      val common = nbrs(a) intersect nbrs(b)
      if (common.isEmpty) None
      else Some((a, b) -> ((common.size.toLong,
        common.toSeq.map(w =>
          math.round(1000000.0 / math.log(nbrs(w).size))).sum)))
    }.toMap
    val got = Graph.adamicAdar(raw.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === expected)
  }

  test("ranks are partitioning-independent") {
    val edges = (1L to 30L).flatMap(i =>
      Seq((i, i % 7 + 100L), (i % 7 + 100L, i)))
    val a = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(7),
      "src", "dst", 3).as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
