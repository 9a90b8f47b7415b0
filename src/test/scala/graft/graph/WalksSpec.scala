package graft.graph

import java.security.MessageDigest

import graft.SparkSpec

class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val edges = Seq( // small directed graph, symmetrized below
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L))
  private val sym = edges ++ edges.map { case (a, b) => (b, a) }

  /** Brute-force walk model mirroring the hash-mod-degree hop rule:
    * rank md5("start|w|t") mod degree among neighbors in dst order. */
  private def bruteWalks(walksPerNode: Int, steps: Int)
  : Seq[(Long, Long, Long, Long)] = {
    val adj = sym.distinct.groupBy(_._1).map { case (k, v) =>
      (k, v.map(_._2).sorted) }
    val nodes = sym.map(_._1).distinct.sorted
    for {
      start <- nodes
      w <- 0 until walksPerNode
      walk = Iterator.iterate((0L, start)) { case (t, cur) =>
        val nbrs = adj(cur)
        val h = java.lang.Long.parseLong(
          md5hex(s"$start|$w|${t + 1}").take(8), 16)
        (t + 1, nbrs((h % nbrs.length).toInt))
      }.take(steps + 1).toSeq
      (t, node) <- walk
    } yield (start, w.toLong, t, node)
  }

  test("randomWalks reproduces the hash-mod-degree hop rule exactly") {
    val df = sym.toDF("src", "dst")
    val got = Walks.randomWalks(df, "src", "dst", walksPerNode = 2,
        steps = 3)
      .orderBy("start", "walk", "step")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = bruteWalks(2, 3).sortBy(r => (r._1, r._2, r._3))
    assert(got === want)
  }

  test("skipGramPairs emits windowed co-occurrences with counts") {
    val walks = Seq( // one hand walk: 1 -> 2 -> 3 -> 4
      (1L, 0L, 0L, 1L), (1L, 0L, 1L, 2L), (1L, 0L, 2L, 3L),
      (1L, 0L, 3L, 4L))
      .toDF("start", "walk", "step", "node")
    val got = Walks.skipGramPairs(walks, window = 2)
      .as[(Long, Long, Long)].collect().toSet
    // each ordered pair within distance <=2 appears once
    val want = Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 2L), (3L, 4L), (4L, 2L), (4L, 3L))
      .map { case (a, b) => (a, b, 1L) }
    assert(got === want)
  }
}
