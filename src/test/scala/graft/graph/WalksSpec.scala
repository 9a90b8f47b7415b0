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

  test("directed graph: sinks get a step-0 row and stop") {
    // 1 -> 2 -> 3, 3 is a sink
    val df = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Walks.randomWalks(df, "src", "dst", walksPerNode = 1,
        steps = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // every distinct node (incl. sink 3) contributes step 0
    assert(got.filter(_._3 == 0L).map(_._1).toSet === Set(1L, 2L, 3L))
    // the sink's walk has ONLY step 0
    assert(got.filter(_._1 == 3L).map(_._3) === Seq(0L))
    // deterministic chain: 1 walks 1->2->3, 2 walks 2->3 then stops
    assert(got.filter(r => r._1 == 1L).map(_._4).sorted ===
      Seq(1L, 2L, 3L))
  }

  /** Brute node2vec model mirroring the truncated-rejection rule. */
  private def bruteN2v(steps: Int, wRet: Long, wCom: Long, wFar: Long,
                       maxAtt: Int): Seq[(Long, Long, Long, Long)] = {
    val adj = sym.distinct.groupBy(_._1).map { case (k, v) =>
      (k, v.map(_._2).sorted) }
    val eSet = sym.distinct.toSet
    val wMax = Seq(wRet, wCom, wFar).max
    def h(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    for {
      start <- nodes
      walk = {
        var prev = start
        var cur = adj(start)(
          (h(s"$start|0|1") % adj(start).length).toInt)
        var acc = Seq((0L, start), (1L, cur))
        for (t <- 2 to steps) {
          val nbrs = adj(cur)
          val cands = (1 to maxAtt).map { a =>
            val v = nbrs((h(s"n2vp|$start|0|$t|$a") % nbrs.length).toInt)
            val w = if (v == prev) wRet
              else if (eSet((prev, v))) wCom else wFar
            val ok = h(s"n2va|$start|0|$t|$a") % wMax < w
            (a, v, ok)
          }
          val pick = cands.find(_._3).getOrElse(cands.head)._2
          prev = cur; cur = pick
          acc :+= ((t.toLong, cur))
        }
        acc
      }
      (t, node) <- walk
    } yield (start, 0L, t, node)
  }

  test("node2vecWalks reproduces the truncated-rejection model exactly") {
    val df = sym.toDF("src", "dst")
    val got = Walks.node2vecWalks(df, "src", "dst", walksPerNode = 1,
        steps = 3, wReturnMilli = 250L, wCommonMilli = 1000L,
        wFarMilli = 2000L, maxAttempts = 4)
      .orderBy("start", "walk", "step")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = bruteN2v(3, 250L, 1000L, 2000L, 4)
      .sortBy(r => (r._1, r._2, r._3))
    assert(got === want)
  }

  test("node2vec regimes differ: return-heavy walks revisit more") {
    // return rate = fraction of steps t>=2 where node(t) == node(t-2);
    // with w_ret >> others the sampler should go back far more often
    val df = sym.toDF("src", "dst")
    def returnRate(wRet: Long, wFar: Long): Double = {
      val rows = Walks.node2vecWalks(df, "src", "dst",
          walksPerNode = 4, steps = 6, wReturnMilli = wRet,
          wCommonMilli = 1000L, wFarMilli = wFar, maxAttempts = 6)
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(r => (r._1, r._2))
        .values.map(_.sortBy(_._3).map(_._4))
      val (ret, tot) = rows.foldLeft((0, 0)) { case ((r, n), w) =>
        val backs = (2 until w.length).count(i => w(i) == w(i - 2))
        (r + backs, n + math.max(w.length - 2, 0))
      }
      ret.toDouble / tot
    }
    val bfs = returnRate(wRet = 4000L, wFar = 250L)  // p small: go back
    val dfs = returnRate(wRet = 100L, wFar = 4000L)  // q small: run away
    assert(bfs > dfs + 0.1,
      s"return-heavy rate $bfs should exceed explore-heavy $dfs")
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
