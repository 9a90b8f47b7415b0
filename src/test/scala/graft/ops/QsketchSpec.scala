package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QsketchSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bucket math in plain Scala. */
  private def loOf(v: Long, s: Int): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L))
    val sh = math.max(e - s, 0)
    (v >> sh) << sh
  }

  test("bucketLo keeps exactly the top s+1 significant bits") {
    val vs = Seq(0L, 1L, 2L, 3L, 63L, 64L, 65L, 127L, 128L, 1000L,
      999983L, (1L << 40) - 1, 1L << 40, (1L << 40) + 12345L)
    val got = vs.toDF("v")
      .select(col("v"), qsketch.bucketLo(col("v"), 5).as("lo"))
      .as[(Long, Long)].collect().toMap
    vs.foreach { v =>
      assert(got(v) === (if (v == 0) 0L else loOf(v, 5)),
        s"bucketLo($v)")
    }
  }

  test("quantileReport bound always contains the exact quantile") {
    // heavy-tailed deterministic values: squares mod a prime, shifted
    val vals = (1L to 5000L).map(i => (i * i) % 999983L + 1L)
    val rep = qsketch.quantileReport(vals.toDF("v"), "v", s = 4,
        permilles = Seq(1, 100, 500, 900, 999))
      .orderBy("q_permille")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rep.length === 5)
    val sorted = vals.sorted
    rep.foreach { case (q, n, lo, hi, exact, ok) =>
      assert(n === 5000L)
      val want = sorted((((q * n + 999) / 1000) - 1).toInt)
      assert(exact === want, s"exact quantile at $q")
      assert(ok && exact >= lo && exact <= hi, s"bound at $q")
      // relative width respects 2^-s
      assert(hi - lo <= math.max(lo >> 4, 0), s"width at $q")
    }
  }

  test("groupedQuantiles: per-group bounds contain each exact quantile") {
    val rows = (1L to 6000L).map(i =>
      (s"g${i % 3}", (i * i) % 999983L + 1L))
    val got = qsketch.groupedQuantiles(rows.toDF("g", "v"), "g", "v",
        s = 4, permilles = Seq(100, 500, 900))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length === 9)
    val byG = rows.groupBy(_._1).map { case (g, vs) =>
      (g, vs.map(_._2).sorted) }
    got.foreach { case (g, q, n, lo, hi) =>
      val sorted = byG(g)
      assert(n === sorted.length.toLong, s"n for $g")
      val exact = sorted((((q * n + 999) / 1000) - 1).toInt)
      assert(exact >= lo && exact <= hi, s"bound at ($g, $q)")
      assert(hi - lo <= math.max(lo >> 4, 0), s"width at ($g, $q)")
    }
  }

  test("equiDepthBins: equal-depth up to the sketch bound, exhaustive") {
    val vals = (1L to 4000L).map(i => (i * i) % 999983L + 1L)
    val bins = qsketch.equiDepthBins(vals.toDF("v"), "v", s = 5,
        nBins = 4)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect()
    // every value assigned, bins contiguous 0..3
    assert(bins.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(bins.map(_._2).sum === 4000L)
    // bins ordered and non-overlapping in value space
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"bin ${a._1} max >= bin ${b._1} min") }
    // reference: same boundaries from the Scala bucket math
    val sorted = vals.sorted
    val n = sorted.length.toLong
    def estHi(qp: Long): Long = {
      // bucket holding the target rank, by cumulating Scala-side buckets
      val byLo = vals.groupBy(loOf(_, 5)).map { case (lo, g) =>
        (lo, g.size.toLong) }.toSeq.sortBy(_._1)
      val target = (qp * n + 999) / 1000
      var cum = 0L
      val lo = byLo.find { case (_, c) => cum += c; cum >= target }.get._1
      val e = 63 - java.lang.Long.numberOfLeadingZeros(math.max(lo, 1L))
      lo + (1L << math.max(e - 5, 0)) - 1
    }
    val bounds = Seq(250L, 500L, 750L).map(estHi).sorted
    val wantCnt = (0 to 3).map(b => vals.count(v =>
      bounds.count(v > _) == b).toLong)
    assert(bins.map(_._2).toSeq === wantCnt)
  }

  test("winsorize clips both tails at the sketch bounds, integer-exact") {
    val vals = (1L to 3000L).map(i => (i * 7) % 100003L + 1L)
    val Array((n, lo, hi, nLo, nHi, s)) =
      qsketch.winsorize(vals.toDF("v"), "v", s = 5, loPermille = 50,
          hiPermille = 950)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(n === 3000L)
    assert(lo < hi)
    assert(nLo === vals.count(_ < lo).toLong)
    assert(nHi === vals.count(_ > hi).toLong)
    assert(s === vals.map(v => math.max(math.min(v, hi), lo)).sum)
    // the true 5%/95% quantiles are inside the clip bounds' buckets:
    // nothing clipped below the 5th permille-bucket floor
    val sorted = vals.sorted
    val p50 = sorted(((50L * n + 999) / 1000 - 1).toInt)
    val p950 = sorted(((950L * n + 999) / 1000 - 1).toInt)
    assert(lo <= p50 && hi >= p950)
  }

  test("merged shard sketches equal the directly-built sketch") {
    val vals = (1L to 2000L).map(i => (i * 31) % 4999L + 1L)
    val df = vals.toDF("v")
    val direct = qsketch.build(df, "v", s = 5)
      .orderBy("bkt_lo")
      .as[(Long, Long, Long)].collect().toSeq
    val shards = vals.zipWithIndex.groupBy(_._2 % 3)
      .values.map(g => qsketch.build(g.map(_._1).toDF("v"), "v", s = 5))
    val merged = shards.reduce(_ unionByName _)
      .groupBy("bkt_lo", "bkt_hi").agg(sum(col("cnt")).as("cnt"))
      .orderBy("bkt_lo")
      .as[(Long, Long, Long)].collect().toSeq
    assert(merged === direct)
  }
}
