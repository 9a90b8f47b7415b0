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
