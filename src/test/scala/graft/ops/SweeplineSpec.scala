package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SweeplineSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random intervals across 3 keys, many buckets
  private def intervals(n: Int) = (1 to n).map { i =>
    val key = s"k${i % 3}"
    val start = 1700000000L + (i * 7919L) % (90L * 86400)
    val len = 3600L + (i * 104729L) % (20L * 86400)
    (key, new Timestamp(start * 1000), new Timestamp((start + len) * 1000))
  }.toDF("key", "s", "e")

  /** naive reference: per key, scan boundaries in ts order on the driver */
  private def naivePeaks(rows: Seq[(String, Long, Long)])
  : Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (k, ivs) =>
      val deltas = (ivs.map(iv => (iv._2, 1L)) ++ ivs.map(iv => (iv._3, -1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var run = 0L
      var peak = Long.MinValue
      var peakTs = 0L
      deltas.foreach { case (ts, d) =>
        run += d
        if (run > peak) { peak = run; peakTs = ts }
      }
      k -> (peak, peakTs)
    }

  test("peakConcurrency ≡ driver-side sweep, bucket-width independent") {
    val df = intervals(400)
    val raw = df.as[(String, Timestamp, Timestamp)].collect().toSeq
      .map(r => (r._1, r._2.getTime / 1000, r._3.getTime / 1000))
    val want = naivePeaks(raw)

    for (bucket <- Seq(86400L, 13L * 86400, 365L * 86400)) {
      val got = sweepline.peakConcurrency(df, "key", "s", "e", bucket)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getTimestamp(2).getTime / 1000)).toMap
      assert(got === want, s"bucket=$bucket")
    }
  }

  test("running concurrency counts exact overlaps at a probe instant") {
    val df = intervals(400)
    // number open at instant t == running value at the last boundary <= t
    val probe = 1700000000L + 40L * 86400
    val run = sweepline.concurrency(df, "key", "s", "e", 86400L)
      .filter(col("ts").cast("long") <= probe)
      .groupBy("key")
      .agg(max(struct(col("ts"), col("running"))).as("m"))
      .select(col("key"), col("m.running"))
      .as[(String, Long)].collect().toMap
    val brute = df.filter(col("s").cast("long") <= probe &&
        col("e").cast("long") > probe)
      .groupBy("key").count()
      .as[(String, Long)].collect().toMap
    for ((k, n) <- brute) assert(run(k) === n, k)
    assert(brute.values.sum > 0)
  }

  test("ends meeting starts at the same instant cancel (half-open)") {
    // [0, 100) then [100, 200): at ts=100 exactly one is open
    val df = Seq(
      ("k", new Timestamp(100000L * 1000), new Timestamp(100100L * 1000)),
      ("k", new Timestamp(100100L * 1000), new Timestamp(100200L * 1000)))
      .toDF("key", "s", "e")
    val rows = sweepline.concurrency(df, "key", "s", "e", 60L)
      .orderBy("ts").as[(String, Timestamp, Long)].collect()
    assert(rows.map(_._3).toSeq === Seq(1L, 1L, 0L))
    val peak = sweepline.peakConcurrency(df, "key", "s", "e", 60L)
      .as[(String, Long, Timestamp)].collect().head
    assert(peak._2 === 1L)
    assert(peak._3.getTime === 100000L * 1000) // earliest instant at peak
  }

  test("peak tie within one second resolves to the earliest microsecond") {
    // two disjoint intervals, both reaching the peak (1), starting
    // 200µs and 700µs into the same second — a seconds-granular
    // tie-break would report the later start
    def us(micros: Long) = {
      val t = new Timestamp(micros / 1000)
      t.setNanos((micros % 1000000).toInt * 1000)
      t
    }
    val base = 100000L * 1000000
    val df = Seq(
      ("k", us(base + 200), us(base + 400)),
      ("k", us(base + 700), us(base + 900)))
      .toDF("key", "s", "e")
    val peak = sweepline.peakConcurrency(df, "key", "s", "e", 60L)
      .as[(String, Long, Timestamp)].collect().head
    assert(peak._2 === 1L)
    assert(peak._3 === us(base + 200))
  }

  test("property: random interval sets ≡ driver sweep, random buckets") {
    // plain-scalacheck sampling loop, same idiom as WindowsSpec (the
    // scalatestplus bridge isn't on the offline classpath)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genIntervals: Gen[List[(String, Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b")
        s <- Gen.choose(1700000000L, 1700000000L + 30L * 86400)
        len <- Gen.choose(1L, 5L * 86400)
      } yield (k, s, s + len))
    } yield rows
    val genBucket = Gen.oneOf(3600L, 86400L, 7L * 86400, 365L * 86400)
    (0 until 12).foreach { i =>
      val sample = (for {
        ivsList <- genIntervals
        bucket <- genBucket
      } yield (ivsList, bucket))
        .apply(Gen.Parameters.default, Seed(i.toLong))
      sample.foreach { case (rows, bucket) =>
        val df = rows.map { case (k, s, e) =>
          (k, new Timestamp(s * 1000), new Timestamp(e * 1000))
        }.toDF("key", "s", "e")
        val got = sweepline.peakConcurrency(df, "key", "s", "e", bucket)
          .collect()
          .map(r => r.getString(0) ->
            (r.getLong(1), r.getTimestamp(2).getTime / 1000)).toMap
        assert(got === naivePeaks(rows), s"seed=$i bucket=$bucket")
      }
    }
  }

  test("no single-partition window: inner sort is keyed by (key, bucket)") {
    val df = intervals(50)
    val plan = sweepline.concurrency(df, "key", "s", "e", 86400L)
      .queryExecution.optimizedPlan.toString
    // the per-boundary running sum must be partitioned by bucket too,
    // never by the bare key (that would serialize a key's whole stream):
    // every ts-ordered window spec in the plan carries __bucket in its
    // partition clause
    val tsOrderedSpecs = plan.split("windowspecdefinition\\(").drop(1)
      .map(_.take(120)).filter(_.contains("ts#"))
    assert(tsOrderedSpecs.nonEmpty, plan)
    assert(tsOrderedSpecs.forall(_.contains("__bucket")), plan)
  }
}
