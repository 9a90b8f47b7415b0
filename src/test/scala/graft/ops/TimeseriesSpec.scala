package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gap filling: the densified series must cover every key's span with no
  * holes, keep observed rows untouched, and fill absent days with the
  * configured defaults. */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private val daily = Seq(
    (1L, Date.valueOf("2024-01-01"), 3L, 1.5),
    (1L, Date.valueOf("2024-01-04"), 1L, 2.0),  // 2 missing days before
    (2L, Date.valueOf("2024-02-10"), 5L, 0.5)   // single-day span
  ).toDF("user_id", "day", "cnt", "sum_value")

  test("fills every missing day inside each key's span with defaults") {
    val filled = timeseries.fillDailyGaps(daily, "user_id", "day",
      Seq("cnt" -> lit(0L), "sum_value" -> lit(0.0)))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3)))
      .toSet

    assert(filled === Set(
      (1L, "2024-01-01", 3L, 1.5),
      (1L, "2024-01-02", 0L, 0.0),
      (1L, "2024-01-03", 0L, 0.0),
      (1L, "2024-01-04", 1L, 2.0),
      (2L, "2024-02-10", 5L, 0.5)))
  }

  test("densified events series has one row per day per user span") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val filled = timeseries.fillDailyGaps(ev, "user_id", "day",
      Seq("cnt" -> lit(0L)))
    // per user: row count == span length, days distinct
    val bad = filled.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("day")).as("nd"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
      .filter(col("n") =!= col("span") || col("nd") =!= col("span"))
    assert(bad.count() === 0)
    // observed totals unchanged by the fill
    assert(filled.agg(sum("cnt")).head().getLong(0) ===
      ev.agg(sum("cnt")).head().getLong(0))
  }

  test("linear interpolation: interior = straight line, edges = nearest") {
    val series = Seq(
      (1L, Date.valueOf("2024-01-01"), Some(10.0)),
      (1L, Date.valueOf("2024-01-02"), None), // 10 → 16 over 3 days: 12
      (1L, Date.valueOf("2024-01-03"), None), //                      14
      (1L, Date.valueOf("2024-01-04"), Some(16.0)),
      (2L, Date.valueOf("2024-02-01"), None), // leading: backfill 5
      (2L, Date.valueOf("2024-02-02"), Some(5.0)),
      (2L, Date.valueOf("2024-02-03"), None)  // trailing: ffill 5
    ).toDF("user_id", "day", "v")
    val got = timeseries.interpolateLinear(series, "user_id", "day", "v")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
      .toSet
    assert(got === Set(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 12.0),
      (1L, "2024-01-03", 14.0), (1L, "2024-01-04", 16.0),
      (2L, "2024-02-01", 5.0), (2L, "2024-02-02", 5.0),
      (2L, "2024-02-03", 5.0)))
  }

  test("decayedSum halves a value per halflife, exact at snap points") {
    val ts0 = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2026-01-09 00:00:00") // 1 hl
    val ts2 = java.sql.Timestamp.valueOf("2026-01-08 00:00:00") // 2 hl
    val df = Seq(("u1", ts0, 100.0), ("u1", ts1, 100.0),
      ("u2", ts2, 100.0)).toDF("user_id", "ts", "value")
    val got = timeseries.decayedSum(df, "user_id", "ts", "value", 86400L)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    // u1: 100·1 + 100·0.5 = 150; u2: 100·0.25 = 25
    assert(got === Seq(("u1", 2L, 150.0), ("u2", 1L, 25.0)))
  }

  test("decayedSum is partitioning-independent (integer products)") {
    val base = java.time.Instant.parse("2026-01-10T00:00:00Z")
    val rows = (0 until 500).map(i => ("u" + i % 7,
      java.sql.Timestamp.from(base.minusSeconds(i * 977L)),
      (i % 89) / 7.0))
    val a = timeseries.decayedSum(rows.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", 3600L)
      .as[(String, Long, Double)].collect().toSet
    val b = timeseries.decayedSum(
      rows.toDF("user_id", "ts", "value").repartition(13),
      "user_id", "ts", "value", 3600L)
      .as[(String, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("interpolate survives a null row sharing its day with values") {
    import java.sql.Date
    val rows = Seq(
      ("k", Date.valueOf("2024-01-05"), Some(1.0)),
      ("k", Date.valueOf("2024-01-05"), Option.empty[Double]),
      ("k", Date.valueOf("2024-01-05"), Some(2.0))
    ).toDF("key", "day", "v")
    // prevD = nextD makes the slope 0/0 - the guard takes the day's
    // observed value instead of an ANSI DIVIDE_BY_ZERO abort
    val got = timeseries.interpolateLinear(rows, "key", "day", "v")
      .select("v").as[Option[Double]].collect()
    assert(got.length === 3)
    assert(!got.contains(None))
  }

  test("timeWeightedAvg: hand-computed TWAP, inverted spans dropped") {
    val base = 1700000000L
    val rows = Seq(
      // key x: 10.00 for 100 s, 20.00 for 300 s →
      //        (1000·100 + 2000·300) / 400 = 1750 cents
      ("x", base, base + 100, 10.00),
      ("x", base + 100, base + 400, 20.00),
      // key y: single interval → its own price
      ("y", base, base + 50, 7.77),
      // inverted + empty spans carry no time mass
      ("y", base + 99, base + 99, 99.99),
      ("y", base + 99, base + 9, 99.99))
      .toDF("k", "s0", "e0", "price")
      .select(col("k"), col("s0").cast("timestamp").as("s"),
        col("e0").cast("timestamp").as("e"), col("price"))
    val got = timeseries.timeWeightedAvg(rows, "k", "s", "e", "price")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      "x" -> (2L, 400L, 1750L),
      "y" -> (1L, 50L, 777L)))
  }

  test("timeWeightedAvg is partitioning-independent (integer products)") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map { i =>
      val s = 1700000000L + rnd.nextInt(100000)
      (s"k${i % 3}", s, s + 1 + rnd.nextInt(500000),
        rnd.nextInt(1000000) / 100.0)
    }.toDF("k", "s0", "e0", "price")
      .select(col("k"), col("s0").cast("timestamp").as("s"),
        col("e0").cast("timestamp").as("e"), col("price"))
    def run(df: org.apache.spark.sql.DataFrame) =
      timeseries.timeWeightedAvg(df, "k", "s", "e", "price")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(run(rows.repartition(1)) === run(rows.repartition(13)))
  }

  test("ohlcBars picks open/close by (ts, tie) inside each bar") {
    val base = 1700006400L // a bar boundary for 3600-s bars
    val ticks = Seq(
      // key "a", bar 0: ticks at +10(id2)=5.0, +10(id1)=3.0, +200=9.0
      ("a", base + 10, 2L, 5.0),
      ("a", base + 10, 1L, 3.0),   // same ts, lower id → the true open
      ("a", base + 200, 3L, 9.0),
      // key "a", bar 1: single tick
      ("a", base + 3700, 4L, 7.0),
      // key "b", bar 0
      ("b", base + 50, 5L, 2.0))
      .toDF("k", "epoch", "id", "v")
      .select(col("k"), col("epoch").cast("timestamp").as("ts"),
        col("id"), col("v"))
    val got = timeseries.ohlcBars(ticks, "k", "ts", "v", "id", 3600L)
      .select(col("k"), unix_timestamp(col("bar_start")).as("b"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_ticks"), col("volume").cast("double"))
      .as[(String, Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    assert(got === Set(
      ("a", base, 3.0, 9.0, 3.0, 9.0, 3L, 17.0),
      ("a", base + 3600, 7.0, 7.0, 7.0, 7.0, 1L, 7.0),
      ("b", base, 2.0, 2.0, 2.0, 2.0, 1L, 2.0)))
  }

  test("transitionMatrix counts per-key consecutive steps") {
    // user 1: a→b→a→b ; user 2: b→b→c ; user 3 single event (no step)
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, "b"),
      (2L, 10L, 5L, "b"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "c"),
      (3L, 10L, 8L, "z"))
      .toDF("u", "epoch", "id", "typ")
      .select(col("u"), col("epoch").cast("timestamp").as("ts"),
        col("id"), col("typ"))
    val got = timeseries.transitionMatrix(ev, "u", "ts", "typ", "id")
      .as[(String, String, Long, Long)].collect().toSet
    // from a: 2×a→b (p=1); from b: b→a 1, b→b 1, b→c 1 (p=1/3 each)
    assert(got === Set(
      ("a", "b", 2L, 1000000L),
      ("b", "a", 1L, 333333L),
      ("b", "b", 1L, 333333L),
      ("b", "c", 1L, 333333L)))
  }

  test("cusumChangepoints peaks exactly at a planted level shift") {
    // user 1: eight 10.00s then eight 20.00s — |CUSUM| peaks at k=8;
    // user 2: constant series — every n·Cₖ is 0, nothing flagged
    val rows =
      (1 to 8).map(i => (1L, i.toLong, i.toLong, 10.0)) ++
      (9 to 16).map(i => (1L, i.toLong, i.toLong, 20.0)) ++
      (1 to 5).map(i => (2L, i.toLong, 100L + i, 7.0))
    val ev = rows.toDF("u", "epoch", "id", "v")
      .select(col("u"), col("epoch").cast("timestamp").as("ts"),
        col("id"), col("v"))
    val got = timeseries.cusumChangepoints(ev, "u", "ts", "id", "v",
        hotFrac10 = 10)  // flag only the exact peak
      .as[(Long, Long, Long, Long, Long)].collect()
    // peak: k=8, prefix=8000c, n=16, S=24000c → n·C = 16·8000−8·24000
    // = −64000 → C = −4000c = −40.00 → −40 000 000 micro-dollars
    assert(got.toSeq === Seq((1L, 8L, 8L, 1000L, -40000000L)))
  }

  test("cusum flags match the naive per-row definition") {
    val rnd = new scala.util.Random(7)
    val rows = for (u <- 1L to 5L; k <- 1L to 20L)
      yield (u, k, u * 100 + k, math.round(rnd.nextDouble() * 1e4) / 1e2)
    val ev = rows.toDF("u", "epoch", "id", "v")
      .select(col("u"), col("epoch").cast("timestamp").as("ts"),
        col("id"), col("v"))
    val got = timeseries.cusumChangepoints(ev, "u", "ts", "id", "v", 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val vs = g.sortBy(_._2).map(r => math.round(r._4 * 100))
      val n = vs.size.toLong
      val s = vs.sum
      val ncs = vs.inits.toSeq.reverse.tail.zipWithIndex.map {
        case (pre, i) => (i + 1L, n * pre.sum - (i + 1) * s)
      }
      val peak = ncs.map(x => math.abs(x._2)).max
      if (peak == 0) Seq.empty
      else ncs.filter(x => math.abs(x._2) * 10 >= peak * 8).map {
        case (k, nc) =>
          (u, g.sortBy(_._2).apply(k.toInt - 1)._3, k,
            vs(k.toInt - 1), floorDiv0(nc * 10000L, n))
      }
    }.toSet
    assert(got === want)
  }

  // Spark's `div` truncates toward zero (matches DuckDB `//`)
  private def floorDiv0(a: Long, b: Long): Long = a / b

  test("seasonalProfile: exact cell means and worst residual, tie → min id") {
    // cell (t, hour 0): values 1.00, 2.00, 4.00 → mean 7/3, worst
    // residual 4.00 (rn = 400·3 − 700 = +500); cell (t, hour 1):
    // symmetric ±3.00 around 5.00 — tie on |rn|, min id wins
    val base = 1700000000L  // hour boundary-aligned epoch
    val h0 = base - base % 86400
    val ev = Seq(
      ("t", h0 + 10, 1L, 1.0), ("t", h0 + 20, 2L, 2.0),
      ("t", h0 + 30, 3L, 4.0),
      ("t", h0 + 3600, 4L, 2.0), ("t", h0 + 3601, 5L, 8.0),
      ("t", h0 + 3602, 6L, 5.0))
      .toDF("typ", "epoch", "id", "v")
      .select(col("typ"), col("epoch").cast("timestamp").as("ts"),
        col("id"), col("v"))
    val got = timeseries.seasonalProfile(ev, "typ", "ts", "id", "v")
      .as[(String, Int, Long, Long, Long, Long)].collect().toSet
    // h0: n=3, S=700c → mean 233.33c = 2 333 333 µ$; rn(4.00)=500c →
    //   res 500/3 c = 1 666 666 µ$
    // h1: n=3, S=1500c → mean 5 000 000 µ$; |rn|=900 twice → id 4,
    //   rn=−900 → res −3 000 000 µ$
    assert(got === Set(
      ("t", 0, 3L, 2333333L, 3L, 1666666L),
      ("t", 1, 3L, 5000000L, 4L, -3000000L)))
  }
}
