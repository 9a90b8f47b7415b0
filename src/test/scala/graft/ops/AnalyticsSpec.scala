package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel ordering semantics, cohort grid totals, and SCD2 interval
  * integrity on hand-crafted histories where the expected output is
  * checkable by eye. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel requires strict stage order, not mere presence") {
    val ev = Seq(
      // u1 completes the full funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2 clicked BEFORE first view: click doesn't count
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 11:00:00")),
      // u3 views only
      (3L, "view", ts("2024-01-01 10:00:00")),
      // u4 purchases with no view at all
      (4L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")

    val got = analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set((0, "view", 3L), (1, "click", 1L),
      (2, "purchase", 1L)))
  }

  test("funnel uses first-touch anchors: later events cannot resurrect") {
    // u1's only click precedes the FIRST view even though a later view
    // exists before nothing — first-touch means the funnel anchors at
    // min(view ts), so the click at 09:30 (after view@09:00) counts
    val ev = Seq(
      (1L, "view", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 09:30:00")),
      (1L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("view", 1L), ("click", 1L)))
  }

  test("funnel supports repeated stage names (re-engagement)") {
    val ev = Seq(
      // u1: view → click → view again — completes view,click,view
      (1L, "view", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 11:00:00")),
      // u2: view → click, never views again — stops at stage 1
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      // u3: single view — its one event cannot fill two view slots
      (3L, "view", ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "view"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(got === Set((0, 3L), (1, 2L), (2, 1L)))
  }

  test("funnel reads the events table exactly once") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val got = analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    // the single-scan contract: one source leaf in the plan, where the
    // per-stage join form had one scan per stage
    val leaves = got.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size === 1, s"expected 1 scan, got:\n$leaves")
    // and it still funnels monotonically on real data
    val rows = got.collect().map(r => (r.getInt(0), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === rows.indices.toSeq)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.reverse.toSeq,
      "stage counts must be non-increasing")
  }

  test("scd2 handles null attribute values as real interval states") {
    val h = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L, Some("A")),
      (1L, ts("2024-01-02 00:00:00"), 101L, Option.empty[String]),
      (1L, ts("2024-01-03 00:00:00"), 102L, Option.empty[String]),
      (1L, ts("2024-01-04 00:00:00"), 103L, Some("A"))
    ).toDF("k", "t", "seq", "attr")
    val got = analytics.scd2Intervals(h, "k", "t",
      Seq(col("t"), col("seq")), "attr")
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(2), r.isNullAt(3)))
    // three intervals: A (to day2), the null RUN (one interval, to
    // day4), A again (current) - a value->null change must not vanish
    // and a null run must not split per row
    assert(got.length === 3, got.mkString(","))
    assert(got.count(_._1 == null) === 1)
  }

  test("robust outliers: a MAD=0 group yields no flags, not a crash") {
    val df = Seq(
      ("g", 10.0, 1L), ("g", 10.0, 2L), ("g", 10.0, 3L),
      ("g", 10.0, 4L), ("g", 500.0, 5L),
      // a healthy group so the scan has normal work too
      ("h", 1.0, 6L), ("h", 2.0, 7L), ("h", 3.0, 8L)
    ).toDF("grp", "v", "id")
    val got = analytics.robustOutliers(df, "grp", "v", Seq("id"))
      .collect()
    assert(got.isEmpty) // degenerate group skipped; h has no outliers
  }

  test("groupTrend ignores null x/y rows instead of skewing the fit") {
    val df = Seq(
      ("k", Some(0L), Some(1.0)),
      ("k", Some(1L), Some(3.0)),
      ("k", Some(2L), Option.empty[Double]),
      ("k", Option.empty[Long], Some(9.0))
    ).toDF("key", "x", "y")
    val got = analytics.groupTrend(df, "key", col("x"), col("y"))
      .collect().head
    // only the 2 observed pairs fit: slope 2, intercept 1, n = 2
    assert(got.getLong(1) === 2L)
    assert(math.abs(got.getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(got.getDouble(3) - 1.0) < 1e-9)
  }

  test("cohort grid: every user lands in offset 0; totals reconcile") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
    val grid = analytics.cohortRetention(ev, "user_id", "ts")
    val nUsers = ev.select("user_id").distinct().count()
    // offset-0 cells sum to the distinct-user count (each user is
    // active on their own cohort day by definition)
    val day0 = grid.filter(col("day_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    assert(day0 === nUsers)
    assert(grid.filter(col("day_offset") < 0).count() === 0)
  }

  test("SCD2 intervals: chain per key, collapse runs, one current row") {
    val h = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 101L, "A"), // same run, collapsed
      (1L, ts("2024-01-03 00:00:00"), 102L, "B"),
      (1L, ts("2024-01-04 00:00:00"), 103L, "A"), // A again = NEW interval
      (2L, ts("2024-01-01 00:00:00"), 200L, "X")
    ).toDF("k", "t", "seq", "attr")
    val got = analytics.scd2Intervals(h, "k", "t",
      Seq(col("t"), col("seq")), "attr")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
      .toSet
    assert(got === Set(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (1L, "A", ts("2024-01-04 00:00:00"), None, true),
      (2L, "X", ts("2024-01-01 00:00:00"), None, true)))
  }

  test("SCD2 on orders: intervals tile each customer's history") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.t(spark, dir, "orders")
    val iv = analytics.scd2Intervals(orders, "o_custkey", "o_orderdate",
      Seq(col("o_orderdate"), col("o_orderkey")), "o_orderpriority")
    // exactly one open (current) interval per customer
    val bad = iv.groupBy("o_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1)
    assert(bad.count() === 0)
    // intervals are properly ordered: valid_from < valid_to when closed
    assert(iv.filter(col("valid_to").isNotNull &&
      col("valid_from") > col("valid_to")).count() === 0)
  }

  test("robustOutliers flags spikes the median/MAD screen should catch") {
    // group a: tight cluster around 10 plus two gross spikes; group b:
    // same shape scaled ×100 — per-group scaling must flag b's spike
    // relative to b's own spread, not a's
    val rows =
      (1L to 20L).map(i => ("a", 10.0 + (i % 5) * 0.1, i)) ++
      Seq(("a", 500.0, 98L), ("a", -480.0, 99L)) ++
      (1L to 20L).map(i => ("b", 1000.0 + (i % 5) * 10.0, 100 + i)) ++
      Seq(("b", 50000.0, 198L))
    val df = rows.toDF("grp", "v", "id")

    val got = analytics.robustOutliers(df, "grp", "v", Seq("id"),
      zThresh = 3.5)
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids === Set(98L, 99L, 198L))
    // z carries sign: the low spike is negative
    val z99 = got.filter(col("id") === 99L)
      .select("robust_z").as[Double].head()
    assert(z99 < -3.5)
    // and an inlier-only group yields nothing
    val calm = (1L to 10L).map(i => ("c", 5.0 + (i % 3) * 0.2, 200 + i))
      .toDF("grp", "v", "id")
    assert(analytics.robustOutliers(calm, "grp", "v", Seq("id")).count()
      === 0)
  }

  test("groupTrend recovers an exact line and nulls degenerate groups") {
    // g1: y = 2x + 3 exactly; g2: noisy around slope 0; g3: single x
    val rows = (0 to 10).map(x => ("g1", x, 2.0 * x + 3.0)) ++
      Seq(("g2", 0, 1.0), ("g2", 1, -1.0), ("g2", 2, 1.0),
        ("g2", 3, -1.0)) ++
      Seq(("g3", 5, 9.0), ("g3", 5, 11.0))
    val got = analytics.groupTrend(rows.toDF("k", "x", "y"), "k",
      col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("g1") === ((11L, Some(2.0), Some(3.0))))
    assert(math.abs(got("g2")._2.get - -0.4) < 1e-9)
    // all x equal: denominator 0 -> null fit, not infinity
    assert(got("g3") === ((2L, None, None)))
  }

  test("giniConcentration: 0 when even, (n-1)/n when one group owns all") {
    val even = Seq(("a", 100L), ("b", 100L), ("c", 100L), ("d", 100L))
    assert(analytics.giniConcentration(even.toDF("k", "w"), "k", "w")
      .select("gini").as[Double].head() === 0.0)
    val solo = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 400L))
    assert(analytics.giniConcentration(solo.toDF("k", "w"), "k", "w")
      .select("gini").as[Double].head() === 0.75)
    val empty = Seq.empty[(String, Long)].toDF("k", "w")
    assert(analytics.giniConcentration(empty, "k", "w")
      .select("gini").as[Option[Double]].head().isEmpty)
  }

  test("giniConcentration ranks via a range exchange, never one task") {
    val weights = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "w")
    val q = analytics.giniConcentration(weights, "k", "w")
    // the rank must come from the two-level prefix-sum rewrite (the
    // in-partition window keyed by spark_partition_id over the staged
    // range-partitioned frame — the range exchange itself runs inside
    // the stage job, before the plan string), and the logical plan must
    // contain NO unpartitioned window (the single-task funnel this
    // operator used to have for its global row_number)
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("windowspecdefinition(__pid"), phys.take(3000))
    val globalWindows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty)
  }

  test("chiSquare is zero on an exactly independent table") {
    // margins 6/3 × 6/3 over n=9: every E equals its O
    val rows = Seq.fill(4)(("a1", "b1")) ++ Seq.fill(2)(("a1", "b2")) ++
      Seq.fill(2)(("a2", "b1")) ++ Seq(("a2", "b2"))
    val got = analytics.chiSquare(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].head()
    assert(got === ((0L, 1L, 9L)))
  }

  test("chiSquare materializes observed-zero cells") {
    // perfectly dependent diagonal: every cell's E=1.5, χ² = 4·1.5 = 6
    // — the two zero cells contribute half of it
    val rows = Seq.fill(3)(("a1", "b1")) ++ Seq.fill(3)(("a2", "b2"))
    val got = analytics.chiSquare(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].head()
    assert(got === ((6000000L, 1L, 6L)))
  }

  test("chiSquare matches a driver replica on a random table") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map(_ =>
      (s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(5)}"))
    val o = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val as = rows.map(_._1).distinct.sorted
    val bs = rows.map(_._2).distinct.sorted
    val rt = as.map(a => a -> rows.count(_._1 == a).toLong).toMap
    val ct = bs.map(b => b -> rows.count(_._2 == b).toLong).toMap
    val n = rows.size.toLong
    val want = as.flatMap(a => bs.map { b =>
      val e = rt(a) * ct(b) * 1.0 / n
      val d = o.getOrElse((a, b), 0L) - e
      math.round(d * d / e * 1000000)
    }).sum
    val got = analytics.chiSquare(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].head()
    assert(got === ((want, (as.size - 1L) * (bs.size - 1L), n)))
  }

  test("trimmedMean equals naive sort-and-drop, exact under ties") {
    val rnd = new scala.util.Random(19)
    for (n <- Seq(3, 10, 47, 200)) {
      val vals = (1 to n).map(_ => rnd.nextInt(12).toLong - 3)
      val df = vals.map(("g", _)).toDF("grp", "v")
      val got = analytics.trimmedMean(df, "grp", "v", trimPct = 10)
        .as[(String, Long, Long)].head()
      val sorted = vals.sorted
      val klo = n * 10 / 100
      val kept = sorted.slice(klo, n - klo)
      val want = ("g", kept.size.toLong,
        kept.sum * 1000000L / kept.size)
      assert(got === want, s"n=$n")
    }
  }

  test("trimmedMean at 0% is the plain mean") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 6L)).toDF("grp", "v")
    val got = analytics.trimmedMean(df, "grp", "v", 0)
      .as[(String, Long, Long)].head()
    assert(got === (("g", 3L, 3000000L)))
  }

  test("skyline2 equals the naive dominance filter on random points") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(id =>
      (id, rnd.nextInt(12), rnd.nextInt(40).toLong))
    val naive = pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= px && qy <= py && (qx < px || qy < py)
      }
    }.toSet
    val got = analytics.skyline2(pts.toDF("id", "x", "y"), "x", "y")
      .select("id", "x", "y")
      .as[(Long, Int, Long)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("skyline2 co-keeps duplicate points and an all-duplicates input") {
    val dup = Seq((1L, 3, 5L), (2L, 3, 5L), (3L, 3, 5L))
    val got = analytics.skyline2(dup.toDF("id", "x", "y"), "x", "y")
      .select("id", "x", "y")
      .as[(Long, Int, Long)].collect().toSet
    assert(got === dup.toSet)
  }

  test("randomizedResponse reproduces the hand-modeled mechanism") {
    def draw(salt: String, id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % 1000000L
    }
    val f = 250000L
    val rows = (0L until 400L).map(i => (i % 4, i, i % 3 == 0))
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val obs = rs.map { case (_, id, bit) =>
        if (draw("rr_flip", id) < f) {
          if (draw("rr_coin", id) < 500000L) 1L else 0L
        } else if (bit) 1L else 0L
      }.sum
      val n = rs.size.toLong
      val est = (obs * 2000000L - f * n) * 1000L / (2L * (1000000L - f))
      (g, n, obs, est, rs.count(_._3).toLong)
    }.toSeq.sortBy(_._1)
    val got = analytics.randomizedResponse(
        rows.toDF("g", "id", "bit"), "g", "id", col("bit"), f)
      .orderBy("g")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // debiased estimate lands near the truth (the accuracy story)
    got.foreach { case (_, n, _, est, t) =>
      assert(math.abs(est / 1000.0 - t) <= n * 0.2, s"estimator drift")
    }
  }

  test("targetEncoding excludes exactly the row's own fold") {
    def fold(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"te|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % 3
    }
    val rows = (0L until 90L).map(i => (if (i < 60) "x" else "y", i,
      i * 10 + 7))
    val want = rows.groupBy(r => (r._1, fold(r._2))).map {
      case ((cat, f), in) =>
        val all = rows.filter(_._1 == cat)
        val out = all.filterNot(r => fold(r._2) == f)
        (cat, f, in.size.toLong,
          if (out.isEmpty) None
          else Some(out.map(_._3).sum * 1000000L / out.size))
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = analytics.targetEncoding(rows.toDF("cat", "id", "y"),
        "cat", "id", col("y"), nFolds = 3)
      .orderBy("cat", "fold")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got === want)
  }

  test("targetEncoding single-fold category encodes as null") {
    // one row -> its fold holds the whole category: nothing out-of-fold
    val df = Seq(("solo", 1L, 100L), ("big", 2L, 10L), ("big", 3L, 20L),
      ("big", 4L, 30L), ("big", 5L, 40L), ("big", 6L, 50L))
      .toDF("cat", "id", "y")
    val solo = analytics.targetEncoding(df, "cat", "id", col("y"), 5)
      .filter(col("cat") === "solo")
      .select("enc_micro").as[Option[Long]].collect()
    assert(solo.toSeq === Seq(None))
  }

  /** Brute-force two-sample KS in exact rationals (numerator units). */
  private def bruteKsMicro(a: Seq[Long], b: Seq[Long]): Long = {
    val xs = (a ++ b).distinct.sorted
    val dmax = xs.map { x =>
      (BigInt(a.count(_ <= x)) * b.size -
        BigInt(b.count(_ <= x)) * a.size).abs
    }.max
    (dmax * 1000000 / (BigInt(a.size) * b.size)).toLong
  }

  test("ksDrift ≡ brute-force KS statistic at jump points") {
    val a = Seq(1L, 2L, 2L, 3L, 7L, 9L, 12L, 15L)
    val b = Seq(2L, 5L, 6L, 7L, 7L, 20L)
    val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
    val Array((n1, n2, d)) = analytics.ksDrift(df, col("isa"), "v")
      .as[(Long, Long, Long)].collect()
    assert(n1 === a.size.toLong && n2 === b.size.toLong)
    assert(d === bruteKsMicro(a, b))
  }

  test("ksDrift: identical samples 0, disjoint samples 1, fuzz") {
    val same = Seq(3L, 5L, 5L, 9L)
    val dfSame = (same.map((_, true)) ++ same.map((_, false)))
      .toDF("v", "isa")
    assert(analytics.ksDrift(dfSame, col("isa"), "v")
      .select("d_micro").as[Long].head() === 0L)
    val dfDisj = (Seq(1L, 2L).map((_, true)) ++
      Seq(10L, 11L).map((_, false))).toDF("v", "isa")
    assert(analytics.ksDrift(dfDisj, col("isa"), "v")
      .select("d_micro").as[Long].head() === 1000000L)
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val a = Seq.fill(5 + rnd.nextInt(40))(rnd.nextInt(30).toLong)
      val b = Seq.fill(5 + rnd.nextInt(40))(rnd.nextInt(30).toLong)
      val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
      assert(analytics.ksDrift(df, col("isa"), "v")
        .select("d_micro").as[Long].head() === bruteKsMicro(a, b))
    }
  }

  /** Brute-force 1-D Wasserstein in exact rationals (micro units). */
  private def bruteEmdMicro(a: Seq[Long], b: Seq[Long]): Long = {
    val xs = (a ++ b).distinct.sorted
    val w = xs.zip(xs.tail).map { case (x, xn) =>
      (BigInt(a.count(_ <= x)) * b.size -
        BigInt(b.count(_ <= x)) * a.size).abs * (xn - x)
    }.sum
    (w * 1000000 / (BigInt(a.size) * b.size)).toLong
  }

  test("emdDrift ≡ brute-force W1; shifted uniform = the exact shift") {
    val a = Seq(1L, 2L, 2L, 3L, 7L, 9L, 12L, 15L)
    val b = Seq(2L, 5L, 6L, 7L, 7L, 20L)
    val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
    val Array((n1, n2, w)) = analytics.emdDrift(df, col("isa"), "v")
      .as[(Long, Long, Long)].collect()
    assert(n1 === a.size.toLong && n2 === b.size.toLong)
    assert(w === bruteEmdMicro(a, b))
    // a uniform shifted by c has W1 = c exactly (in micro units)
    val u = (0L until 50L)
    val dfShift = (u.map((_, true)) ++ u.map(x => (x + 7L, false)))
      .toDF("v", "isa")
    assert(analytics.emdDrift(dfShift, col("isa"), "v")
      .select("w1_micro").as[Long].head() === 7000000L)
    // identical samples: zero; single shared value: zero, one row
    val same = Seq(3L, 5L, 9L)
    assert(analytics.emdDrift(
      (same.map((_, true)) ++ same.map((_, false))).toDF("v", "isa"),
      col("isa"), "v").select("w1_micro").as[Long].head() === 0L)
    assert(analytics.emdDrift(
      Seq((4L, true), (4L, false)).toDF("v", "isa"),
      col("isa"), "v").select("w1_micro").as[Long].head() === 0L)
    // fuzz
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val x = Seq.fill(4 + rnd.nextInt(30))(rnd.nextInt(40).toLong)
      val y = Seq.fill(4 + rnd.nextInt(30))(rnd.nextInt(40).toLong)
      val fz = (x.map((_, true)) ++ y.map((_, false))).toDF("v", "isa")
      assert(analytics.emdDrift(fz, col("isa"), "v")
        .select("w1_micro").as[Long].head() === bruteEmdMicro(x, y))
    }
  }

  test("ksDrift with an empty side yields a null statistic") {
    val df = Seq((1L, true), (2L, true)).toDF("v", "isa")
    val got = analytics.ksDrift(df, col("isa"), "v")
      .select("d_micro").as[Option[Long]].collect()
    assert(got.toSeq === Seq(None))
  }
}
