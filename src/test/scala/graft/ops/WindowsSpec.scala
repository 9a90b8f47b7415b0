package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** SURVEY.md §5 item 3: prove the iterrows→window translation by checking
  * W1-W3 window expressions against a direct sequential fold (the pandas
  * semantics transcribed to Scala) on random event sequences. */
// top-level so Spark can generate an Encoder (inner classes need an outer
// scope the executor doesn't have)
case class Ev(game: Int, seq: Int, periodTime: Int, score: Option[Double])

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-scalacheck sampling loop (scalatestplus bridge isn't on the
    * offline classpath): 20 deterministic samples per property. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (0 until 20).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val genGame: Gen[List[Ev]] = for {
    game <- Gen.choose(0, 5)
    n <- Gen.choose(1, 15)
    times <- Gen.listOfN(n,
      Gen.oneOf(720, 720, 100, 55, 0)) // 720 = period start marker
    scores <- Gen.listOfN(n, Gen.option(Gen.choose(0.0, 100.0)))
  } yield {
    // first row of a game is a period start, like the reference data
    val ts = 720 :: times.tail
    ts.zip(scores).zipWithIndex.map { case ((t, sc), i) =>
      Ev(game, i, t, sc)
    }
  }

  test("W1 running counter ≡ sequential fold (pandas create_period)") {
    forAll(Gen.listOfN(4, genGame)) { games =>
      val evs = games.zipWithIndex.flatMap { case (g, i) =>
        g.map(_.copy(game = i)) }
      whenever(evs.nonEmpty) {
        // pandas playByplay.py:19-41: reset at new game, +1 on time==720
        val expected = evs.groupBy(_.game).flatMap { case (g, rows) =>
          var p = 0
          rows.sortBy(_.seq).map { e =>
            if (e.periodTime == 720) p += 1
            (g, e.seq, p)
          }
        }.toSet

        val w = windows.running(Seq(col("game")), Seq(col("seq")))
        val got = evs.toDF()
          .select(col("game"), col("seq"),
            windows.runningCounter(col("periodTime") === 720, w).as("p"))
          .as[(Int, Int, Long)].collect()
          .map { case (g, s, p) => (g, s, p.toInt) }.toSet
        assert(got === expected)
      }
    }
  }

  test("W2 forward fill with seed ≡ sequential fold (createHomeAwayPoints)") {
    forAll(Gen.listOfN(4, genGame)) { games =>
      val evs = games.zipWithIndex.flatMap { case (g, i) =>
        g.map(_.copy(game = i)) }
      whenever(evs.nonEmpty) {
        val expected = evs.groupBy(_.game).flatMap { case (g, rows) =>
          var lastSeen = 0.0
          rows.sortBy(_.seq).map { e =>
            lastSeen = e.score.getOrElse(lastSeen)
            (g, e.seq, lastSeen)
          }
        }.toSet

        val w = windows.running(Seq(col("game")), Seq(col("seq")))
        val got = evs.toDF()
          .select(col("game"), col("seq"),
            windows.forwardFill(col("score"), w, lit(0.0)).as("f"))
          .as[(Int, Int, Double)].collect().toSet
        assert(got === expected)
      }
    }
  }

  test("W3 marker fill ≡ sequential fold (isStarter semantics)") {
    forAll(Gen.listOfN(4, genGame)) { games =>
      val evs = games.zipWithIndex.flatMap { case (g, i) =>
        g.map(_.copy(game = i)) }
      whenever(evs.nonEmpty) {
        // boxScores.py:64-76: value 1 until 'Reserves' marker (here
        // periodTime==0), 0 after; first row defaults 1.
        val expected = evs.groupBy(_.game).flatMap { case (g, rows) =>
          var cur = 1
          rows.sortBy(_.seq).map { e =>
            if (e.periodTime == 0) cur = 0
            (g, e.seq, cur)
          }
        }.toSet

        val w = windows.running(Seq(col("game")), Seq(col("seq")))
        val got = evs.toDF()
          .select(col("game"), col("seq"),
            windows.markerFill(when(col("periodTime") === 0, 0), w,
              lit(1)).as("m"))
          .as[(Int, Int, Int)].collect().toSet
        assert(got === expected)
      }
    }
  }

  test("distributedPrefixSum ≡ global Window.orderBy (asc and desc)") {
    import org.apache.spark.sql.expressions.Window
    forAll(Gen.listOfN(60, Gen.zip(Gen.choose(-50L, 50L),
      Gen.choose(1L, 9L)))) { rows =>
      whenever(rows.nonEmpty) {
        // unique total order: (v, uid)
        val df = rows.zipWithIndex
          .map { case ((v, c), i) => (v, c, i.toLong) }
          .toDF("v", "c", "uid")
        for (ord <- Seq(Seq(col("v"), col("uid")),
            Seq(col("v").desc, col("uid")))) {
          val w = Window.orderBy(ord: _*)
          val want = df
            .withColumn("cum", sum(col("c")).over(
              w.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)))
            .withColumn("rk", row_number().over(w).cast("long"))
            .select("uid", "cum", "rk")
            .as[(Long, Long, Long)].collect().toSet
          // numPartitions=5 forces a genuinely multi-partition run that
          // AQE would coalesce at this scale
          val got = windows.distributedPrefixSum(df, ord, col("c"),
              numPartitions = 5)
            .select("uid", "cum", "rk")
            .as[(Long, Long, Long)].collect().toSet
          assert(got === want)
        }
      }
    }
  }

  test("distributedPrefixSums: several cums, one pass, mixed types") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 200).map(i =>
      (i.toLong, (i * 7 % 13).toLong, (i * 3 % 5).toLong))
      .toDF("uid", "x", "y")
      .withColumn("xd", col("x").cast("decimal(38,0)") * 1000)
    val w = Window.orderBy(col("uid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cx", sum(col("x")).over(w))
      .withColumn("cy", sum(col("y")).over(w))
      .withColumn("cxd", sum(col("xd")).over(w))
      .select(col("uid"), col("cx"), col("cy"),
        col("cxd").cast("decimal(38,0)"))
      .as[(Long, Long, Long, BigDecimal)].collect().toSet
    val got = windows.distributedPrefixSums(df, Seq(col("uid")),
        Seq(col("x"), col("y"), col("xd")), Seq("cx", "cy", "cxd"),
        numPartitions = 7)
      .select(col("uid"), col("cx"), col("cy"),
        col("cxd").cast("decimal(38,0)"))
      .as[(Long, Long, Long, BigDecimal)].collect().toSet
    assert(got === want)
  }

  test("distributedPrefixSum leaves no unpartitioned data-sized window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("uid", "c")
    val plan = windows.distributedPrefixSum(df,
        Seq(col("c").desc, col("uid")), col("c"), numPartitions = 5)
      .queryExecution.optimizedPlan
    val wins = plan.collect { case w: LWin => w }
    assert(wins.nonEmpty)
    // every data-sized window partitions by __pid; the only global-order
    // window allowed is the per-partition-totals offset frame, whose
    // input is an Aggregate grouped on __pid (≤ partition-count rows)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overAggOnPid = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(
            _.toString.contains("__pid")) => a
      }
      assert(overAggOnPid.nonEmpty,
        s"unpartitioned window over row data:\n$w")
    }
  }

  test("distributedDenseRank leaves no unpartitioned data-sized window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    val df = (1L to 100L).map(i => (i % 13, i % 3)).toDF("a", "b")
    val plan = windows.distributedDenseRank(df,
        Seq(col("a"), col("b")), rankName = "dr")
      .queryExecution.optimizedPlan
    val wins = plan.collect { case w: LWin => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overAggOnPid = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(
            _.toString.contains("__pid")) => a
      }
      assert(overAggOnPid.nonEmpty,
        s"unpartitioned window over row data:\n$w")
    }
  }

  test("groupedPrefixSum ≡ per-group window (rank, cum, total), " +
    "incl. dominant group") {
    // 80% of rows in ONE group — the regime the offset-lift exists for
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val g = if (rnd.nextInt(10) < 8) "big" else s"g${rnd.nextInt(3)}"
      (i.toLong, g, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("id", "g", "v").repartition(5)
    val got = windows.groupedPrefixSum(df, Seq("g"), Seq(col("id")),
        col("v"), cumName = "cum", rankName = "rk", totalName = "ng")
      .select(col("id"), col("g"), col("v"), col("rk").cast("long"),
        col("cum").cast("long"), col("ng").cast("long"))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    val expected = rows.groupBy(_._2).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._1)
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      sorted.zipWithIndex.zip(cums).map { case (((id, _, v), i), c) =>
        (id, g, v, i + 1L, c, rs.size.toLong)
      }
    }.toSet
    assert(got === expected)
    // rank-only use (value = 0) keeps cum identically zero
    val rankOnly = windows.groupedPrefixSum(df, Seq("g"), Seq(col("id")),
        lit(0L), rankName = "rk")
      .select(col("id"), col("rk").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(rankOnly === expected.map(r => (r._1, r._4)))
  }

  test("groupedPrefixSum keeps NULL group keys (window-form parity)") {
    // Window.partitionBy and groupBy both treat NULL as a regular
    // group; the offset join-back is null-safe (<=>) so NULL-group
    // rows must survive with correct ranks, not silently drop
    val rows: Seq[(Long, Option[String], Long)] =
      Seq((1L, Some("a"), 5L), (2L, None, 3L), (3L, Some("a"), 2L),
        (4L, None, 7L), (5L, None, 1L), (6L, Some("b"), 4L))
    val df = rows.toDF("id", "g", "v").repartition(3)
    val got = windows.groupedPrefixSum(df, Seq("g"), Seq(col("id")),
        col("v"), cumName = "cum", rankName = "rk", totalName = "ng")
      .select(col("id"), col("rk").cast("long"),
        col("cum").cast("long"), col("ng").cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(_._1)
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      sorted.zipWithIndex.zip(cums).map { case (((id, _, _), i), c) =>
        (id, i + 1L, c, rs.size.toLong)
      }
    }.toSet
    assert(got === expected,
      "NULL-group rows must rank exactly as the window form ranks them")
  }

  test("distributedDenseRank ≡ global dense_rank, incl. all-equal keys") {
    val rows = (1L to 500L).map(i => ((i * 37) % 11, (i * 13) % 5, i))
    val df = rows.toDF("a", "b", "uid")
    val got = windows.distributedDenseRank(df,
        Seq(col("a"), col("b")), rankName = "dr")
      .select("a", "b", "uid", "dr")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._3)
    val want = {
      val order = rows.map(r => (r._1, r._2)).distinct.sorted
        .zipWithIndex.map { case (k, i) => (k, i + 1L) }.toMap
      rows.map(r => (r._1, r._2, r._3, order((r._1, r._2))))
    }
    assert(got === want)
    // degenerate single-group frame still ranks (and ranks 1)
    val one = windows.distributedDenseRank(
        Seq.fill(50)(7L).toDF("a"), Seq(col("a")), "dr")
      .select("dr").as[Long].collect()
    assert(one.length === 50 && one.forall(_ == 1L))
  }
}
