package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binnedRangeJoin ≡ naive inequality join") {
    val points = (1 to 500).map { i =>
      (i.toLong, ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00"))
    }.toDF("pid", "pts")
    val intervals = (1 to 80).map { j =>
      (j.toLong, ts(f"2024-01-${j % 28 + 1}%02d 00:00:00"),
        ts(f"2024-01-${j % 28 + 1}%02d 00:00:00").toInstant
          .plusSeconds((j % 5 + 1) * 86400L))
    }.map { case (id, s, e) => (id, s, Timestamp.from(e)) }
      .toDF("iid", "s", "e")

    val naive = points.join(intervals,
      col("s") <= col("pts") && col("pts") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted

    val binned = rangejoin.binnedRangeJoin(points, "pts",
      intervals, "s", "e", binSeconds = 6 * 86400L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted

    assert(binned === naive)
    assert(naive.nonEmpty)
  }

  test("binnedRangeJoin plans as an equi join, not a nested loop") {
    val points = spark.range(100)
      .select(col("id").as("pid"),
        (col("id") * 1000 + 1700000000L).cast("timestamp").as("pts"))
    val intervals = spark.range(20)
      .select(col("id").as("iid"),
        (col("id") * 5000 + 1700000000L).cast("timestamp").as("s"),
        (col("id") * 5000 + 1700003000L).cast("timestamp").as("e"))
    val joined = rangejoin.binnedRangeJoin(points, "pts",
      intervals, "s", "e", binSeconds = 3000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("inverted/empty intervals are dropped, not exploded") {
    import org.apache.spark.sql.functions._
    val points = Seq(1700000100L).toDF("p")
      .select(col("p").cast("timestamp").as("pts"))
    // one sane interval, one zero-width, one INVERTED with a 1970
    // end - the inverted one would explode onto ~28M descending bins
    // without the guard (sequence() silently switches to step -1)
    val intervals = Seq(
      (1L, 1700000000L, 1700003000L),
      (2L, 1700000000L, 1700000000L),
      (3L, 1700000000L, 0L)
    ).toDF("iid", "s0", "e0")
      .select(col("iid"), col("s0").cast("timestamp").as("s"),
        col("e0").cast("timestamp").as("e"))
    val got = rangejoin.binnedRangeJoin(points, "pts",
      intervals, "s", "e", binSeconds = 3000L)
      .select("iid").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  private def ivs(n: Int, seed: Long, tag: String) = {
    val rows = (1 to n).map { i =>
      val start = 1700000000L + (i * seed) % (40L * 86400)
      val len = 1800L + (i * 31L * seed) % (9L * 86400)
      (i.toLong, start, start + len)
    }
    rows.toDF(s"${tag}id", s"${tag}s0", s"${tag}e0")
      .select(col(s"${tag}id"),
        col(s"${tag}s0").cast("timestamp").as(s"${tag}s"),
        col(s"${tag}e0").cast("timestamp").as(s"${tag}e"))
  }

  test("intervalOverlapJoin ≡ naive, exactly once per pair, any bin width") {
    val a = ivs(300, 7919L, "a")
    val b = ivs(240, 104729L, "b")
    val naive = a.join(b,
      col("as") < col("be") && col("bs") < col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect().sorted
    assert(naive.nonEmpty)
    // widths well below / near / far above max interval length — the
    // ownership predicate must dedup multi-bin pairs in every regime
    for (bin <- Seq(3600L, 86400L, 30L * 86400)) {
      val got = rangejoin.intervalOverlapJoin(a, "as", "ae", b, "bs", "be",
        binSeconds = bin).select("aid", "bid")
        .as[(Long, Long)].collect()
      assert(got.length === got.distinct.length, s"dup pairs at bin=$bin")
      assert(got.sorted === naive, s"bin=$bin")
    }
  }

  test("property: random interval sets ≡ naive overlap join") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genSide: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(1700000000L, 1700000000L + 20L * 86400)
        len <- Gen.choose(1L, 3L * 86400)
      } yield (s, s + len))
    } yield rows.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
    val genBin = Gen.oneOf(600L, 3600L, 86400L, 10L * 86400)
    (0 until 12).foreach { seed =>
      val sample = (for {
        as <- genSide; bs <- genSide; bin <- genBin
      } yield (as, bs, bin))
        .apply(Gen.Parameters.default, Seed(seed.toLong))
      sample.foreach { case (as, bs, bin) =>
        def mk(rows: List[(Long, Long, Long)], tag: String) =
          rows.toDF(s"${tag}id", s"${tag}s0", s"${tag}e0")
            .select(col(s"${tag}id"),
              col(s"${tag}s0").cast("timestamp").as(s"${tag}s"),
              col(s"${tag}e0").cast("timestamp").as(s"${tag}e"))
        val naive = (for {
          (ai, s1, e1) <- as; (bi, s2, e2) <- bs
          if s1 < e2 && s2 < e1
        } yield (ai, bi)).sorted
        val got = rangejoin.intervalOverlapJoin(
          mk(as, "a"), "as", "ae", mk(bs, "b"), "bs", "be", bin)
          .select("aid", "bid").as[(Long, Long)].collect()
        assert(got.length === got.distinct.length, s"dups seed=$seed")
        assert(got.sorted.toList === naive, s"seed=$seed bin=$bin")
      }
    }
  }

  test("intervalOverlapJoin plans as an equi join, not a nested loop") {
    val a = ivs(50, 7919L, "a")
    val b = ivs(50, 104729L, "b")
    val plan = rangejoin.intervalOverlapJoin(a, "as", "ae", b, "bs", "be",
      binSeconds = 86400L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlapJoin drops inverted/empty intervals on both sides") {
    val bad = Seq((1L, 1700000000L, 1700003000L), // sane
      (2L, 1700000000L, 1700000000L), // empty
      (3L, 1700000000L, 0L)) // inverted
      .toDF("aid", "s0", "e0")
      .select(col("aid"), col("s0").cast("timestamp").as("as"),
        col("e0").cast("timestamp").as("ae"))
    val other = Seq((9L, 1700000000L, 1700010000L))
      .toDF("bid", "t0", "u0")
      .select(col("bid"), col("t0").cast("timestamp").as("bs"),
        col("u0").cast("timestamp").as("be"))
    val got = rangejoin.intervalOverlapJoin(bad, "as", "ae",
      other, "bs", "be", binSeconds = 600L)
      .select("aid").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  /** Driver-side replica of the Allen WHEN chain — the spec oracle. */
  private def allenRef(aS: Long, aE: Long, bS: Long, bE: Long): String =
    if (aS == bS && aE == bE) "equals"
    else if (aE == bS) "meets"
    else if (bE == aS) "met_by"
    else if (aS == bS && aE < bE) "starts"
    else if (aS == bS) "started_by"
    else if (aE == bE && aS > bS) "finishes"
    else if (aE == bE) "finished_by"
    else if (aS > bS && aE < bE) "during"
    else if (aS < bS && aE > bE) "contains"
    else if (aS < bS) "overlaps"
    else "overlapped_by"

  test("allenRelations: one crafted pair per contact relation") {
    val base = 1700000000L
    // b is fixed [100, 200); one a interval per relation
    val cases = Seq(
      (1L, 100L, 200L, "equals"), (2L, 50L, 100L, "meets"),
      (3L, 200L, 250L, "met_by"), (4L, 100L, 150L, "starts"),
      (5L, 100L, 260L, "started_by"), (6L, 150L, 200L, "finishes"),
      (7L, 50L, 200L, "finished_by"), (8L, 120L, 180L, "during"),
      (9L, 50L, 260L, "contains"), (10L, 50L, 150L, "overlaps"),
      (11L, 150L, 260L, "overlapped_by"),
      // no contact: strictly before / after — must NOT pair
      (12L, 10L, 90L, ""), (13L, 210L, 260L, ""))
    val a = cases.map { case (id, s, e, _) =>
        (id, base + s * 60, base + e * 60) }
      .toDF("aid", "s0", "e0")
      .select(col("aid"), col("s0").cast("timestamp").as("as"),
        col("e0").cast("timestamp").as("ae"))
    val b = Seq((99L, base + 100 * 60, base + 200 * 60))
      .toDF("bid", "t0", "u0")
      .select(col("bid"), col("t0").cast("timestamp").as("bs"),
        col("u0").cast("timestamp").as("be"))
    for (bin <- Seq(600L, 3600L, 7200L)) {
      val got = rangejoin.allenRelations(a, "as", "ae", b, "bs", "be",
          binSeconds = bin)
        .select("aid", "relation").as[(Long, String)].collect().toMap
      val expected = cases.filter(_._4.nonEmpty)
        .map(c => c._1 -> c._4).toMap
      assert(got === expected, s"bin=$bin")
    }
  }

  test("property: random interval sets ≡ naive Allen classification") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // hour-grid starts/lengths so equality relations genuinely occur
    val genSide: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 35)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0L, 72L)
        len <- Gen.choose(1L, 24L)
      } yield (1700000000L + s * 3600, 1700000000L + (s + len) * 3600))
    } yield rows.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
    val genBin = Gen.oneOf(600L, 3600L, 86400L, 10L * 86400)
    (0 until 10).foreach { seed =>
      val sample = (for {
        as <- genSide; bs <- genSide; bin <- genBin
      } yield (as, bs, bin))
        .apply(Gen.Parameters.default, Seed(seed.toLong))
      sample.foreach { case (as, bs, bin) =>
        def mk(rows: List[(Long, Long, Long)], tag: String) =
          rows.toDF(s"${tag}id", s"${tag}s0", s"${tag}e0")
            .select(col(s"${tag}id"),
              col(s"${tag}s0").cast("timestamp").as(s"${tag}s"),
              col(s"${tag}e0").cast("timestamp").as(s"${tag}e"))
        val naive = (for {
          (ai, s1, e1) <- as; (bi, s2, e2) <- bs
          if s1 <= e2 && s2 <= e1
        } yield ((ai, bi), allenRef(s1, e1, s2, e2))).sortBy(_._1)
        val got = rangejoin.allenRelations(
            mk(as, "a"), "as", "ae", mk(bs, "b"), "bs", "be", bin)
          .select("aid", "bid", "relation")
          .as[(Long, Long, String)].collect()
          .map(r => ((r._1, r._2), r._3))
        assert(got.length === got.distinct.length, s"dups seed=$seed")
        assert(got.sortBy(_._1).toList === naive, s"seed=$seed bin=$bin")
      }
    }
  }
}
