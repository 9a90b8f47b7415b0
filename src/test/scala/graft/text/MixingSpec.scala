package graft.text

import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: scan integer milli-epoch levels for the
    * largest affordable one (the definition, not the closed form). */
  private def bruteEStar(srcs: Seq[(String, Long, Long)],
                         budget: Long): Long = {
    def cost(e: Long): BigInt =
      srcs.map { case (_, n, m) => BigInt(n) * math.min(e, m) }.sum
    val budgetMilli = BigInt(budget) * 1000
    // cost is monotone in e: binary search the largest affordable level
    var lo = 0L
    var hi = srcs.map(_._3).max + budget * 1000 / srcs.map(_._2).min
    while (lo < hi) {
      val mid = lo + (hi - lo + 1) / 2
      if (cost(mid) <= budgetMilli) lo = mid else hi = mid - 1
    }
    lo
  }

  private def run(srcs: Seq[(String, Long, Long)], budget: Long) =
    Mixing.epochWaterfill(srcs.toDF("src", "n", "m"), "src", "n", "m",
        budget)
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq

  private def check(srcs: Seq[(String, Long, Long)], budget: Long)
  : Unit = {
    val got = run(srcs, budget)
    val eStar = bruteEStar(srcs, budget)
    srcs.sortBy(_._1).zip(got).foreach {
      case ((s, n, m), (gs, gn, gm, ge, ga)) =>
        assert(gs === s && gn === n && gm === m)
        assert(ge === math.min(eStar, m), s"epochs for $s (e*=$eStar)")
        assert(ga === (BigInt(n) * math.min(eStar, m) / 1000).toLong,
          s"alloc for $s")
    }
    // the plan never overspends, and bumping e* by one would
    val spent = got.map(r => BigInt(r._2) * r._4).sum
    assert(spent <= BigInt(budget) * 1000)
    val spentUp = srcs.map { case (_, n, m) =>
      BigInt(n) * math.min(eStar + 1, m) }.sum
    assert(spentUp > BigInt(budget) * 1000 ||
      eStar >= srcs.map(_._3).max, "e* must be maximal")
  }

  test("mixed regime: low-ceiling sources saturate, the rest waterfill") {
    check(Seq(("a", 100L, 2000L), ("b", 200L, 3000L), ("c", 50L, 5000L),
      ("d", 400L, 1000L)), budget = 1500L)
  }

  test("ample budget saturates every source at its ceiling") {
    val srcs = Seq(("a", 10L, 2000L), ("b", 20L, 4000L))
    check(srcs, budget = 1000L)
    val got = run(srcs, 1000L)
    assert(got.map(_._4) === Seq(2000L, 4000L))
  }

  test("starved budget: nobody saturates, equal epochs for all") {
    val srcs = Seq(("a", 1000L, 9000L), ("b", 3000L, 9000L))
    check(srcs, budget = 2L) // 2000 token·millis over 4000 tokens
    assert(run(srcs, 2L).map(_._4).distinct === Seq(0L))
  }

  test("tied ceilings and single source are handled") {
    check(Seq(("a", 7L, 3000L), ("b", 11L, 3000L), ("c", 5L, 3000L)),
      budget = 40L)
    check(Seq(("only", 123L, 2500L)), budget = 200L)
  }

  test("strideSchedule: permutation, determinism, bounded prefix drift") {
    val rows = (0 until 120).map(i =>
      (i.toLong, if (i % 6 == 0) "big" else if (i % 6 == 1) "mid"
        else "small"))
    // sizes: big 20, mid 20, small 80 → T = 120
    val df = rows.toDF("id", "src")
    val got = Mixing.strideSchedule(df, "src", "id")
      .as[(Long, String, Long, Long)].collect()
    // permutation of the input with a total global order
    assert(got.length === rows.length)
    assert(got.map(_._4).sorted.toSeq === (1L to rows.length).toSeq)
    assert(got.map(_._1).toSet === rows.map(_._1).toSet)
    // deterministic across runs
    val again = Mixing.strideSchedule(df, "src", "id")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(again === got.toSet)
    // stride guarantee: every prefix holds every source within O(1) of
    // its proportion (allow 2 for the tie-packed ends)
    val bySrc = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val t = rows.size.toDouble
    val ordered = got.sortBy(_._4)
    (1 to rows.length).foreach { p =>
      val prefix = ordered.take(p)
      bySrc.foreach { case (s, ns) =>
        val cnt = prefix.count(_._2 == s)
        assert(math.abs(cnt - p * ns / t) <= 2.0,
          s"prefix $p drifted for $s: $cnt vs ${p * ns / t}")
      }
    }
  }

  test("strideSchedule never windows by source alone (straggler guard)") {
    // the 100 TB shape: ~10-100 sources over billions of docs, so ANY
    // window partitioned solely by the source column funnels the
    // dominant source through one task. Checked via a listener over
    // every executed query — the per-source rank is computed inside an
    // eagerly staged subtree a final-plan assertion cannot see.
    val rows = (0 until 90).map(i =>
      (i.toLong, if (i % 3 == 0) "big" else "small"))
    val df = rows.toDF("id", "src")
    val offending = graft.PlanGuards.sourceOnlyWindows(spark, "__src") {
      Mixing.strideSchedule(df, "src", "id").collect()
    }
    assert(offending.isEmpty,
      s"strideSchedule ran a source-partitioned window over corpus-" +
        s"sized data:\n${offending.mkString("\n")}")
  }

  test("epochWaterfill rejects out-of-domain sources loudly") {
    // a zero-token source drives a breakpoint divisor to 0 — silent
    // NULL under Spark's non-ANSI division while the DuckDB twin
    // errors; the domain is validated on the stage's own job
    intercept[IllegalArgumentException] {
      Mixing.epochWaterfill(
        Seq(("a", 0L, 1000L), ("b", 5L, 1000L)).toDF("src", "n", "m"),
        "src", "n", "m", budgetTokens = 100L)
    }
    intercept[IllegalArgumentException] {
      Mixing.epochWaterfill(
        Seq(("a", 3L, 0L)).toDF("src", "n", "m"),
        "src", "n", "m", budgetTokens = 100L)
    }
    intercept[IllegalArgumentException] {
      Mixing.epochWaterfill(
        Seq.empty[(String, Long, Long)].toDF("src", "n", "m"),
        "src", "n", "m", budgetTokens = 100L)
    }
  }

  test("randomized fuzz against the brute-force definition") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val srcs = (0 until 1 + rnd.nextInt(6)).map(i =>
        (s"s$i", 1L + rnd.nextInt(500).toLong,
          1L + rnd.nextInt(5000).toLong))
      check(srcs, budget = 1L + rnd.nextInt(3000).toLong)
    }
  }
}
