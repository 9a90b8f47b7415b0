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
}
