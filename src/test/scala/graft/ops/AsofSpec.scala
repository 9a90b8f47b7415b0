package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin ≡ naive join+argmax on random data (100 seeds worth)") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(8), new Timestamp(rnd.nextInt(1000000) * 1000L))
    }.toDF("event_id", "uk", "ts")
    val right = (1 to 120).map { j =>
      (rnd.nextInt(8), new Timestamp(rnd.nextInt(1000000) * 1000L),
        j.toLong, rnd.nextDouble())
    }
      // unique per (key, ts): required contract — keep max orderkey
      .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      .toDF("uk", "rts", "o_orderkey", "o_totalprice")

    val got = asof.asOfJoin(left, right, "uk", "ts", "rts",
      Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "o_orderkey")
      .as[(Long, Option[Long])].collect().toMap

    // reference: argmax over the inequality join
    val naive = left.join(right, left("uk") === right("uk") &&
        col("rts") <= col("ts"), "left")
      .groupBy("event_id")
      .agg(max(struct(col("rts"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("m.o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap

    assert(got === naive)
    assert(got.values.flatten.nonEmpty)
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks latest right row at-or-before left ts, per key") {
    val left = Seq(
      (1L, 10, ts("2024-01-05 00:00:00")),
      (2L, 10, ts("2024-01-01 00:00:00")), // before any right row
      (3L, 20, ts("2024-03-01 00:00:00")),
      (4L, 10, ts("2024-01-10 00:00:00"))  // exactly on a right ts
    ).toDF("event_id", "uk", "ts")
    val right = Seq(
      (10, ts("2024-01-02 00:00:00"), 100L, 1.0),
      (10, ts("2024-01-10 00:00:00"), 101L, 2.0),
      (20, ts("2024-02-01 00:00:00"), 200L, 3.0)
    ).toDF("uk", "rts", "o_orderkey", "o_totalprice")

    val got = asof.asOfJoin(left, right, "uk", "ts", "rts",
      Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "o_orderkey", "o_totalprice")
      .as[(Long, Option[Long], Option[Double])].collect().toSet

    assert(got === Set(
      (1L, Some(100L), Some(1.0)),
      (2L, None, None),
      (3L, Some(200L), Some(3.0)),
      (4L, Some(101L), Some(2.0)))) // inclusive: right row at equal ts wins
  }

  test("a matched right row's NULL payload is attached, not skipped") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, 1, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "uk", "ts")
    val right = Seq(
      (1, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1, ts("2024-01-01 11:00:00"), Option.empty[Double])
    ).toDF("uk", "rts", "price")
    val got = asof.asOfJoin(left, right, "uk", "ts", "rts", Seq("price"))
      .select("event_id", "price")
      .as[(Long, Option[Double])].collect().toSet
    // the 11:00 row is the as-of match; its null price must win over
    // the superseded 10:00 value
    assert(got === Set((1L, None)))
  }
}
