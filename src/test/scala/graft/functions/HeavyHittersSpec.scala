package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct items fit capacity, any partitioning") {
    // zipf-ish: item i appears (20 - i) times, 20 distinct < capacity 32
    val rows = (0 until 20).flatMap(i => Seq.fill(20 - i)(s"tok_$i"))
    val ds = spark.createDataset(rows).repartition(8)
    val got = ds.select(HeavyHitters.topK(32, 5).toColumn).head()
    val expected = Seq(("tok_0", 20L), ("tok_1", 19L), ("tok_2", 18L),
      ("tok_3", 17L), ("tok_4", 16L))
    assert(got.map(h => (h.item, h.count)) === expected)
    assert(got.forall(_.err == 0L), "no evictions → exact counts")
  }

  test("under pressure the true heavy hitter survives eviction") {
    // one item with 40% mass among 200 distinct, capacity 16
    val rows = Seq.fill(400)("whale") ++
      (0 until 600).map(i => s"minnow_${i % 200}")
    val ds = spark.createDataset(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(rows)).repartition(4)
    val got = ds.select(HeavyHitters.topK(16, 3).toColumn).head()
    assert(got.head.item === "whale")
    assert(got.head.count >= 400L, "SpaceSaving never undercounts")
  }
}
