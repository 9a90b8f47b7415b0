package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pins the association-rule math on a hand-computed basket set. */
class BasketsSpec extends SparkSpec {
  import spark.implicits._

  // b1:{1,2,3} b2:{1,2} b3:{1,3} b4:{2,4}  (with a duplicate (b1,1)
  // row to prove incidence is distinct)
  private def b = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L), (10L, 1L),
    (20L, 1L), (20L, 2L),
    (30L, 1L), (30L, 3L),
    (40L, 2L), (40L, 4L)
  ).toDF("basket", "item")

  test("pairSupports counts baskets per unordered pair, a < b") {
    val got = baskets.pairSupports(b, "basket", "item")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 1L),
      (2L, 4L, 1L)))
  }

  test("associationRules: hand-computed confidence and lift in micros") {
    // N=4; sup: 1→3, 2→3, 3→2, 4→1; surviving pairs (min 2): (1,2),(1,3)
    val got = baskets.associationRules(b, "basket", "item",
      minSupport = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      // 1→2: conf 2/3, lift 2·4/(3·3)
      (1L, 2L, 2L, 666667L, 888889L),
      (2L, 1L, 2L, 666667L, 888889L),
      // 1→3: conf 2/3; 3→1: conf 2/2; lift 2·4/(3·2)
      (1L, 3L, 2L, 666667L, 1333333L),
      (3L, 1L, 2L, 1000000L, 1333333L)))
  }

  test("string item ids (SKUs) mine pairs without a numeric cast") {
    val sku = Seq(
      (10L, "SKU-A"), (10L, "SKU-B"),
      (20L, "SKU-A"), (20L, "SKU-B"),
      (30L, "SKU-A")
    ).toDF("basket", "sku")
    val got = baskets.pairSupports(sku, "basket", "sku")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("SKU-A", "SKU-B", 2L)))
  }

  test("sequentialPairs: order matters, interleaving counts, ties by id") {
    val ev = Seq(
      // u1: a@10, b@20 → a→b only
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      // u2: b@10, a@20, b@30 → a→b (a@20 ≺ b@30) AND b→a (b@10 ≺ a@20)
      (2L, 10L, 3L, "b"), (2L, 20L, 4L, "a"), (2L, 30L, 5L, "b"),
      // u3: a and b simultaneous, id 6 < 7 → a→b only (tie on id)
      (3L, 10L, 6L, "a"), (3L, 10L, 7L, "b"),
      // u4: single-type user — contributes to n_tot, no pairs
      (4L, 10L, 8L, "c"))
      .toDF("u", "epoch", "id", "typ")
      .select(col("u"), col("epoch").cast("timestamp").as("ts"),
        col("id"), col("typ"))
    val got = baskets.sequentialPairs(ev, "u", "typ", "ts", "id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", 3L, 750000L),   // u1, u2, u3 of 4 sequences
      ("b", "a", 1L, 250000L)))  // u2 only
  }
}
