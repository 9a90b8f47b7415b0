package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the sparse all-pairs tf-idf cosine: inverted-index dot products
  * ≡ dense vector math, and the df pruning contract. */
class TfidfPairsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark engine shuffle join"),
    (1L, "spark engine shuffle join"),          // exact dup of 0
    (2L, "spark engine shuffle plan codegen"),  // overlaps 0 partially
    (3L, "parquet column row format")           // disjoint content
  ).toDF("doc_id", "text")

  test("exact duplicates score cosine 1, disjoint docs never pair") {
    val pairs = Text.tfidfCosinePairs(docs, "doc_id", "text",
      maxDfFrac = 1.0, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.contains((0L, 1L, 1.0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("inverted-index cosine ≡ dense per-pair computation") {
    val got = Text.tfidfCosinePairs(docs, "doc_id", "text",
      maxDfFrac = 1.0, threshold = 0.01)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // dense ground truth, same integer 1e-4 weight snap
    val toks = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ").toSeq
    }
    val n = toks.length.toDouble
    val dfm = toks.flatMap(_._2.distinct).groupBy(identity)
      .view.mapValues(_.length).toMap
    val w = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, xs) =>
        t -> math.round(xs.length * math.log(n / dfm(t)) * 1e4)
      }
    }.toMap
    for {
      (a, wa) <- w; (b, wb) <- w if a < b
      dot = wa.keySet.intersect(wb.keySet).toSeq
        .map(t => wa(t) * wb(t)).sum.toDouble
      if dot > 0
    } {
      val na = math.sqrt(wa.values.map(v => (v * v).toDouble).sum)
      val nb = math.sqrt(wb.values.map(v => (v * v).toDouble).sum)
      val expect = math.rint(dot / (na * nb) * 1e6) / 1e6
      val cos = got.get((a, b))
      if (expect >= 0.01)
        assert(cos.exists(c => math.abs(c - expect) < 1e-9),
          s"pair ($a,$b): got $cos expect $expect")
    }
  }

  test("maxDfFrac prunes ubiquitous terms from weights AND norms") {
    // "spark" appears in 3 of 4 docs (df frac 0.75) — pruned at 0.5;
    // docs 0 and 1 stay identical on the surviving vocabulary
    val pairs = Text.tfidfCosinePairs(docs, "doc_id", "text",
      maxDfFrac = 0.5, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.contains((0L, 1L, 1.0)))
  }
}
