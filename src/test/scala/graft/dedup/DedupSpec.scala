package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox leaps over the lazy dog"),   // near dup
    (3L, "completely different content about spark engines"),
    (4L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG!")   // dup modulo case
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps min id") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies")
      .as[(Long, Long)].collect().toMap
    assert(got(0L) === 3L) // 0, 1 and 4 normalize to the same text
    assert(got(2L) === 1L)
    assert(got(3L) === 1L)
  }

  test("minhash-lsh finds exact and near dups, verified by jaccard") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numPerms = 8, numBands = 4, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // exact dups always collide in every band
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 4L)))
    // unrelated doc never passes the jaccard verification
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs share fingerprints, near dups are close") {
    val fps = Dedup.simhash(docs, "doc_id", "text", bits = 16)
      .as[(Long, Long)].collect().toMap
    assert(fps(0L) === fps(1L))
    assert(fps(0L) === fps(4L))
    val hamming = java.lang.Long.bitCount(fps(0L) ^ fps(2L))
    assert(hamming <= 6, s"near-dup hamming distance was $hamming")
  }

  test("native graft_simhash ≡ exploded reference formulation") {
    val native = Dedup.simhash(docs, "doc_id", "text", bits = 16)
      .as[(Long, Long)].collect().toMap
    val exploded = Dedup.simhashExploded(docs, "doc_id", "text", bits = 16)
      .as[(Long, Long)].collect().toMap
    assert(native === exploded)
  }

  test("ngram jaccard blocks by (lang, source, len bucket)") {
    val blocked = docs
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val pairs = Dedup.ngramJaccardPairs(blocked, k = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("connected components match union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (a, b))
    } yield edges

    def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }

    (0 until 8).foreach { i =>
      genEdges.apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        edges =>
          val got = Dedup
            .connectedComponents(edges.toDF("doc_a", "doc_b"),
              "doc_a", "doc_b")
            .as[(Long, Long, Boolean)].collect()
            .map(r => r._1 -> r._2).toMap
          val want = unionFind(edges)
          assert(got === want, s"seed $i, edges $edges")
      }
    }
  }

  test("connected components propagate labels across transitive chains") {
    // 10-11-12-13-14 is a 5-node path: A~B pairwise hits never include
    // 10~14 directly, so the min label must travel the whole chain
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (2L, 1L), (20L, 21L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert((10L to 14L).forall(comps(_)._1 === 10L))
    assert(comps(1L)._1 === 1L && comps(2L)._1 === 1L)
    assert(comps(20L)._1 === 20L && comps(21L)._1 === 20L)
    // exactly one canonical doc per component
    assert(comps.values.count(_._2) === 3)
    assert(comps(10L)._2 && comps(1L)._2 && comps(20L)._2)
  }
}
