package graft.text

import org.apache.spark.sql.Row

import graft.SparkSpec

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force token suffix order: lexicographic on the token seq,
    * shorter-prefix-first, ties by (doc, pos) — the contract the
    * distributed prefix doubling must reproduce exactly. */
  private def bruteSa(docs: Seq[(Long, String)]): Seq[(Long, Long)] = {
    val sufs = for {
      (id, text) <- docs
      toks = text.toLowerCase.replaceAll("[^a-z0-9\\s]+", " ").trim
        .split("\\s+").toSeq
      p <- 1 to toks.length
    } yield (id, p.toLong, toks.drop(p - 1))
    implicit val ord: Ordering[Seq[String]] =
      Ordering.Iterable[String].on[Seq[String]](identity)
    sufs.sortBy { case (id, p, s) => (s, id, p) }
      .map { case (id, p, _) => (id, p) }
  }

  private def bruteLcp(a: Seq[String], b: Seq[String]): Int =
    a.zip(b).takeWhile { case (x, y) => x == y }.size

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "a banana a banana a ban"),
    (2L, "the quick brown fox sleeps"),   // shared 4-token prefix with 0
    (3L, "a banana a banana a ban"),      // exact dup of 1
    (4L, "zz"),                           // single token
    (5L, "over the lazy dog the quick")   // internal overlaps with 0
  )

  test("suffixArray matches brute-force lexicographic suffix order") {
    val df = corpus.toDF("doc_id", "text")
    val got = SuffixArray.suffixArray(df, "doc_id", "text")
      .orderBy("sa_rank")
      .collect().map { case Row(id: Long, p: Long, _) => (id, p) }.toSeq
    assert(got === bruteSa(corpus))
  }

  test("sa_rank is a 1..n permutation") {
    val df = corpus.toDF("doc_id", "text")
    val ranks = SuffixArray.suffixArray(df, "doc_id", "text")
      .select("sa_rank").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to ranks.length).toSeq)
  }

  test("lcpAdjacent matches brute-force capped common prefixes") {
    val cap = 5
    val df = corpus.toDF("doc_id", "text")
    val toks = corpus.map { case (id, t) =>
      (id, t.toLowerCase.replaceAll("[^a-z0-9\\s]+", " ").trim
        .split("\\s+").toSeq)
    }.toMap
    val order = bruteSa(corpus)
    val want = order.sliding(2).zipWithIndex.collect {
      case (Seq((ai, ap), (bi, bp)), i) =>
        val a = toks(ai).drop(ap.toInt - 1).take(cap)
        val b = toks(bi).drop(bp.toInt - 1).take(cap)
        (i + 1L, ai, ap, bi, bp, bruteLcp(a, b).toLong)
    }.toSeq
    val got = SuffixArray.lcpAdjacent(df, "doc_id", "text", cap)
      .orderBy("sa_rank")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("dupPositions flags exactly the spans occurring twice") {
    // hand model: a position is duplicated iff its full minLen-token
    // span (positions with fewer than minLen tokens left never qualify)
    // occurs at >=2 (doc, pos) starting points corpus-wide — within-doc
    // repeats included
    val minLen = 3
    val df = corpus.toDF("doc_id", "text")
    val toks = corpus.map { case (id, t) =>
      (id, t.toLowerCase.replaceAll("[^a-z0-9\\s]+", " ").trim
        .split("\\s+").toSeq)
    }
    val allSufs = for {
      (id, ts) <- toks
      p <- 1 to ts.length
    } yield (id, p, ts.drop(p - 1).take(minLen))
    val dupKeys = allSufs.groupBy(_._3).filter { case (k, v) =>
      k.size == minLen && v.size >= 2
    }.values.flatten.map(s => (s._1, s._2)).toSet
    val want = toks.map { case (id, ts) =>
      (id, ts.length.toLong,
        (1 to ts.length).count(p => dupKeys((id, p))).toLong)
    }.sortBy(_._1)
    val got = SuffixArray.dupPositions(df, "doc_id", "text", minLen)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === want)
  }
}
