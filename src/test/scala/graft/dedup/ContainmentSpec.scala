package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the asymmetric containment join: C(A→B) = |A∩B|/|A|, prefix
  * filter + inverted index ≡ the naive quadratic ground truth. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("short doc embedded in a long one: containment sees what jaccard misses") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      // doc 0's text verbatim inside a much longer doc
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (2L, "totally unrelated words about nothing shared here at all")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, k = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // A=0 fully inside B=1 → containment 1.0; the reverse direction is
    // far below threshold; doc 2 appears nowhere
    assert(cont.contains((0L, 1L, 1.0)))
    assert(!cont.exists(p => p._1 == 1L && p._2 == 0L))
    assert(!cont.exists(p => p._1 == 2L || p._2 == 2L))
    // the symmetric jaccard at the same bar finds nothing
    val jac = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.9)
      .collect()
    assert(jac.isEmpty)
  }

  test("prefix-filtered containment ≡ naive all-ordered-pairs join") {
    val vocab = Array("spark", "scala", "engine", "corpus", "token",
      "shuffle", "join", "plan", "codegen", "parquet", "column", "row")
    val corpus = (0 until 40).map { i =>
      val base = (0 until 8).map(j => vocab((i / 8 + j) % vocab.length))
      val edited = base.updated(i % 8, s"edit$i") ++
        (if (i % 2 == 0) Seq(vocab(i % vocab.length)) else Nil)
      (i.toLong, edited.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, k = 3, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val staged = corpus.select(col("doc_id"),
      graft.text.Text.shingles(graft.text.Text.tokens(col("text")), 3)
        .as("grams")).filter(size(col("grams")) > 0)
    val naive = staged.toDF("doc_a", "grams_a")
      .crossJoin(staged.toDF("doc_b", "grams_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .withColumn("containment",
        size(array_intersect(col("grams_a"), col("grams_b")))
          .cast("double") / size(col("grams_a")).cast("double"))
      .filter(col("containment") >= 0.4)
      .select(col("doc_a"), col("doc_b"), round(col("containment"), 6))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === naive)
    assert(naive.nonEmpty, "corpus must produce containment pairs")
    // identical pair set on the shuffle verify path (forced by limit 0)
    val shuffled = Dedup.containmentPairs(corpus, k = 3, threshold = 0.4,
      broadcastBytesLimit = 0L)
      .as[(Long, Long, Double)].collect().toSet
    assert(shuffled === naive)
  }
}
