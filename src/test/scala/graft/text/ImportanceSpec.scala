package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // target docs talk about "wiki facts"; raw pool is "spam offer" noise;
  // two probe docs (raw) lean one way each
  private val docs = Seq(
    (0L, "en", "wiki facts wiki facts wiki facts"),
    (1L, "en", "wiki facts figures wiki"),
    (2L, "de", "spam offer spam offer spam offer"),
    (3L, "de", "spam offer click spam"),
    (10L, "de", "wiki facts and more wiki facts"), // target-like probe
    (11L, "de", "spam offer and more spam offer")  // raw-like probe
  ).toDF("doc_id", "lang", "text")

  test("target-like docs outscore raw-like docs") {
    val scores = Importance
      .dsirScoreMicro(docs, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 64)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(scores(10L) > scores(11L),
      s"wiki-ish probe must outscore spam-ish probe: $scores")
    assert(scores(0L) > 0L && scores(2L) < 0L,
      s"exemplars must score with their own side: $scores")
  }

  test("scores are partitioning-independent and count tokens exactly") {
    def get(df: org.apache.spark.sql.DataFrame) = Importance
      .dsirScoreMicro(df, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 64)
      .as[(Long, Long, Long)].collect().toSet
    val a = get(docs)
    assert(a === get(docs.repartition(5)))
    val nTokens = a.map(r => r._1 -> r._2).toMap
    assert(nTokens(0L) === 6L && nTokens(10L) === 6L)
  }

  test("naive bayes recovers the class of held-out lookalikes") {
    // train on the 4 exemplars, score everything (trainPred excludes the
    // probes); each probe's vocabulary leans hard to one class
    val out = Importance.naiveBayes(docs, "doc_id", "text",
        labelCol = "lang", trainPred = col("doc_id") < 10L, buckets = 64)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(10L) === "en", s"wiki-ish probe must classify en: $out")
    assert(out(11L) === "de", s"spam-ish probe must classify de: $out")
    assert(out.size === 6, "every doc gets scored, trained or not")
  }

  test("naive bayes matches a driver-side model on the same counts") {
    val buckets = 64
    def bkt(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % buckets).toInt
    }
    val rows = docs.as[(Long, String, String)].collect()
    val toks = rows.map { case (id, lang, text) =>
      (id, lang, text.toLowerCase.replaceAll("[^a-z0-9\\s]+", " ")
        .trim.split("\\s+").toSeq.map(bkt))
    }
    val train = toks.filter(_._1 < 10L)
    val classes = train.groupBy(_._2).view.mapValues(ds =>
      (ds.map(_._3.size).sum.toLong, ds.size.toLong)).toMap
    val totalDocs = classes.values.map(_._2).sum.toDouble
    val bcCounts = train.flatMap(d => d._3.map(b => (b, d._2)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def w(b: Int, c: String): Long =
      math.round(math.log((bcCounts.getOrElse((b, c), 0L) + 1.0) /
        (classes(c)._1 + buckets.toDouble)) * 1e6)
    def prior(c: String): Long =
      math.round(math.log(classes(c)._2 / totalDocs) * 1e6)
    val expected = toks.map { case (id, _, bs) =>
      val scores = classes.keys.map(c =>
        (bs.map(w(_, c)).sum + prior(c), c)).toSeq
      val best = scores.maxBy(identity) // score, then class DESC — the
      id -> ((bs.size.toLong, best._2, best._1)) // max(struct) order
    }.toMap
    val got = Importance.naiveBayes(docs, "doc_id", "text",
        labelCol = "lang", trainPred = col("doc_id") < 10L, buckets = 64)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
  }

  test("naive bayes: empty training slice yields a defined empty result") {
    val out = Importance.naiveBayes(docs, "doc_id", "text",
      labelCol = "lang", trainPred = lit(false), buckets = 64)
    assert(out.count() === 0L,
      "no training rows -> no model -> no scored rows (documented)")
  }

  test("naive bayes: single-class training predicts that class for all") {
    val out = Importance.naiveBayes(docs, "doc_id", "text",
        labelCol = "lang", trainPred = col("lang") === "en",
        buckets = 64)
      .as[(Long, Long, String, Long)].collect()
    assert(out.length === 6 && out.forall(_._3 === "en"))
  }

  test("source KL: a single source diverges exactly 0 from the corpus") {
    // one source IS the corpus: P == Q bucket-for-bucket, smoothing and
    // all, so every snapped log-ratio is exactly 0
    val one = docs.filter(col("doc_id") < 2L)
      .select(col("doc_id"), lit("only").as("source"), col("text"))
    val kl = Importance.sourceDivergence(one, "source", "text",
      buckets = 64).as[(String, Long, Double)].head()
    assert(kl._3 === 0.0, s"single source must have zero drift: $kl")
  }

  test("source KL: identical sources sit at ~0, an outlier stands out") {
    // two sources drawn from the same vocabulary, one from a disjoint
    // one — its KL vs the corpus must dominate
    val docs = Seq(
      (0L, "sA", "alpha beta gamma delta alpha beta"),
      (1L, "sA", "beta gamma delta alpha"),
      (2L, "sB", "alpha beta gamma delta gamma delta"),
      (3L, "sB", "delta alpha beta gamma"),
      (4L, "sC", "zork quux blarg zork quux blarg zork quux")
    ).toDF("doc_id", "source", "text")
    val kl = Importance.sourceDivergence(docs, "source", "text",
        buckets = 64)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(kl("sC") > kl("sA") && kl("sC") > kl("sB"),
      s"disjoint-vocab source must have the largest divergence: $kl")
    assert(kl("sA") < 0.2 && kl("sB") < 0.2,
      s"pool-like sources must sit near zero: $kl")
    // layout-independent (the one shuffle is a hash agg)
    val again = Importance.sourceDivergence(docs.repartition(7),
        "source", "text", buckets = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(again === kl)
  }
}
