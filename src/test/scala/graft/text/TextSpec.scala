package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens normalizes case and punctuation") {
    val got = Seq("The QUICK, brown-fox!").toDF("text")
      .select(Text.tokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(got === Seq("the", "quick", "brown", "fox"))
  }

  test("shingles produces k-grams; short docs yield empty") {
    val got = Seq("a b c d").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].head()
    assert(got === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("native shingles ≡ HOF reference on realistic text, incl. dups") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c a b c a b c",             // repeated shingles → distinct
      "one two",                       // shorter than k
      "",                              // empty text
      "x y z w x y z w")
    val rows = texts.toDF("text").select(
      Text.shingles(Text.tokens(col("text")), 3).as("native"),
      Text.shinglesHof(Text.tokens(col("text")), 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("graft_minhash ≡ exploded groupBy(min(md5)) formulation") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
      call_function("graft_minhash",
        Text.shingles(Text.tokens(col("text")), 3), lit(4)).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val exploded = docs
      .select(col("doc_id"),
        explode(Text.shingles(Text.tokens(col("text")), 3)).as("u"))
      .groupBy("doc_id")
      .agg(array((0 until 4).map(i =>
        min(md5(concat_ws(":", lit(i.toString), col("u"))))): _*).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(native === exploded)
    // empty shingle set → null signature
    val empty = Seq("one two").toDF("text")
      .select(call_function("graft_minhash",
        Text.shingles(Text.tokens(col("text")), 3), lit(4)).as("sig"))
      .collect().head
    assert(empty.isNullAt(0))
  }

  test("graft_min_md5 ≡ array_min(transform(md5)); null on empty") {
    val rows = Seq("the quick brown fox jumps over it", "a b")
      .toDF("text").select(
        Text.minShingleFingerprint(col("text"), 3).as("native"),
        array_min(transform(Text.shingles(Text.tokens(col("text")), 3),
          s => md5(s))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) === r.getString(1))
    }
    assert(rows(1).isNullAt(0), "doc shorter than k → null fingerprint")
  }

  test("graft_overlap ≡ size(array_intersect) on sorted gram arrays") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox leaps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "a b"),                                      // too short: empty
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val staged = docs.select(col("doc_id"),
      array_sort(Text.shingles(Text.tokens(col("text")), 3)).as("g"))
    val pairs = staged.toDF("a", "ga")
      .crossJoin(staged.toDF("b", "gb")).filter(col("a") < col("b"))
    val cmp = pairs.select(
      call_function("graft_overlap", col("ga"), col("gb")).as("native"),
      size(array_intersect(col("ga"), col("gb"))).as("ref"))
      .as[(Int, Int)].collect()
    assert(cmp.nonEmpty && cmp.forall(p => p._1 === p._2))
    // identical docs overlap fully; disjoint docs overlap zero
    assert(cmp.exists(_._1 > 0) && cmp.exists(_._1 == 0))
  }

  test("repetitionRatio: 0 for all-distinct, high for templated text") {
    val rows = Seq(
      "one two three four five six",      // all 3-grams distinct → 0
      "spam ham spam ham spam ham spam ham spam ham", // 2 distinct 3-grams
      "a b")                               // shorter than k → 0
      .toDF("text")
      .select(Text.repetitionRatio(col("text"), 3).as("r"))
      .as[Double].collect()
    assert(rows(0) === 0.0)
    assert(rows(1) > 0.7, s"templated text should score high, got ${rows(1)}")
    assert(rows(2) === 0.0)
  }

  test("langId picks the language with most stopword hits") {
    val got = Seq(
      "the cat sat of the mat and that is that",
      "el gato que y en un es la casa").toDF("text")
      .select(Text.langId(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(got === Seq("en", "es"))
  }

  test("tokenCount and quality metrics") {
    val q = Seq("hello world!!").toDF("text")
      .select(Text.tokenCount(col("text")).as("n"),
        Text.qualityScore(col("text")).as("q"))
    val row = q.select(col("n"), col("q.punct_ratio")).as[(Int, Double)]
      .head()
    assert(row._1 === 2)
    assert(row._2 > 0.0 && row._2 < 0.5)
  }

  test("exactFingerprint is stable under case/punct noise") {
    val fps = Seq("Hello World", "hello, world!").toDF("text")
      .select(Text.exactFingerprint(col("text")).as("f"))
      .as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("redactPii replaces emails, IPs, and phone runs, keeps prose") {
    val out = Seq(
      "mail a.b+c@test.org or call +1 (555) 123-4567 from 10.0.0.12 now")
      .toDF("text")
      .select(Text.redactPii(col("text"))).as[String].head()
    assert(out ===
      "mail <EMAIL> or call <PHONE> from <IP> now")
  }

  test("stratifiedSample keeps deterministic per-stratum subsets") {
    val docs = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "lang")
    val kept = Text.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0, "zh" -> 0.1))
      .as[(Long, String)].collect()
    val (en, zh) = kept.partition(_._2 == "en")
    assert(en.length === 200, "rate 1.0 keeps the whole stratum")
    assert(zh.length > 0 && zh.length < 60, s"~10% of 200, got ${zh.length}")
    // rerun yields the identical row set (no RNG)
    val again = Text.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0, "zh" -> 0.1)).as[(Long, String)].collect()
    assert(again.toSet === kept.toSet)
  }

  test("shingleSpans keeps duplicates in order; ≡ HOF slice reference") {
    val texts = Seq("a b c a b c a b", "x y", "", "p q r s")
    val rows = texts.toDF("text").select(
      Text.shingleSpans(Text.tokens(col("text")), 3).as("native"),
      // reference: one slice per window start (interpreted, test-only);
      // sequence(1, n) DESCENDS for n < 1, so short docs need the guard
      when(size(Text.tokens(col("text"))) >= 3,
        transform(sequence(lit(1), size(Text.tokens(col("text"))) - 2),
          i => concat_ws(" ", slice(Text.tokens(col("text")), i, lit(3)))))
        .otherwise(array().cast("array<string>"))
        .as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, r) => assert(n === r) }
    // the first text repeats "a b c": spans keep both occurrences where
    // the distinct shingle view collapses them
    val first = rows.head._1
    assert(first.count(_ == "a b c") === 2)
  }

  test("dupSpans flags cross-doc spans only, not within-doc repeats") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),        // shares "alpha beta gamma" w/ 2
      (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta zeta eta theta"), // repeats internally only
      (4L, "one two")                // shorter than k → zero windows
    ).toDF("doc_id", "text")
    val got = Text.dupSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))  // windows: abg, bgd; abg shared
    assert(got(2L) === ((2L, 1L, 0.5)))
    // doc 3's repeated span lives in ONE doc → ndocs=1 → not duplicated
    assert(got(3L) === ((4L, 0L, 0.0)))
    // short docs stay in the report with zero counts (the every-doc
    // contract spanScrub keeps), never vanish
    assert(got(4L) === ((0L, 0L, 0.0)))
  }

  test("percentileGate keeps rows at/above the per-group threshold") {
    // group g has values 0..99 → p75 threshold = 74.25 → keeps 75..99
    val rows = (0 until 100).map(i => ("g", i.toDouble)) ++
      (0 until 10).map(i => ("h", i.toDouble))
    val df = rows.toDF("grp", "m")
    val kept = Text.percentileGate(df, "grp", col("m"), 0.75)
      .as[(String, Double)].collect()
    val g = kept.filter(_._1 == "g").map(_._2).sorted
    assert(g.head === 75.0 && g.length === 25)
    // h: 0..9 → p75 = 6.75 → keeps 7, 8, 9
    val h = kept.filter(_._1 == "h").map(_._2).sorted
    assert(h.toSeq === Seq(7.0, 8.0, 9.0))
  }

  test("bm25TopK ranks tf-rich short docs first; scores decrease") {
    val docs = Seq(
      (1L, "spark spark spark join"),       // dense in query terms
      (2L, "spark alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma"),              // no query terms → absent
      (4L, "join join spark spark")
    ).toDF("doc_id", "text")
    val got = Text.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join"), k = 10)
      .as[(Long, Double)].collect()
    assert(!got.map(_._1).contains(3L))
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    // doc 4 (2×spark + 2×join, dl 4) must outscore doc 2 (1×spark, dl 9)
    val score = got.toMap
    assert(score(4L) > score(2L))
  }

  test("rrfFuse: consensus docs outrank single-list docs; ties by id") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "rank")
    val got = Text.rrfFuse(Seq(a, b), "doc_id", "rank", k0 = 60,
      topK = 10).as[(Long, Double, Long)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // exact RRF sums
    assert(math.abs(byId(20L)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(byId(20L)._3 === 2L && byId(30L)._3 === 1L)
    // both-list docs above any single-list doc here
    val order = got.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    assert(order.take(2).toSet === Set(10L, 20L))
    // 30 (rank 3 in a) and 40 (rank 2 in b): 1/62 > 1/63
    assert(order.indexOf(40L) < order.indexOf(30L))
  }

  test("dupSpans ≡ per-doc recount against a reference fold") {
    // random docs over a tiny vocab (collisions guaranteed); recompute
    // the expected stats with plain Scala collections and compare
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("a", "b", "c", "d")
    val genDocs: Gen[List[String]] = Gen.listOfN(12,
      Gen.choose(0, 8).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    (0 until 10).foreach { i =>
      genDocs(Gen.Parameters.default, Seed(i.toLong)).foreach { texts =>
        val docs = texts.zipWithIndex
          .map { case (t, id) => (id.toLong, t) }
        val k = 2
        def windows(t: String): Seq[String] = {
          val toks = t.split("\\s+").filter(_.nonEmpty)
          toks.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSeq
        }
        val wmap = docs.map { case (id, t) => id -> windows(t) }.toMap
        val docsPerSpan = wmap.toSeq
          .flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
          .groupBy(_._1).map { case (w, xs) => w -> xs.size }
        val expected = wmap.map { case (id, ws) =>
          val dup = ws.count(w => docsPerSpan(w) >= 2)
          id -> ((ws.size.toLong, dup.toLong))
        }
        val got = Text.dupSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
          .select("doc_id", "n_windows", "n_dup_windows")
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === expected)
      }
    }
  }

  test("tfidfCosinePairs prefix filter is LOSSLESS vs naive all-pairs") {
    // the core claim of the AllPairs rewrite: candidates from the
    // suffix-norm prefix join + per-row bound produce EXACTLY the
    // naive postings-self-join result. Random corpora over a small
    // vocab force heavy term sharing (every pair co-occurs — the shape
    // where a lossy prefix would drop true pairs); weights/norms/cos
    // are recomputed in plain Scala with the same integer snap
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val genDocs: Gen[List[String]] = Gen.listOfN(10,
      Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    var tested = 0
    (0 until 12).foreach { i =>
      genDocs(Gen.Parameters.default, Seed(100L + i)).foreach { texts =>
        val toks = texts.zipWithIndex.map { case (t, id) =>
          id.toLong -> t.split("\\s+").toSeq
        }
        val n = toks.size
        val tf = toks.map { case (id, ts) =>
          id -> ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
        }.toMap
        val df = tf.values.flatMap(_.keys).groupBy(identity).view
          .mapValues(_.size).toMap
        // a token in EVERY doc has weight 0; an all-zero doc's cosine
        // is NaN with engine-specific compare semantics — out of scope
        // for the losslessness property, so skip those corpora
        if (!df.values.exists(_ == n)) {
          tested += 1
          val w = tf.map { case (id, m) =>
            id -> m.map { case (tok, f) =>
              tok -> math.round(f * math.log(n.toDouble / df(tok)) * 1e4)
            }
          }
          val n2 = w.view.mapValues(
            _.values.map(x => BigInt(x) * BigInt(x)).sum).toMap
          val expected = (for {
            a <- 0L until n; b <- (a + 1) until n
            dot = w(a).keySet.intersect(w(b).keySet).toSeq
              .map(t => BigInt(w(a)(t)) * BigInt(w(b)(t))).sum
            cos = dot.toDouble /
              (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))
            if cos >= 0.5
          } yield (a, b) -> round6(cos)).toMap
          val got = Text.tfidfCosinePairs(
            texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
              .toDF("doc_id", "text"),
            "doc_id", "text", maxDfFrac = 1.0, threshold = 0.5)
            .as[(Long, Long, Double)].collect()
            .map(r => (r._1, r._2) -> r._3).toMap
          assert(got === expected, s"seed ${100 + i}")
        }
      }
    }
    assert(tested >= 6, s"too many corpora skipped: $tested of 12")
  }

  test("weightedSample matches the A-ES formula computed on the driver") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 3}", 50L + i * 7 % 400))
    val df = rows.toDF("doc_id", "stratum", "w")
    val got = Text.weightedSample(df, col("doc_id"), col("w"),
      col("stratum"), k = 10)
      .as[(Long, String, Long)].collect().toSet
    // driver-side replica: u from the md5 prefix, key = -ln(u)/w
    def key(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val h = java.lang.Long.parseLong(hex, 16)
      -math.log((h.toDouble + 0.5d) / 4294967296.0d) / w.toDouble
    }
    val expected = rows.groupBy(_._2).values.flatMap(g =>
      g.sortBy(r => (key(r._1, r._3), r._1)).take(10)).toSet
    assert(got === expected)
    // reproducible under any physical layout
    val again = Text.weightedSample(df.repartition(7), col("doc_id"),
      col("w"), col("stratum"), k = 10)
      .as[(Long, String, Long)].collect().toSet
    assert(again === got)
  }

  test("domainCap keeps ≤cap rows per domain, deterministically") {
    val docs = (0L until 100L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val kept = Text.domainCap(docs, "doc_id", "source", cap = 10)
      .as[(Long, String)].collect()
    assert(kept.length === 30)
    assert(kept.groupBy(_._2).values.forall(_.length == 10))
    val again = Text.domainCap(docs.repartition(7), "doc_id", "source",
      cap = 10).as[(Long, String)].collect()
    assert(again.toSet === kept.toSet, "partitioning-independent selection")
    // a domain under the cap passes through whole
    val small = Text.domainCap(docs.filter(col("doc_id") < 5), "doc_id",
      "source", cap = 10).count()
    assert(small === 5)
  }

  test("domainCap past the WindowGroupLimit threshold: offset-lift, " +
    "same selection") {
    // above spark.sql.window.group.limit.threshold Spark cannot compile
    // the rank filter to a WindowGroupLimit, so the cap must auto-route
    // through groupedPrefixSum — identical kept set, identical schema,
    // and NO window partitioned solely by the domain over corpus data
    val docs = (0L until 200L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val expected = Text.domainCap(docs, "doc_id", "source", cap = 40)
      .select("doc_id").as[Long].collect().toSet
    spark.conf.set("spark.sql.window.group.limit.threshold", "10")
    try {
      val offending = graft.PlanGuards.sourceOnlyWindows(spark, "source") {
        val routed = Text.domainCap(docs, "doc_id", "source", cap = 40)
        assert(routed.columns.toSeq === docs.columns.toSeq)
        assert(routed.select("doc_id").as[Long].collect().toSet
          === expected)
      }
      assert(offending.isEmpty,
        s"big-cap path ran a domain-partitioned window over corpus " +
          s"data:\n${offending.mkString("\n")}")
    } finally
      spark.conf.unset("spark.sql.window.group.limit.threshold")
  }

  test("domainCap offset-lift gates on group cardinality: many tiny " +
    "domains fall back to the plain window") {
    // the offset-lift broadcasts a #domains × #partitions offsets frame
    // — sound only in the few-huge-groups regime. 200k one-row domains
    // put the estimate past the 2^22 ceiling at any partition count the
    // suite runs with, so the auto-route must keep the plain window
    // (slow-but-safe: with no dominant domain there is no straggler).
    val docs = spark.range(200000L)
      .select(col("id").as("doc_id"),
        concat(lit("dom"), col("id")).as("source"))
    spark.conf.set("spark.sql.window.group.limit.threshold", "10")
    try {
      val capped = Text.domainCap(docs, "doc_id", "source", cap = 40)
      assert(!capped.queryExecution.optimizedPlan.toString
          .contains("spark_partition_id"),
        "high-cardinality domain column took the offset-lift " +
          "broadcast path")
      // selection semantics unchanged: every 1-doc domain survives
      assert(capped.count() === 200000L)
    } finally
      spark.conf.unset("spark.sql.window.group.limit.threshold")
  }

  test("tokenBudgetMix past the threshold: distributed running sum, " +
    "same prefix") {
    val docs = (0L until 40L).map(i =>
      (i, s"src${i % 4}", Seq.fill((i % 5).toInt + 1)("tok").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val expected = Text.tokenBudgetMix(docs, "doc_id", "text", "source",
        8L)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    spark.conf.set("spark.sql.window.group.limit.threshold", "5")
    try {
      val offending = graft.PlanGuards.sourceOnlyWindows(spark, "source") {
        val routed = Text.tokenBudgetMix(docs, "doc_id", "text",
          "source", 8L)
        assert(routed.columns.takeRight(2).toSeq
          === Seq("n_tokens", "cum_tokens"))
        assert(routed.select("doc_id", "source", "n_tokens", "cum_tokens")
          .as[(Long, String, Long, Long)].collect().toSet === expected)
      }
      assert(offending.isEmpty,
        s"big-budget path ran a source-partitioned window over corpus " +
          s"data:\n${offending.mkString("\n")}")
    } finally
      spark.conf.unset("spark.sql.window.group.limit.threshold")
  }

  test("tokenBudgetMix keeps the md5-order prefix within each budget") {
    // doc i has i%5+1 tokens; budget 8 per source
    val docs = (0L until 40L).map(i =>
      (i, s"src${i % 4}", Seq.fill((i % 5).toInt + 1)("tok").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Text.tokenBudgetMix(docs, "doc_id", "text", "source", 8L)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    // replicate: per source, sort by (md5(id), id), prefix while cum <= 8
    def h(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (0L until 40L).map(i => (i, s"src${i % 4}", i % 5 + 1))
      .groupBy(_._2).values.flatMap { g =>
        val sorted = g.sortBy(r => (h(r._1), r._1))
        val cums = sorted.scanLeft(0L)(_ + _._3).tail
        sorted.zip(cums).takeWhile(_._2 <= 8L)
          .map { case ((id, src, n), c) => (id, src, n, c) }
      }.toSet
    assert(got.toSet === expected)
    assert(got.groupBy(_._2).values.forall(_.map(_._3).sum <= 8L))
    // layout-independent
    val again = Text.tokenBudgetMix(docs.repartition(7), "doc_id", "text",
      "source", 8L).select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    assert(again.toSet === got.toSet)
    // boundary: a cum landing EXACTLY on the budget is kept (<=); a
    // budget below every doc length yields an empty (defined) result
    val two = Seq((1L, "s", "a b c"), (2L, "s", "d e f"))
      .toDF("doc_id", "source", "text")
    val exact = Text.tokenBudgetMix(two, "doc_id", "text", "source", 6L)
    assert(exact.count() === 2L, "cum == budget keeps the boundary doc")
    val tiny = Text.tokenBudgetMix(two, "doc_id", "text", "source", 2L)
    assert(tiny.count() === 0L)
    // NULL-text docs are excluded and must NOT consume rank slots: with
    // budget 3, the NULL doc (whatever its md5 rank) cannot displace
    // either real doc from the prefix cut
    val withNull = Seq((1L, "s", "a b c"), (2L, "s", null),
      (3L, "s", "d e f")).toDF("doc_id", "source", "text")
    val kept = Text.tokenBudgetMix(withNull, "doc_id", "text", "source",
      3L).select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(2L) && kept.size === 1,
      s"one real doc fits the 3-token budget, the NULL doc never: $kept")
  }

  test("graft_nfc composes decomposed forms; cleanText canonicalizes") {
    // decomposed e + U+0301 composes to the single-codepoint é
    val nfc = Seq("cafe\u0301").toDF("s")
      .select(call_function("graft_nfc", col("s")).as("n"))
      .as[String].head()
    assert(nfc === "café" && nfc.length === 4)
    // already-NFC input is unchanged (fast path)
    val id = Seq("plain ascii", "café").toDF("s")
      .select(call_function("graft_nfc", col("s")).as("n"))
      .as[String].collect()
    assert(id === Array("plain ascii", "café"))
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(call_function("graft_nfc", col("s")).as("n"))
      .collect().head
    assert(n.isNullAt(0))
    // cleanText: NFC + control/format strip + whitespace collapse + trim
    val cleaned = Seq("\u0007 a\u0301b\u200b  c \t d \u0000")
      .toDF("s").select(Text.cleanText(col("s")).as("c"))
      .as[String].head()
    assert(cleaned === "áb c d")
  }

  test("phraseSearch counts aligned positional matches, incl. overlap") {
    val docs = Seq(
      (1L, "the quick brown fox and the quick brown dog"),
      (2L, "quick the brown"),       // terms present, order wrong
      (3L, "a a a a"),               // overlapping self-phrase
      (4L, "nothing here"))
      .toDF("doc_id", "text")
    val got = Text.phraseSearch(docs, "doc_id", "text", "the quick brown")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L), s"unexpected: $got")
    val overlap = Text.phraseSearch(docs, "doc_id", "text", "a a")
      .as[(Long, Long)].collect().toMap
    assert(overlap === Map(3L -> 3L), "overlapping starts all count")
    // punctuation/case in the phrase normalizes like document text
    val norm = Text.phraseSearch(docs, "doc_id", "text", "The QUICK, brown!")
      .as[(Long, Long)].collect().toMap
    assert(norm === Map(1L -> 2L))
  }

  test("sourceOverlap computes asymmetric containment per source pair") {
    // A: 2 shingles {a b c, b c d}; B: 3 shingles, shares both of A's;
    // C: disjoint → its pairs appear at ZERO (a matrix cell that is
    // absent is indistinguishable from "not computed")
    val docs = Seq(
      ("A", "a b c d"),
      ("B", "a b c d e"),
      ("C", "x y z w"))
      .toDF("source", "text")
    val got = Text.sourceOverlap(docs, "source", "text", k = 3)
      .select("src_a", "src_b", "n_shared", "containment")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      ("A", "B") -> ((2L, 1.0)),      // all of A appears in B
      ("B", "A") -> ((2L, 0.666667)), // 2 of B's 3
      ("A", "C") -> ((0L, 0.0)), ("C", "A") -> ((0L, 0.0)),
      ("B", "C") -> ((0L, 0.0)), ("C", "B") -> ((0L, 0.0))))
  }

  test("spanScrub cuts shared spans, unions overlaps, keeps the rest") {
    // docs 1+2 share "p q r s"; doc 1 additionally overlaps it with
    // "q r s t" shared with doc 3 → doc 1 removes the UNION p..t
    val docs = Seq(
      (1L, "a b p q r s t c"),
      (2L, "x p q r s y"),
      (3L, "q r s t z z2 z3"),
      (4L, "all alone here nothing shared"))
      .toDF("doc_id", "text")
    val got = Text.spanScrub(docs, "doc_id", "text", k = 4)
      .select("doc_id", "n_tokens", "n_removed", "scrubbed")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((8L, 5L, "a b c")))
    assert(got(2L) === ((6L, 4L, "x y")))
    assert(got(3L) === ((7L, 4L, "z z2 z3")))
    assert(got(4L) === ((5L, 0L, "all alone here nothing shared")))
    // a doc that is ONE shared span scrubs to empty, not a missing row
    val all = Seq((1L, "p q r s"), (2L, "p q r s"))
      .toDF("doc_id", "text")
    val empty = Text.spanScrub(all, "doc_id", "text", 4)
      .select("n_removed", "scrubbed").as[(Long, String)].collect()
    assert(empty.forall(_ === ((4L, ""))))
  }

  test("gopherFlags computes rule metrics and the conjunctive verdict") {
    val good = ("the cat and the dog have fun with all of that " * 5).trim
    val short_ = "the of and"
    val symbols = "the of # ... # ... # ... and # that with have be"
    val numeric = "the of and that " + (1 to 60).map(_.toString)
      .mkString(" ")
    val rows = Seq((1L, good), (2L, short_), (3L, symbols), (4L, numeric))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.gopherFlags(col("text"),
        minWords = 10).as("g"))
      .select(col("doc_id"), col("g.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"),
      s"clean prose passes: ${rows(1L)}")
    assert(!rows(2L).getAs[Boolean]("keep"), "below the word-count floor")
    assert(!rows(3L).getAs[Boolean]("keep"), "symbol ratio above 0.1")
    assert(rows(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!rows(4L).getAs[Boolean]("keep"), "alpha fraction below 0.8")
    assert(rows(4L).getAs[Double]("alpha_frac") < 0.8)
    assert(rows(1L).getAs[Int]("n_stop") >= 2)
  }

  test("stripBoilerplate drops cross-doc chunks, keeps document order") {
    // chunk width 2: "subscribe now" is in all 3 docs → boilerplate at
    // minDocs=3; "alpha beta" repeats within doc 1 only → kept (df
    // counts DISTINCT docs, not occurrences)
    val docs = Seq(
      (1L, "alpha beta subscribe now alpha beta gamma delta"),
      (2L, "subscribe now epsilon zeta"),
      (3L, "eta theta subscribe now"))
      .toDF("doc_id", "text")
    val got = Text.stripBoilerplate(docs, "doc_id", "text",
      chunkTokens = 2, minDocs = 3)
      .select("doc_id", "n_chunks", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((4L, 1L, "alpha beta alpha beta gamma delta")))
    assert(got(2L) === ((2L, 1L, "epsilon zeta")))
    assert(got(3L) === ((2L, 1L, "eta theta")))
    // a doc that is ALL boilerplate reconstructs to the empty string
    val all = Seq((1L, "subscribe now"), (2L, "subscribe now"))
      .toDF("doc_id", "text")
    val cleaned = Text.stripBoilerplate(all, "doc_id", "text", 2, 2)
      .select("clean_text").as[String].collect()
    assert(cleaned.forall(_ === ""))
    // NULL text keeps its report row (treated as empty), never dropped
    val withNull = Seq((1L, "x y"), (2L, null)).toDF("doc_id", "text")
    val nn = Text.stripBoilerplate(withNull, "doc_id", "text", 2, 2)
    assert(nn.count() === 2L)
    val sn = Text.spanScrub(withNull, "doc_id", "text", 4)
    assert(sn.count() === 2L)
    // trailing partial chunk (length < k) participates like any other
    val part = Seq((1L, "a b c"), (2L, "z z c"), (3L, "q q c"))
      .toDF("doc_id", "text")
    val p = Text.stripBoilerplate(part, "doc_id", "text", 2, 3)
      .filter(col("doc_id") === 1L)
      .select("n_dropped", "clean_text").as[(Long, String)].head()
    assert(p === ((1L, "a b")), "the 1-token tail chunk 'c' is shared")
  }

  test("scriptCounts classifies planted multi-script text") {
    val df = Seq(
      (1L, "hello world 42"),
      (2L, "\u041f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"),     // Cyrillic
      (3L, "\u4f60\u597d\u4e16\u754c \u3053\u3093\u306b\u3061\u306f"),      // CJK + kana
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      Text.scriptCounts(col("text")).as("sc"))
      .select(col("doc_id"), col("sc.n_chars"), col("sc.latin"),
        col("sc.digit"), col("sc.space"), col("sc.cyrillic"),
        col("sc.cjk"), col("sc.other"))
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)]
      .collect().sortBy(_._1)
    assert(got(0) === ((1L, 14, 10, 2, 2, 0, 0, 0)))
    assert(got(1) === ((2L, 10, 0, 0, 1, 9, 0, 0)))
    assert(got(2) === ((3L, 10, 0, 0, 1, 0, 9, 0)))
    assert(got(3) === ((4L, 0, 0, 0, 0, 0, 0, 0))) // null text = empty
  }

  test("rankNormalize keeps the top share per group, ties by id") {
    val df = (1 to 8).map(i => (i.toLong, "s" + (i % 2), i * 10))
      .toDF("doc_id", "source", "score")
    val got = Text.rankNormalize(df, "source", col("score"), "doc_id",
      keepTop = 0.25)
      .as[(Long, String, Int, Double, Boolean)].collect()
    // 4 docs per source, percent_rank in {0, 1/3, 2/3, 1}; keepTop=.25
    // keeps only pct >= 0.75 — the single best doc per source
    assert(got.count(_._5) === 2)
    assert(got.filter(_._5).map(_._1).sorted.toSeq === Seq(7L, 8L))
    // all-tied metric: rank falls back to doc_id order, deterministic
    val tied = (1 to 4).map(i => (i.toLong, "s", 5)).toDF("doc_id", "source", "score")
    val t2 = Text.rankNormalize(tied, "source", col("score"), "doc_id",
      keepTop = 0.5)
      .as[(Long, String, Int, Double, Boolean)].collect()
    assert(t2.filter(_._5).map(_._1).sorted.toSeq === Seq(3L, 4L))
  }

  test("rankNormalize equals the plain window form on skewed groups") {
    import org.apache.spark.sql.expressions.Window
    // one dominant group (70% of rows), several small ones, forced
    // through multiple partitions — the offset-lift must reproduce the
    // single-task window's percent_rank exactly
    val rows = (1 to 700).map(i => (i.toLong, "big", (i * 7) % 53)) ++
      (1 to 300).map(i => ((1000 + i).toLong, "s" + (i % 5), i % 11))
    val df = rows.toDF("doc_id", "source", "score").repartition(7)
    val got = Text.rankNormalize(df, "source", col("score"), "doc_id",
      keepTop = 0.1)
      .as[(Long, String, Int, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score"), col("doc_id"))
    val ref = df.withColumn("pct", round(percent_rank().over(w), 6))
      .select(col("doc_id"), col("pct"),
        (col("pct") >= 0.9).as("keep"))
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === ref)
  }

  test("dataCard computes the datasheet on a hand-built corpus") {
    val docs = Seq(
      (1L, "one two three", "en", "sA"),
      (2L, "one two three", "en", "sA"),   // exact dup of 1
      (3L, "four five", "fr", "sB"),
      (4L, "", "en", "sB"),                // empty
      (5L, null.asInstanceOf[String], "en", "sC")) // null = empty
      .toDF("doc_id", "text", "lang", "source")
    val card = Text.dataCard(docs, "doc_id", "text", "lang", "source")
      .as[(String, Double)].collect().toMap
    assert(card("n_docs") === 5.0)
    // tokens: 3 + 3 + 2 + 0 (empty counts ZERO tokens) + 0 (null)
    assert(card("n_tokens") === 8.0)
    assert(card("n_sources") === 3.0 && card("n_langs") === 2.0)
    assert(card("empty_rate") === 0.4)      // docs 4 and 5
    assert(card("exact_dup_rate") === 0.4)  // 3 distinct texts: null and "" collapse
    assert(card("top_source_share") === 0.4) // sA and sB tie at 2/5
    assert(card("p50_doc_tokens") === 2.0)  // sorted [0,0,2,3,3]
  }

  test("pmiPairs matches a driver replica on a hand-built corpus") {
    val docs = Seq(
      (1L, "new york new york city"),
      (2L, "york new york times"),
      (3L, "city times city new")).toDF("doc_id", "text")
    val window = 2
    // driver replica: same window pairing, same ln-micros rounding
    val toks = Seq(Seq("new", "york", "new", "york", "city"),
      Seq("york", "new", "york", "times"),
      Seq("city", "times", "city", "new"))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val t = toks.map(_.size).sum
    val rawPairs = toks.flatMap(ts => ts.indices.flatMap(i =>
      (i + 1 to math.min(i + window, ts.length - 1)).map(j =>
        if (ts(i) <= ts(j)) (ts(i), ts(j)) else (ts(j), ts(i)))))
    val pc = rawPairs.groupBy(identity).view.mapValues(_.size).toMap
    val p = rawPairs.size
    val want = pc.filter(_._2 >= 2).map { case ((a, b), cab) =>
      (a, b, cab.toLong,
        math.round(math.log((cab * 1e0 * t * t) /
          (p * 1e0 * uni(a) * uni(b))) * 1000000))
    }.toSet
    val got = Text.pmiPairs(docs, "doc_id", "text",
        window = window, minCount = 2, topK = 100)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === want)
    // sanity: the planted collocation ("new","york") must rank high
    assert(pc(("new", "york")) >= 4)
  }

  test("hashingTf matches an md5 driver replica and conserves tokens") {
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 64
    }
    val texts = Map(1L -> Seq("a", "b", "a", "c"),
      2L -> Seq("xyz", "qq", "xyz"))
    val docs = texts.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Text.hashingTf(docs, "doc_id", "text", 64)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).sortBy(_._1)).toMap
    texts.foreach { case (id, ts) =>
      val want = ts.groupBy(bucket).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      assert(got(id) === want, s"doc $id sparse cells")
      assert(got(id).map(_._2).sum === ts.size.toLong,
        s"doc $id token conservation")
    }
  }

  test("kmvOverlap is exact when the sketch holds the whole union") {
    // 1-gram shingles: A={a,b,c,d}, B={c,d,e,f} → J=2/6, union 6
    val docs = Seq(("A", "a b c d"), ("B", "c d e f"))
      .toDF("source", "text")
    val got = Text.kmvOverlap(docs, "source", "text",
        shingleK = 1, k = 16)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("A", "B", 6L, 2L, 333333L, 6L)))
  }

  test("kmvOverlap estimates within the 1/sqrt(k) regime") {
    // two 600-token vocabularies overlapping in 300 → J = 1/3,
    // union 900. Deterministic md5 sketch: the estimate is fixed.
    val a = (0 until 600).map(i => s"w$i").mkString(" ")
    val b = (300 until 900).map(i => s"w$i").mkString(" ")
    val got = Text.kmvOverlap(Seq(("A", a), ("B", b))
        .toDF("source", "text"), "source", "text", shingleK = 1, k = 64)
      .as[(String, String, Long, Long, Long, Long)].head()
    val (kUsed, jMicro, union) = (got._3, got._5, got._6)
    assert(kUsed === 64L)
    assert(math.abs(jMicro / 1e6 - 1.0 / 3) < 0.15,
      s"jaccard estimate off: $jMicro")
    assert(union > 600 && union < 1350, s"union estimate off: $union")
  }

  test("urlFeatures decomposes hosts, domains, paths, and queries") {
    val got = Seq(
      "https://a.blogspot.example.com/en/doc/3?ref=rss&utm=1",
      "http://example.org/",
      "https://localhost/a/b/c/d",
      "https://Example.COM/x?one=1")
      .toDF("url")
      .select(Text.urlFeatures(col("url")).as("f"))
      .select("f.host", "f.domain", "f.tld", "f.path_depth", "f.n_params")
      .as[(String, String, String, Int, Int)].collect().toSeq
    assert(got === Seq(
      ("a.blogspot.example.com", "example.com", "com", 3, 2),
      ("example.org", "example.org", "org", 0, 0),
      ("localhost", "localhost", "localhost", 4, 0),
      ("example.com", "example.com", "com", 1, 1)))
  }
}
