package graft

import graft.Staging._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.graph.{Graph, Walks}
import graft.multimodal.Multimodal
import graft.ops.{analytics, asof, baskets, expectations, exprs, qsketch, rangejoin, sketches, sweepline, timeseries, windows}
import graft.similarity.{LabelEval, Similarity}
import graft.sources.{HtmlTables, Layout, StagedSources}
import graft.streaming.Streams
import graft.text.{Bpe, Importance, Packing, SuffixArray, Text}

/** text analysis, tokenization, quality, corpus mixing/scheduling — the Text slice of the
  * extension surface, split out of [[ExtensionQueries]] (round 12)
  * with zero behavior change: entries are verbatim; shared artifact
  * helpers and oracle CTE fragments stay package-private in
  * [[ExtensionQueries]]. Composed back in [[ExtensionQueries.queries]]
  * / [[ExtensionQueries.oracleSql]]. */
private[graft] object TextQueries {
  import Tables.t
  import ExtensionQueries._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis -----------------------------------------------------
    "q_text_token_stats" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        size(Text.tokenSet(col("text"))).as("n_distinct"),
        Text.bpeishTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).cast("bigint").as("len_chars"))),

    "q_text_langid" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), col("lang"),
        Text.langId(col("text")).as("pred_lang"))),

    // compression-ratio quality signal (functions.DeflateLen): the
    // deflate length itself is zlib-build-specific, so the oracle row
    // carries the portable verdicts — zlib's worst-case bound holds,
    // and natural text ≥100 bytes compresses below 0.9 — while the
    // discriminative behavior (repetitive ≪ prose ≪ noise) is pinned
    // in DeflateLenSpec
    "q_compression_ratio" -> ((s, d) => {
      val tx = coalesce(col("text"), lit(""))
      val nb = octet_length(tx).cast("long")
      val dl = call_function("graft_deflate_len", tx)
      t(s, d, "documents").select(
        col("doc_id"), nb.as("n_bytes"),
        // size-proportional slack: zlib's documented worst case grows
        // with input (compressBound ≈ n + n/1000 + 13 — 5 bytes per
        // stored block), so a flat +64 would under-cover incompressible
        // documents beyond ~50 KB
        (dl <= nb + floor(nb / lit(1000L)).cast("long") + lit(64L))
          .as("ok_bound"),
        (nb < 100L || dl.cast("double") < nb * lit(0.9))
          .as("ok_compresses"))
    }),

    // Unicode-script composition + dominant class — the pre-langid
    // routing signal and mojibake detector (Text.scriptCounts)
    "q_script_mix" -> ((s, d) => {
      val cs = Seq("latin", "digit", "space", "cyrillic", "cjk", "other")
      val sc = t(s, d, "documents")
        .select(col("doc_id"),
          Text.scriptCounts(col("text")).as("sc"))
      val mx = greatest(cs.map(c => col(s"sc.$c")): _*)
      // dominant = FIRST class in fixed order hitting the max count —
      // deterministic, and the same CASE unrolls in the SQL twin
      val dominant = cs.tail.foldLeft(
        when(col(s"sc.${cs.head}") === mx, lit(cs.head))) {
        case (acc, c) => acc.when(col(s"sc.$c") === mx, lit(c))
      }
      sc.select(col("doc_id") +:
        col("sc.n_chars").cast("long").as("n_chars") +:
        cs.map(c => col(s"sc.$c").cast("long").as(c)) :+
        dominant.as("dominant"): _*)
    }),

    "q_text_quality" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("q", Text.qualityScore(col("text")))
        .select(col("doc_id"),
          col("q.n_tokens").cast("bigint").as("n_tokens"),
          graft.ops.analytics.roundDouble(col("q.mean_word_len"), 6).as("mean_word_len"),
          graft.ops.analytics.roundDouble(col("q.punct_ratio"), 6).as("punct_ratio"))),

    "q_text_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        Text.exactFingerprint(col("text")).as("fp_exact"),
        Text.minShingleFingerprint(col("text"), 3).as("fp_minshingle"),
        Text.rollingFingerprint(col("text")).as("fp_rolling"))),

    // per-language top-quartile cut on mean word length — the
    // percentile-gate corpus filter (threshold = exact interpolated p75)
    "q_quality_gate" -> ((s, d) =>
      Text.percentileGate(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          col("text")),
        "lang",
        Text.qualityScore(col("text")).getField("mean_word_len"),
        p = 0.75)
        .select("doc_id", "lang")),

    // BM25 lexical retrieval: top-20 docs for a fixed query bag
    "q_bm25_topk" -> ((s, d) =>
      Text.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("spark", "vector", "window", "join"), k = 20)),

    // hybrid retrieval: BM25 top-20 and brute-force ANN top-20 (query =
    // vector 0; doc_id ↔ vec_id is the testdata's 1:1 key) fused by
    // reciprocal rank — the lexical+vector consensus a RAG/retrieval
    // pipeline serves
    "q_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bm25 = Text.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("spark", "vector", "window", "join"), k = 20)
        // rank over the (rounded) returned score — 20 rows, so the
        // unpartitioned window is a constant-size frame
        .withColumn("rank", row_number().over(
          Window.partitionBy(graft.ops.windows.boundedGlobal(col("doc_id")))
            .orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val emb = t(s, d, "embeddings")
      val ann = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === 0), emb, k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rnk").as("rank"))
      Text.rrfFuse(Seq(bm25, ann), "doc_id", "rank", k0 = 60, topK = 15)
    }),

    // ---- train/val/test split ---------------------------------------------
    "q_train_split" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("bucket", Text.splitBucket(col("doc_id"), 100))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"))),

    // ---- DSIR importance scoring (select-like-the-target) -----------------
    "q_dsir_score" -> ((s, d) =>
      Importance.dsirScoreMicro(t(s, d, "documents"), "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 256)
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(100)),

    // ---- model-based language/quality classification ----------------------
    // train multinomial NB on the md5-half of docs, batch-score ALL of
    // them — the learned counterpart of the heuristic q_text_langid
    "q_nb_langid" -> ((s, d) =>
      Importance.naiveBayes(t(s, d, "documents"), "doc_id", "text",
        labelCol = "lang",
        trainPred = Text.splitBucket(col("doc_id"), 100) < 50,
        buckets = 256)),

    // ---- per-source distribution drift (KL vs the corpus) -----------------
    "q_source_kl" -> ((s, d) =>
      Importance.sourceDivergence(t(s, d, "documents"), "source", "text",
        buckets = 256)),

    // ---- weighted sampling without replacement (A-ES) ---------------------
    // length-weighted reproducible draw of 20 docs per language
    "q_weighted_sample" -> ((s, d) =>
      Text.weightedSample(t(s, d, "documents"), col("doc_id"),
          col("n_chars"), col("lang"), k = 20)
        .select("doc_id", "lang", "n_chars")),

    // PII scrub over text seeded with one of each PII kind (the synthetic
    // corpus has none of its own), so all three patterns are exercised
    "q_text_redact" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Text.redactPii(concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com at ip "),
          pmod(col("doc_id"), lit(256)), lit(".0.0.1 tel +1 555-123-4567")))
          .as("redacted"))),

    "q_stratified_sample" -> ((s, d) =>
      Text.stratifiedSample(t(s, d, "documents"), col("doc_id"),
        col("lang"), Map("en" -> 0.9, "de" -> 0.5, "es" -> 0.5,
          "fr" -> 0.25, "zh" -> 0.1))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("n_chars"))),

    "q_corpus_prep" -> ((s, d) =>
      graft.pipelines.Pipelines.corpusPrep(s, d)),

    "q_corpus_prep2" -> ((s, d) =>
      graft.pipelines.Pipelines.corpusPrep2(s, d)),

    // data-constrained mixing plan (Muennighoff et al. '23): waterfill
    // milli-epochs across sources under a 63k-token budget with
    // per-source repeat ceilings (2 or 3 epochs by source-name length) —
    // closed-form breakpoint scan via the distributed prefix sum, exact
    // integer/decimal arithmetic
    "q_epoch_waterfill" -> ((s, d) =>
      graft.text.Mixing.epochWaterfill(
        t(s, d, "documents")
          .groupBy(col("source"))
          .agg(sum(size(split(trim(col("text")), "\\s+")))
            .cast("long").as("n_toks"))
          .withColumn("cap_milli",
            ((length(col("source")) % 3 + 1) * 1000).cast("long")),
        "source", "n_toks", "cap_milli", budgetTokens = 63000L)
        .orderBy("source")),

    // deterministic stride-interleaved training order: every prefix of
    // the schedule holds every source at its corpus proportion ±O(1) —
    // integer stride keys (k·T DIV n_s), md5 within-source order, the
    // global position from the distributed prefix sum
    "q_stride_schedule" -> ((s, d) =>
      graft.text.Mixing.strideSchedule(
        t(s, d, "documents").select("doc_id", "source"),
        "source", "doc_id")
        .orderBy("global_pos")),

    // per-source ceiling on the pretraining mix: ≤20 docs per domain,
    // deterministic md5-rank selection
    "q_domain_cap" -> ((s, d) =>
      Text.domainCap(t(s, d, "documents"), "doc_id", "source", cap = 20)
        .select("doc_id", "source")),

    // per-source TOKEN quota (docs differ in length, so a doc cap is the
    // wrong mix unit): md5-order prefix per source until 900 tokens
    "q_token_budget_mix" -> ((s, d) =>
      Text.tokenBudgetMix(t(s, d, "documents"), "doc_id", "text",
          "source", budgetTokens = 900L)
        .select("doc_id", "source", "n_tokens", "cum_tokens")),

    "q_corpus_stats" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").select(col("n_chars")).as[Long]
        .select(graft.functions.CorpusStats.lengthStats.toColumn)
        .toDF()
    }),

    // ---- sequence packing (concat-then-chunk into context windows) --------
    "q_pack_sequences" -> ((s, d) =>
      Packing.packManifest(
        t(s, d, "documents").select(col("doc_id"),
          Text.bpeishTokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", maxLen = 2048)),

    // ---- unigram log-probability (perplexity-filter stand-in) -------------
    // two passes over one staged token frame: corpus unigram frequencies,
    // then a shuffle join back on token. Per-token logprobs are quantized
    // to integer micros BEFORE summing so the per-doc sum is independent
    // of float addition order (and of the 1-ulp ln() divergence between
    // engines).
    "q_unigram_logprob" -> ((s, d) => {
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .stage()
      val freq = tf.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val n = tf.agg(count(lit(1)).cast("double").as("n_total"))
      tf.join(freq, Seq("tok"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"),
          round(log(col("cnt").cast("double") / col("n_total")) * 1e6)
            .cast("long").as("lp_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("lp_micro")).as("lp_sum_micro"))
        .withColumn("avg_logprob",
          graft.ops.analytics.roundDouble(col("lp_sum_micro") / lit(1e6) / col("n_tokens"), 4))
    }),

    // per-doc token-distribution Shannon entropy — the "repeated-token
    // junk" axis of quality scoring (low entropy = keyword stuffing /
    // boilerplate). H = ln n − (Σ c·ln c)/n, with ln c snapped to
    // integer micros per distinct token so the weighted sum is exact
    // and order-independent. Two partial-agg shuffles, scan-local math.
    // URL decomposition on deterministic synthetic URLs (the corpus
    // carries no url column): host / registrable domain / tld / path
    // depth / param count — the domainCap + quality-prior grouping keys
    "q_url_features" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/doc/"), (col("doc_id") % 50).cast("string"),
            when(col("doc_id") % 3 === 0, lit("?ref=rss&utm=1"))
              .when(col("doc_id") % 3 === 1, lit("?ref=feed"))
              .otherwise(lit(""))).as("url"))
        .select(col("doc_id"), Text.urlFeatures(col("url")).as("f"))
        .select(col("doc_id"), col("f.host").as("host"),
          col("f.domain").as("domain"), col("f.tld").as("tld"),
          col("f.path_depth").as("path_depth"),
          col("f.n_params").as("n_params"))),

    // sliding-window PMI collocations — the word2vec/SGNS-shaped
    // association score; window-bounded pair join, corpus totals baked
    // in as driver scalars, ln at the integer-micros boundary
    "q_pmi_pairs" -> ((s, d) =>
      Text.pmiPairs(t(s, d, "documents"), "doc_id", "text",
        window = 2, minCount = 5, topK = 50)),

    "q_text_entropy" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          sum(expr("cast(round(ln(c) * 1000000) as bigint) * c"))
            .as("clnc_micro"))
        .select(col("doc_id"), col("n_tokens"),
          (round((log(col("n_tokens").cast("double")) -
            col("clnc_micro") / lit(1e6) / col("n_tokens")) * 1e4) / 1e4)
            .as("entropy"))),

    // interpolated bigram LM score — one rung above q_unigram_logprob,
    // the shape of a CCNet/KenLM-style perplexity filter: p(w2|w1) =
    // 0.7·bigram MLE + 0.3·unigram backoff, scored against the corpus's
    // own counts. Integer-micros at the ln boundary (associative sums);
    // the token/bigram/vocab frames are each staged once and reused.
    "q_bigram_logprob" -> ((s, d) =>
      Text.bigramLogprobMicro(t(s, d, "documents"), "doc_id", "text")
        .withColumn("avg_logprob",
          round((col("lp_sum_micro") / lit(1e6) / col("n_bigrams"))
            * 1e4) / 1e4)),

    // CCNet head/middle/tail cut of the same bigram LM score: exact
    // distributed rank (range sort + zipWithIndex), integer tercile
    // cutoffs — no interpolated threshold to diverge cross-engine
    "q_ppl_buckets" -> ((s, d) =>
      Text.perplexityBuckets(t(s, d, "documents"), "doc_id", "text")),

    // ---- sliding-window chunking (tokenize-and-chunk with overlap) --------
    "q_chunk_overlap" -> ((s, d) =>
      Packing.chunkWindows(
        t(s, d, "documents").select(col("doc_id"),
          Text.tokens(col("text")).as("toks")),
        "doc_id", "toks", width = 64, stride = 48)),

    // ---- chunk-granularity corpus dedup (CCNet-style first-occurrence) ----
    // segment → hash → keep first (doc_id, chunk_idx) per hash → per-doc
    // retention. One shuffle on the chunk hash, one on doc_id.
    "q_chunk_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val chunks = Packing.chunkWindows(
        t(s, d, "documents").select(col("doc_id"),
          Text.tokens(col("text")).as("toks")),
        "doc_id", "toks", width = 32, stride = 32)
      val wH = Window.partitionBy(md5(col("chunk_text")))
        .orderBy(col("doc_id"), col("chunk_idx"))
      chunks
        .withColumn("kept",
          (row_number().over(wH) === 1).cast("int").cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"), sum(col("kept")).as("n_kept"))
        .withColumn("kept_ratio",
          graft.ops.analytics.roundDouble(col("n_kept") / col("n_chunks"), 6))
    }),

    // ---- corpus mixing: reweight languages to an equal-share target -------
    // per-lang keep thresholds derived entirely in INTEGER math from the
    // observed counts (floor(equal_share·10⁴ / n_l) md5-buckets of 10⁴),
    // so the kept set is deterministic across runs, engines, and
    // partitionings — the reproducibility a training-mix spec needs.
    "q_corpus_mix" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n_orig"))
      val tot = byLang.agg(sum(col("n_orig")).as("n_total"),
        count(lit(1)).as("n_langs"))
      val thresholds = byLang.crossJoin(broadcast(tot))
        .withColumn("threshold",
          least(lit(10000L),
            expr("((n_total div n_langs) * 10000) div n_orig")))
        .select("lang", "n_orig", "threshold")
      val kept = docs
        .join(broadcast(thresholds), Seq("lang"))
        .filter(Text.splitBucket(col("doc_id"), 10000) < col("threshold"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      thresholds.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_orig"), col("threshold"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    }),

    // ---- temperature-based resampling (the n^α multilingual rule) ---------
    // keep probability ∝ (n_l)^0.7 share of a T-doc target — upweights
    // low-resource languages relative to proportional sampling without
    // the distortion of equal-share (q_corpus_mix). The pow/normalize
    // happens in doubles but snaps to integer micros BEFORE the
    // threshold math, so the kept set stays engine-exact; thresholds
    // are md5 buckets of 10⁴ like every deterministic sampler here.
    "q_tempered_mix" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val byLang = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_orig"))
        // snap each pow to micros BEFORE summing: the total becomes an
        // integer sum (associative, partition-order-free) instead of an
        // order-dependent double agg that could differ from the
        // oracle's summation order in the last ulp
        .withColumn("w_micro",
          round(pow(col("n_orig").cast("double"), 0.7d) * 1e6)
            .cast("long"))
      val tot = byLang.agg(
        sum(col("w_micro")).as("wt_micro"),
        sum(col("n_orig")).as("n_total"))
      val thresholds = byLang.crossJoin(broadcast(tot))
        .withColumn("share_micro",
          round(col("w_micro").cast("double") /
            col("wt_micro").cast("double") * 1e6).cast("long"))
        // target T = n_total/2 docs overall; per-lang quota in integer
        // math from the snapped share. (T·share·10⁴) div (10⁶·n) reduces
        // exactly to (T·share) div (100·n) — same rational, same floor —
        // which keeps the product inside long range up to 10¹² docs
        .withColumn("threshold",
          least(lit(10000L), expr(
            "((n_total div 2) * share_micro) div (100 * n_orig)")))
        .select("lang", "n_orig", "share_micro", "threshold")
      val kept = docs
        .join(broadcast(thresholds), Seq("lang"))
        .filter(Text.splitBucket(col("doc_id"), 10000) < col("threshold"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      thresholds.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_orig"), col("share_micro"),
          col("threshold"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    }),

    // ---- vocabulary coverage curve --------------------------------------------
    // smallest frequency-ranked vocabulary prefix covering 50/90/95/99%
    // of token mass — the corpus-planning number behind vocab sizing and
    // OOV budgeting. The running sum over the distinct-token frame is
    // the DISTRIBUTED two-level prefix sum (at 100 TB the vocabulary is
    // 10⁸–10⁹ rows — a global `Window.orderBy` would funnel all of it
    // through one task)
    "q_vocab_coverage" -> ((s, d) => {
      val freq = t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = freq.agg(sum(col("cnt")).as("n_total"))
      windows.distributedPrefixSum(freq,
          Seq(col("cnt").desc, col("tok")), col("cnt"), "cum", "rk")
        .crossJoin(broadcast(tot)) // one-row totals frame
        .select(col("rk"), col("cum"), col("n_total"),
          explode(array(lit(50), lit(90), lit(95), lit(99))).as("pct"))
        .filter(col("cum") * 100 >= col("n_total") * col("pct"))
        .groupBy("pct")
        .agg(min(col("rk")).cast("long").as("k_tokens"),
          max(col("n_total")).as("n_total"))
        .orderBy("pct")
    }),

    // ---- inter-arrival burstiness ----------------------------------------------
    // per-user gap mean + squared coefficient of variation in integer
    // micros — the temporal-regularity feature behind bot screens (CV²≈1
    // is Poisson, ≪1 metronomic, ≫1 bursty). Whole-second gaps; the
    // two-step floor-div keeps everything inside long arithmetic for
    // per-key spans up to ~3 years
    "q_burstiness" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("sec", expr("unix_micros(ts) div 1000000"))
        .withColumn("g", col("sec") - lag(col("sec"), 1).over(w))
        .filter(col("g").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sx"),
          sum(col("g") * col("g")).as("sxx"))
        .filter(col("sx") > 0)
        .select(col("user_id"), col("n_gaps"),
          expr("(sx * 1000000L) div n_gaps").as("mean_gap_micro"),
          expr("(n_gaps * sxx - sx * sx) div (sx * sx) * 1000000L + " +
            "(((n_gaps * sxx - sx * sx) % (sx * sx)) * 1000000L) " +
            "div (sx * sx)").as("cv2_micro"))
        .orderBy("user_id")
    }),

    // ---- corpus vocabulary: top tokens per language -----------------------
    // explode → two-level agg; the per-(lang, tok) count is map-side
    // combined, the rank is a per-lang window over the (small) distinct
    // vocabulary, never over occurrences
    "q_heavy_hitters" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      t(s, d, "documents")
        .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(Window.partitionBy("lang")
          .orderBy(col("cnt").desc, col("tok").asc)))
        .filter(col("rn") <= 3)
        .drop("rn")
    }),

    // ---- per-doc distinctive terms (tf-idf top-k) -------------------------
    // rank keys are exact integers (tf desc, df asc, tok asc) so the
    // cross-engine row set is deterministic; the tf-idf VALUE is
    // informational, rounded to 4 (ln() may differ in the last ulp
    // between libm implementations). Rank-only window → two-phase
    // WindowGroupLimit, partial top-k before the exchange.
    "q_text_tfidf" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = t(s, d, "documents").count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("tok").asc)
      tf.join(df, Seq("tok"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"),
          graft.ops.analytics.roundDouble(
            col("tf") * log(lit(n.toDouble) / col("df")), 4)
            .as("tfidf"))
    }),

    // ---- sparse all-pairs doc similarity (tf-idf inverted index) ----------
    // every pair with tf-idf cosine ≥ 0.7 over a 1-in-10 doc sample —
    // candidate pairs come from AllPairs PREFIX filtering (each doc's
    // rarest terms, suffix-norm bounded — lossless, Text.tfidfCandidates),
    // so a stop-token's df² posting fan-out never materializes; the
    // exact integer dot is computed only for candidates. maxDfFrac stays
    // 1.0 as a modeling choice (a df cut would empty the synthetic
    // 31-term vocab where every term tops 50% df); the sample keeps the
    // TRUE OUTPUT small — at cos ≥ 0.7 most same-template doc pairs in
    // this corpus genuinely qualify, and output size is irreducible.
    "q_tfidf_pairs" -> ((s, d) =>
      Text.tfidfCosinePairs(
        t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", maxDfFrac = 1.0, threshold = 0.7)),

    // ---- within-doc repetition quality gate -------------------------------
    "q_text_repetition" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Text.repetitionRatio(col("text"), 3).as("rep_ratio"))),

    // ---- vocabulary coverage / OOV rate -----------------------------------
    // two-pass corpus op: vocab = tokens with document frequency >= 10,
    // then per-doc out-of-vocabulary ratio. The vocab side is tiny after
    // the df gate, so AQE broadcasts the coverage join; per-doc
    // accounting is a map-side-combined count
    "q_oov_rate" -> ((s, d) => {
      // staged once: the vocab build AND the coverage join both read the
      // exploded tokens — without the checkpoint the tokenize+explode
      // subtree runs twice (at cluster scale: a staging table)
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .stage()
      val vocab = tf.groupBy("tok")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 10)
        .select(col("tok"), lit(1).as("in_vocab"))
      tf.join(vocab, Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("in_vocab").isNull, 1).otherwise(0)).as("n_oov"))
        .select(col("doc_id"),
          graft.ops.analytics.roundDouble(col("n_oov").cast("double") / col("n_toks"), 6)
            .as("oov_rate"))
    }),

    // CCNet/RefinedWeb-style boilerplate strip: 4-token chunks occurring
    // in >= 3 distinct docs are dropped everywhere, survivors re-join in
    // document order; returns cleaned text + audit counts
    "q_boilerplate_strip" -> ((s, d) =>
      Text.stripBoilerplate(t(s, d, "documents"), "doc_id", "text",
        chunkTokens = 4, minDocs = 3)),

    // canonical cleaning pass: the corpus is re-dirtied deterministically
    // (decomposed accent + a BEL control char spliced into every "table")
    // so the NFC + control-strip + collapse pipeline is exercised for
    // real — both engines inject the identical bytes and must emit the
    // identical canonical text
    "q_text_clean" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Text.cleanText(regexp_replace(col("text"), "table",
          "ta\u0301ble\u0007")).as("clean"))
        .withColumn("n_chars_clean", length(col("clean")))),

    // corpus-level overlap report: containment(a,b) = |Sa∩Sb|/|Sa| over
    // distinct 3-shingles per source — which sources duplicate which
    "q_source_overlap" -> ((s, d) =>
      Text.sourceOverlap(t(s, d, "documents"), "source", "text", k = 3)),

    // hashing-trick term frequencies: vocabulary-free 64-bucket sparse
    // COO rows (doc_id, bucket, tf), engine-portable md5 buckets
    "q_hashing_tf" -> ((s, d) =>
      Text.hashingTf(t(s, d, "documents"), "doc_id", "text",
        numBuckets = 64)
        .orderBy("doc_id", "bucket")),

    // KMV sketch overlap: the mergeable-profile form of source overlap
    // — per-source 128 smallest md5-prefix shingle hashes, pairwise
    // Jaccard + union-cardinality estimates, deterministic on both
    // engines (the error is a property of the hash, not of randomness)
    "q_kmv_overlap" -> ((s, d) =>
      Text.kmvOverlap(t(s, d, "documents"), "source", "text",
          shingleK = 3, k = 128)
        .orderBy("src_a", "src_b")),

    // BPE merge induction, 3 rounds: the corpus is scanned ONCE (word-
    // frequency groupBy); every round then aggregates the vocab table
    // and collects a single argmax row
    "q_bpe_merges" -> ((s, d) =>
      Bpe.bpeTrain(t(s, d, "documents"), "doc_id", "text", rounds = 3)),

    // the apply half of BPE: train 3 merges (vocab-table rounds), then
    // segment the corpus scan-local with the learned replace chain and
    // report the top-20 symbol frequencies — train + tokenize end to end
    "q_bpe_tokenize" -> ((s, d) => {
      val merges = Bpe.bpeTrain(t(s, d, "documents"), "doc_id", "text",
        rounds = 3).orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 1)
        .select(explode(Bpe.bpeSegmentWord(col("w"), merges)).as("sym"))
        .groupBy("sym").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("sym")).limit(20)
    }),

    // Gopher rule report: per-doc metrics + conjunctive keep verdict
    // (word-count band, mean word length, symbol ratio, alpha fraction,
    // distinct-stopword floor)
    "q_gopher_rules" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Text.gopherFlags(col("text"), minWords = 50).as("g"))
        .select(col("doc_id"), col("g.*"))),
  )

  def oracleSql: Map[String, String] = Map(
    "q_text_token_stats" ->
      s"""SELECT doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                 len($dTokens) AS n_distinct,
                 len(regexp_extract_all(lower(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
                 length(text) AS len_chars
          FROM documents""",

    // DuckDB has no deflate: the twin computes the portable half
    // (byte counts) and asserts the verdicts the Spark side derives
    // from the actual compression — hash matches iff both bounds hold
    // for every document. ok_bound is backed by zlib's worst-case
    // guarantee at any input; ok_compresses is a CORPUS-SCOPED quality
    // expectation (natural text ≥100 bytes deflates below 0.9) — on a
    // high-entropy corpus (base64/hex blobs) its failing is the signal
    // working, and the oracle row is expected to flag it
    "q_compression_ratio" ->
      """SELECT doc_id,
                CAST(strlen(COALESCE(text, '')) AS BIGINT) AS n_bytes,
                TRUE AS ok_bound,
                TRUE AS ok_compresses
         FROM documents""",

    // explicit BMP ranges so RE2 (\x{..}) and java.util.regex (\u..)
    // compile the identical character classes; counts are exact ints,
    // dominant is the first class in fixed order reaching the max
    "q_script_mix" ->
      """WITH sc AS (SELECT doc_id, COALESCE(text, '') AS tx
                     FROM documents),
         c AS (SELECT doc_id,
                 CAST(length(tx) AS BIGINT) AS n_chars,
                 CAST(length(tx) - length(regexp_replace(tx,
                   '[A-Za-z]', '', 'g')) AS BIGINT) AS latin,
                 CAST(length(tx) - length(regexp_replace(tx,
                   '[0-9]', '', 'g')) AS BIGINT) AS digit,
                 CAST(length(tx) - length(regexp_replace(tx,
                   '[ \t\n\r]', '', 'g')) AS BIGINT) AS space,
                 CAST(length(tx) - length(regexp_replace(tx,
                   '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT)
                   AS cyrillic,
                 CAST(length(tx) - length(regexp_replace(tx,
                   '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]',
                   '', 'g')) AS BIGINT) AS cjk
               FROM sc),
         o AS (SELECT *,
                 n_chars - latin - digit - space - cyrillic - cjk
                   AS other,
                 greatest(latin, digit, space, cyrillic, cjk,
                   n_chars - latin - digit - space - cyrillic - cjk)
                   AS m
               FROM c)
         SELECT doc_id, n_chars, latin, digit, space, cyrillic, cjk,
                other,
                CASE WHEN latin = m THEN 'latin'
                     WHEN digit = m THEN 'digit'
                     WHEN space = m THEN 'space'
                     WHEN cyrillic = m THEN 'cyrillic'
                     WHEN cjk = m THEN 'cjk'
                     ELSE 'other' END AS dominant
         FROM o""",

    "q_text_langid" -> {
      val langRows = Text.stopwords.toSeq.sortBy(_._1).map {
        case (lang, words) =>
          s"('$lang', [${words.map(w => s"'$w'").mkString(",")}])"
      }.mkString(", ")
      s"""WITH toks AS (SELECT doc_id, lang, $dTokens AS toks
                        FROM documents),
          langs(cand, words) AS (VALUES $langRows),
          scores AS (
            SELECT doc_id, lang, cand,
                   len(list_intersect(toks, words)) AS score
            FROM toks CROSS JOIN langs)
          SELECT doc_id, lang, cand AS pred_lang
          FROM (SELECT doc_id, lang, cand,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, cand ASC) AS rn
                FROM scores)
          WHERE rn = 1"""
    },

    "q_text_quality" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+'))::BIGINT
                  AS n_tokens,
                round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
                  greatest(len(string_split_regex(trim(text), '\s+')), 1),
                  6) AS mean_word_len,
                round((length(text) - length(regexp_replace(text,
                    '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE /
                  greatest(length(text), 1), 6) AS punct_ratio
         FROM documents""",

    // mean_word_len mirrors Text.qualityScore: NON-WHITESPACE chars
    // over greatest(whitespace tokens of the RAW trimmed text, 1)
    "q_quality_gate" ->
      """WITH m AS (
           SELECT doc_id, lang,
                  length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
                    greatest(len(string_split_regex(trim(text),
                      '\s+')), 1)::DOUBLE AS mwl
           FROM documents),
         thr AS (
           SELECT lang, quantile_cont(mwl, 0.75) AS t
           FROM m GROUP BY lang)
         SELECT doc_id, lang
         FROM m JOIN thr USING (lang)
         WHERE round(mwl * 10000) / 10000 >= round(t * 10000) / 10000""",

    "q_bm25_topk" ->
      """WITH tok AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         lens AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM tok),
         stats AS (
           SELECT count(*)::BIGINT AS n_docs, avg(dl::DOUBLE) AS avgdl
           FROM lens),
         occ AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
         f AS (
           SELECT doc_id, tok, count(*)::BIGINT AS tf FROM occ
           WHERE tok IN ('spark', 'vector', 'window', 'join')
           GROUP BY doc_id, tok),
         d AS (
           SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM occ
           WHERE tok IN ('spark', 'vector', 'window', 'join')
           GROUP BY tok),
         s AS (
           SELECT f.doc_id,
                  round(ln(1.0 + (stats.n_docs - d.df + 0.5)
                             / (d.df + 0.5)) * f.tf
                    / (f.tf + 1.2 * (1.0 - 0.75
                         + 0.75 * lens.dl / stats.avgdl)),
                    8)::DECIMAL(18,8) AS s
           FROM f JOIN d USING (tok)
                JOIN lens ON f.doc_id = lens.doc_id
                CROSS JOIN stats),
         agg AS (
           SELECT doc_id, sum(s)::DOUBLE AS sc FROM s GROUP BY doc_id)
         SELECT doc_id, round(sc, 6) AS score FROM agg
         ORDER BY sc DESC, doc_id LIMIT 20""",

    // BM25 CTE as in q_bm25_topk; ANN CTE as in q_ann_bruteforce with
    // query vec 0 / top-20; fusion sums 1/(60+rank) per doc
    "q_hybrid_rrf" ->
      """WITH tok AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         lens AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM tok),
         stats AS (
           SELECT count(*)::BIGINT AS n_docs, avg(dl::DOUBLE) AS avgdl
           FROM lens),
         occ AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
         f AS (
           SELECT doc_id, tok, count(*)::BIGINT AS tf FROM occ
           WHERE tok IN ('spark', 'vector', 'window', 'join')
           GROUP BY doc_id, tok),
         d AS (
           SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM occ
           WHERE tok IN ('spark', 'vector', 'window', 'join')
           GROUP BY tok),
         s AS (
           SELECT f.doc_id,
                  round(ln(1.0 + (stats.n_docs - d.df + 0.5)
                             / (d.df + 0.5)) * f.tf
                    / (f.tf + 1.2 * (1.0 - 0.75
                         + 0.75 * lens.dl / stats.avgdl)),
                    8)::DECIMAL(18,8) AS s
           FROM f JOIN d USING (tok)
                JOIN lens ON f.doc_id = lens.doc_id
                CROSS JOIN stats),
         bmagg AS (
           SELECT doc_id, sum(s)::DOUBLE AS sc FROM s GROUP BY doc_id),
         bmtop AS (
           SELECT doc_id, round(sc, 6) AS rsc FROM bmagg
           ORDER BY sc DESC, doc_id LIMIT 20),
         bm AS (
           SELECT doc_id,
                  row_number() OVER (ORDER BY rsc DESC, doc_id) AS rank
           FROM bmtop),
         v AS (
           SELECT vec_id,
                  list_transform(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
         annscored AS (
           SELECT c.vec_id AS doc_id,
                  list_dot_product(q.emb, c.emb) /
                    (sqrt(list_dot_product(q.emb, q.emb)) *
                     sqrt(list_dot_product(c.emb, c.emb))) AS cos
           FROM v q JOIN v c ON c.vec_id <> q.vec_id
           WHERE q.vec_id = 0),
         ann AS (
           SELECT doc_id, rank FROM (
             SELECT doc_id,
                    row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
             FROM annscored)
           WHERE rank <= 20),
         u AS (
           SELECT doc_id, 1.0 / (60 + rank) AS r FROM bm
           UNION ALL
           SELECT doc_id, 1.0 / (60 + rank) FROM ann),
         fused AS (
           SELECT doc_id, sum(r)::DOUBLE AS rrf,
                  count(*)::BIGINT AS n_lists
           FROM u GROUP BY doc_id)
         SELECT doc_id, round(rrf, 6) AS rrf_score, n_lists
         FROM (SELECT * FROM fused
               ORDER BY rrf DESC, doc_id LIMIT 15)""",

    "q_text_fingerprint" ->
      s"""WITH toks AS (
            SELECT doc_id,
                   string_split_regex(trim(regexp_replace(lower(text),
                     '[^a-z0-9\\s]+', ' ', 'g')), '\\s+') AS toks
            FROM documents)
          SELECT t.doc_id,
                 md5(array_to_string(toks, ' ')) AS fp_exact,
                 list_min(list_transform(
                   list_distinct(list_transform(
                     generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' '))),
                   s -> md5(s))) AS fp_minshingle,
                 list_reduce(
                   list_prepend(0::BIGINT, list_transform(
                     generate_series(1, length(d.text)),
                     i -> ascii(substr(d.text, i, 1))::BIGINT)),
                   (a, c) -> (a * 31 + c) % 1000000007) AS fp_rolling
          FROM toks t JOIN documents d USING (doc_id)""",

    "q_train_split" ->
      """WITH b AS (
           SELECT n_chars,
                  (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                    % 100)::INT AS bucket
           FROM documents)
         SELECT CASE WHEN bucket < 90 THEN 'train'
                     WHEN bucket < 95 THEN 'val'
                     ELSE 'test' END AS split,
                COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM b GROUP BY 1""",

    // regexp-decomposed twin of parse_url on the same synthetic URLs;
    // last-two-labels registrable domain via list_slice
    "q_url_features" ->
      """WITH u AS (SELECT doc_id,
           'https://' || source || '.example.com/' || lang || '/doc/' ||
           CAST(doc_id % 50 AS VARCHAR) ||
           CASE WHEN doc_id % 3 = 0 THEN '?ref=rss&utm=1'
                WHEN doc_id % 3 = 1 THEN '?ref=feed' ELSE '' END AS url
           FROM documents),
         p AS (SELECT doc_id,
           lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) AS host,
           coalesce(regexp_extract(url,
             '^[a-z]+://[^/?#]+(/[^?#]*)', 1), '') AS path,
           coalesce(regexp_extract(url, '\?([^#]*)', 1), '') AS q
           FROM u),
         l AS (SELECT doc_id, host, string_split(host, '.') AS parts,
                      path, q
               FROM p)
         SELECT doc_id, host,
                array_to_string(list_slice(parts,
                  greatest(len(parts) - 1, 1), len(parts)), '.')
                  AS domain,
                parts[len(parts)] AS tld,
                CAST(len(list_filter(string_split(path, '/'),
                  x -> x <> '')) AS INT) AS path_depth,
                CAST(CASE WHEN q = '' THEN 0
                     ELSE len(string_split(q, '&')) END AS INT)
                  AS n_params
         FROM l""",

    // same tokenizer as q_text_entropy; positions via parallel unnest;
    // identical left-assoc double expression inside ln on both engines
    "q_pmi_pairs" ->
      """WITH tk AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS toks
           FROM documents),
         tok AS (SELECT doc_id,
                        unnest(range(1, len(toks) + 1)) AS pos,
                        unnest(toks) AS tok
                 FROM tk),
         tot AS (SELECT COUNT(*) AS t FROM tok),
         uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
         pr AS (SELECT least(a.tok, b.tok) AS tok_a,
                       greatest(a.tok, b.tok) AS tok_b
                FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id
                 AND b.pos - a.pos BETWEEN 1 AND 2),
         pc AS (SELECT tok_a, tok_b, COUNT(*) AS c_ab
                FROM pr GROUP BY tok_a, tok_b),
         pt AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS p FROM pc)
         SELECT tok_a, tok_b, c_ab,
                CAST(round(ln((c_ab * 1.0 * t * t) /
                  (p * 1.0 * ca.c * cb.c)) * 1000000) AS BIGINT)
                  AS pmi_micro
         FROM pc, tot, pt
         JOIN uni ca ON pc.tok_a = ca.tok
         JOIN uni cb ON pc.tok_b = cb.tok
         WHERE c_ab >= 5
         ORDER BY pmi_micro DESC, tok_a, tok_b LIMIT 50""",

    "q_text_entropy" ->
      """WITH tf AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+')) AS tok
           FROM documents),
         cc AS (SELECT doc_id, tok, COUNT(*) AS c
                FROM tf GROUP BY doc_id, tok),
         agg AS (SELECT doc_id,
                        CAST(SUM(c) AS BIGINT) AS n_tokens,
                        CAST(SUM(CAST(round(ln(c) * 1000000) AS BIGINT)
                          * c) AS BIGINT) AS clnc_micro
                 FROM cc GROUP BY doc_id)
         SELECT doc_id, n_tokens,
                round((ln(n_tokens) - clnc_micro / 1000000.0 / n_tokens)
                  * 10000) / 10000 AS entropy
         FROM agg""",

    // mirrors naiveBayes exactly: same tokenizer, same md5 train split,
    // same add-1 grid over (bucket × class), micros at the ln boundary,
    // argmax tie-break on class DESC (the max(struct) order)
    "q_nb_langid" ->
      """WITH tf AS (
           SELECT doc_id, lang AS cls,
                  (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                    % 100) < 50 AS is_train,
                  (('0x' || substr(md5(tok), 1, 8))::BIGINT % 256)::INT
                    AS bucket
           FROM (SELECT doc_id, lang,
                        unnest(string_split_regex(trim(regexp_replace(
                          lower(text), '[^a-z0-9\s]+', ' ', 'g')),
                          '\s+')) AS tok
                 FROM documents)),
         classes AS (SELECT cls, COUNT(*) AS cn,
                            COUNT(DISTINCT doc_id) AS cdocs
                     FROM tf WHERE is_train GROUP BY cls),
         td AS (SELECT CAST(SUM(cdocs) AS DOUBLE) AS td FROM classes),
         bc AS (SELECT bucket, cls, COUNT(*) AS n
                FROM tf WHERE is_train GROUP BY bucket, cls),
         grid AS (SELECT b.bucket, c.cls,
                         CAST(round(ln((COALESCE(bc.n, 0) + 1.0) /
                           (c.cn + 256.0)) * 1000000) AS BIGINT) AS w_micro
                  FROM (SELECT DISTINCT bucket FROM tf) b
                  CROSS JOIN classes c
                  LEFT JOIN bc ON bc.bucket = b.bucket AND bc.cls = c.cls),
         prior AS (SELECT cls,
                          CAST(round(ln(cdocs / td.td) * 1000000)
                            AS BIGINT) AS prior_micro
                   FROM classes, td),
         hist AS (SELECT doc_id, bucket, COUNT(*) AS n
                  FROM tf GROUP BY doc_id, bucket),
         sc AS (SELECT h.doc_id, g.cls,
                       CAST(SUM(h.n) AS BIGINT) AS n_tokens,
                       CAST(SUM(h.n * g.w_micro) AS BIGINT) AS ll_micro
                FROM hist h JOIN grid g ON h.bucket = g.bucket
                GROUP BY h.doc_id, g.cls),
         fin AS (SELECT sc.doc_id, sc.cls, sc.n_tokens,
                        sc.ll_micro + p.prior_micro AS score_micro,
                        row_number() OVER (PARTITION BY sc.doc_id
                          ORDER BY sc.ll_micro + p.prior_micro DESC,
                                   sc.cls DESC) AS rk
                 FROM sc JOIN prior p ON sc.cls = p.cls)
         SELECT doc_id, n_tokens, cls AS pred,
                CAST(score_micro AS BIGINT) AS score_micro
         FROM fin WHERE rk = 1""",

    "q_source_kl" ->
      """WITH tf AS (
           SELECT src,
                  (('0x' || substr(md5(tok), 1, 8))::BIGINT % 256)::INT
                    AS bucket
           FROM (SELECT source AS src,
                        unnest(string_split_regex(trim(regexp_replace(
                          lower(text), '[^a-z0-9\s]+', ' ', 'g')),
                          '\s+')) AS tok
                 FROM documents)),
         sb AS (SELECT src, bucket, COUNT(*) AS c
                FROM tf GROUP BY 1, 2),
         per_src AS (SELECT src, CAST(SUM(c) AS BIGINT) AS n_s
                     FROM sb GROUP BY 1),
         per_bucket AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS cb
                        FROM sb GROUP BY 1),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM sb),
         all_buckets AS (
           SELECT ab.bucket::INT AS bucket, COALESCE(pb.cb, 0) AS cb
           FROM range(0, 256) ab(bucket)
           LEFT JOIN per_bucket pb ON pb.bucket = ab.bucket),
         grid AS (
           SELECT s.src, s.n_s, COALESCE(sb.c, 0) + 1 AS cp,
                  CAST(round((ln((COALESCE(sb.c, 0) + 1.0) /
                    (s.n_s + 256.0)) - ln((b.cb + 1.0) /
                    (t.n_total + 256.0))) * 1000000) AS BIGINT)
                    AS lr_micro
           FROM all_buckets b
           CROSS JOIN per_src s
           LEFT JOIN sb ON sb.src = s.src AND sb.bucket = b.bucket
           CROSS JOIN tot t)
         SELECT src AS source, MAX(n_s) AS n_tokens,
                round(CAST(SUM(cp * lr_micro) AS DOUBLE) /
                  (MAX(n_s) + 256.0) / 1000000.0 * 10000) / 10000 AS kl
         FROM grid GROUP BY src""",

    "q_token_budget_mix" ->
      """WITH t0 AS (
           SELECT doc_id, source,
                  COALESCE(CAST(len(string_split_regex(trim(text),
                    '\s+')) AS BIGINT), 0) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
                      SUM(n_tokens) OVER (PARTITION BY source
                        ORDER BY md5(doc_id::VARCHAR), doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum_tokens
               FROM t0 WHERE n_tokens >= 1)
         SELECT doc_id, source, n_tokens,
                CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM c WHERE cum_tokens <= 900""",

    "q_dsir_score" ->
      """WITH tf AS (
           SELECT doc_id, is_target,
                  (('0x' || substr(md5(tok), 1, 8))::BIGINT % 256)::INT
                    AS bucket
           FROM (SELECT doc_id, lang = 'en' AS is_target,
                        unnest(string_split_regex(trim(regexp_replace(
                          lower(text), '[^a-z0-9\s]+', ' ', 'g')),
                          '\s+')) AS tok
                 FROM documents)),
         counts AS (
           SELECT bucket,
                  SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
                  SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
           FROM tf GROUP BY bucket),
         tot AS (
           SELECT SUM(CASE WHEN is_target THEN 1 ELSE 0 END)::DOUBLE
                    AS t_total,
                  SUM(CASE WHEN is_target THEN 0 ELSE 1 END)::DOUBLE
                    AS r_total
           FROM tf),
         lam AS (
           SELECT bucket,
                  CAST(round((ln((ct + 1.0) / (t_total + 256.0)) -
                              ln((cr + 1.0) / (r_total + 256.0)))
                    * 1000000) AS BIGINT) AS lam_micro
           FROM counts, tot),
         db AS (SELECT doc_id, bucket, COUNT(*) AS n
                FROM tf GROUP BY doc_id, bucket)
         SELECT doc_id, SUM(n)::BIGINT AS n_tokens,
                SUM(n * lam_micro)::BIGINT AS score_micro
         FROM db JOIN lam USING (bucket)
         GROUP BY doc_id
         ORDER BY score_micro DESC, doc_id LIMIT 100""",

    // eligibility mirrors Text.weightedSample: A-ES needs a non-null
    // id and a strictly positive weight (a negative weight would flip
    // the key sign and rank FIRST)
    "q_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM (
           SELECT doc_id, lang, n_chars,
                  row_number() OVER (PARTITION BY lang ORDER BY
                    -ln(((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                          ::BIGINT)::DOUBLE + 0.5) / 4294967296.0)
                      / n_chars::DOUBLE,
                    doc_id) AS rn
           FROM documents
           WHERE doc_id IS NOT NULL AND n_chars > 0)
         WHERE rn <= 20""",

    "q_text_redact" ->
      """SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      text || ' contact user' || doc_id ||
                        '@example.com at ip ' || (doc_id % 256) ||
                        '.0.0.1 tel +1 555-123-4567',
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'),
                    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                  '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS redacted
         FROM documents""",

    "q_corpus_prep2" ->
      """WITH m AS (
           SELECT doc_id, lang, source, n_chars, text,
                  length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
                    greatest(len(string_split_regex(trim(text),
                      '\s+')), 1)::DOUBLE AS mwl
           FROM documents),
         thr AS (
           SELECT lang, quantile_cont(mwl, 0.25) AS t
           FROM m GROUP BY lang),
         gated AS (
           SELECT m.* FROM m JOIN thr USING (lang) WHERE mwl >= t),
         capped AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
             FROM gated) WHERE rk <= 100),
         fp AS (
           SELECT *, md5(array_to_string(string_split_regex(trim(
                    regexp_replace(lower(text), '[^a-z0-9\s]+', ' ', 'g')),
                    '\s+'), ' ')) AS fp
           FROM capped),
         canon AS (
           SELECT * FROM (
             SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id
             FROM fp)
           WHERE doc_id = keep_id),
         s AS (
           SELECT lang, n_chars,
                  CASE WHEN bucket < 90 THEN 'train'
                       WHEN bucket < 95 THEN 'val'
                       ELSE 'test' END AS split
           FROM (SELECT *,
                        (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                          ::BIGINT % 100)::INT AS bucket
                 FROM canon))
         SELECT split, lang, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM s GROUP BY split, lang""",

    "q_corpus_prep" ->
      """WITH q AS (
           SELECT doc_id, lang, n_chars, text,
                  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                  (length(text) - length(regexp_replace(text,
                      '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE /
                    greatest(length(text), 1) AS punct_ratio
           FROM documents),
         gated AS (
           SELECT * FROM q WHERE n_tokens >= 20 AND punct_ratio < 0.2),
         fp AS (
           SELECT *, md5(array_to_string(string_split_regex(trim(
                    regexp_replace(lower(text), '[^a-z0-9\s]+', ' ', 'g')),
                    '\s+'), ' ')) AS fp
           FROM gated),
         canon AS (
           SELECT * FROM (
             SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id
             FROM fp)
           WHERE doc_id = keep_id),
         s AS (
           SELECT lang, n_chars,
                  CASE WHEN bucket < 90 THEN 'train'
                       WHEN bucket < 95 THEN 'val'
                       ELSE 'test' END AS split
           FROM (SELECT *,
                        (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                          ::BIGINT % 100)::INT AS bucket
                 FROM canon))
         SELECT split, lang, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM s GROUP BY split, lang""",

    // same integer stride arithmetic; the global position is a plain
    // ORDER BY over the (key, source, seq) total order
    "q_stride_schedule" ->
      """WITH seqd AS (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT
                    AS src_seq
           FROM documents),
         ns AS (SELECT source, max(src_seq) AS n_s
                FROM seqd GROUP BY source),
         t AS (SELECT sum(n_s)::HUGEINT AS t FROM ns),
         keyed AS (
           SELECT doc_id, source, src_seq,
                  ((src_seq::HUGEINT * t) // n_s)::BIGINT AS k
           FROM seqd JOIN ns USING (source), t)
         SELECT doc_id, source, src_seq,
                row_number() OVER (ORDER BY k, source, src_seq)::BIGINT
                  AS global_pos
         FROM keyed ORDER BY global_pos""",

    // the same breakpoint scan in SQL: every row's exclusive-prefix
    // candidate underestimates e*, the true breakpoint achieves it
    "q_epoch_waterfill" ->
      """WITH d AS (
           SELECT source,
                  len(string_split_regex(trim(text), '\s+'))::BIGINT
                    AS nt
           FROM documents),
         src AS (
           SELECT source AS src, sum(nt)::BIGINT AS n,
                  (((length(source) % 3) + 1) * 1000)::BIGINT AS m
           FROM d GROUP BY source),
         pre AS (
           SELECT src, n, m,
                  sum(n::HUGEINT * m) OVER w - n::HUGEINT * m AS s_ex,
                  sum(n::HUGEINT) OVER w - n AS t_ex
           FROM src
           WINDOW w AS (ORDER BY m, src
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         tot AS (SELECT sum(n)::HUGEINT AS ntot FROM src),
         es AS (
           SELECT max(((63000::HUGEINT * 1000 - s_ex) //
             (ntot - t_ex))::BIGINT) AS e_star
           FROM pre, tot)
         SELECT src AS source, n AS n_tokens, m AS max_epochs_milli,
                least(e_star, m)::BIGINT AS epochs_milli,
                ((n::HUGEINT * least(e_star, m)) // 1000)::BIGINT
                  AS alloc_tokens
         FROM src, es ORDER BY source""",

    "q_domain_cap" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
           FROM documents) WHERE rk <= 20""",

    "q_stratified_sample" ->
      """WITH b AS (
           SELECT lang, n_chars,
                  (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                    % 10000) AS bucket,
                  CASE lang WHEN 'en' THEN 9000 WHEN 'de' THEN 5000
                            WHEN 'es' THEN 5000 WHEN 'fr' THEN 2500
                            WHEN 'zh' THEN 1000 ELSE 0 END AS threshold
           FROM documents)
         SELECT lang, COUNT(*) AS n_kept,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM b WHERE bucket < threshold GROUP BY lang""",

    // Mirrors Text.tfidfCosinePairs on the 1-in-10 sample: weights
    // snapped to integer 1e-4 units at the ln boundary, exact HUGEINT
    // dot/norm sums through the term inverted index, double cosine
    "q_tfidf_pairs" ->
      """WITH sub AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
          toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(regexp_replace(
                     lower(text), '[^a-z0-9\s]+', ' ', 'g')), '\s+'))
                     AS tok
            FROM sub),
          tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
                 FROM toks GROUP BY 1, 2),
          df AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
          n AS (SELECT count(*)::BIGINT AS n FROM sub),
          w AS (
            SELECT doc_id, tok,
                   CAST(round(tf * ln(n / df::DOUBLE) * 1e4) AS BIGINT)
                     AS w
            FROM tf JOIN df USING (tok), n
            WHERE df <= 1.0 * n),
          norms AS (SELECT doc_id, sum((w * w)::HUGEINT) AS n2
                    FROM w GROUP BY 1),
          dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   sum((a.w * b.w)::HUGEINT) AS dot
            FROM w a JOIN w b USING (tok)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2),
          cos AS (
            SELECT doc_a, doc_b,
                   dot::DOUBLE / (sqrt(na.n2::DOUBLE) *
                     sqrt(nb.n2::DOUBLE)) AS cos
            FROM dots
            JOIN norms na ON doc_a = na.doc_id
            JOIN norms nb ON doc_b = nb.doc_id)
          SELECT doc_a, doc_b, round(cos, 6) AS cos
          FROM cos WHERE cos >= 0.7""",

    "q_corpus_stats" ->
      """WITH m AS (
           SELECT COUNT(*)::BIGINT AS n, SUM(n_chars)::BIGINT AS s,
                  SUM(n_chars * n_chars)::BIGINT AS sq
           FROM documents)
         SELECT n AS n_docs,
                s / n::DOUBLE AS mean_len,
                sq / n::DOUBLE - (s / n::DOUBLE) * (s / n::DOUBLE)
                  AS var_len
         FROM m""",

    "q_text_tfidf" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(
                    lower(text), '[^a-z0-9\s]+', ' ', 'g')), '\s+')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, tok),
         df AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
           GROUP BY tok),
         n AS (SELECT count(*) AS n FROM documents),
         ranked AS (
           SELECT doc_id, tok, tf, df,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY tf DESC, df ASC, tok ASC) AS rn
           FROM tf JOIN df USING (tok))
         SELECT doc_id, tok, tf,
                round(tf * ln(n / df::DOUBLE), 4) AS tfidf
         FROM ranked, n WHERE rn <= 3""",

    "q_unigram_logprob" ->
      """WITH tf AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+')) AS tok
           FROM documents),
         freq AS (SELECT tok, COUNT(*) AS cnt FROM tf GROUP BY tok),
         n AS (SELECT COUNT(*)::DOUBLE AS n_total FROM tf)
         SELECT doc_id, COUNT(*) AS n_tokens,
                CAST(SUM(CAST(round(ln(cnt / n_total) * 1000000)
                  AS BIGINT)) AS BIGINT) AS lp_sum_micro,
                round(CAST(SUM(CAST(round(ln(cnt / n_total) * 1000000)
                  AS BIGINT)) AS BIGINT) / 1000000.0 / COUNT(*), 4)
                  AS avg_logprob
         FROM tf JOIN freq USING (tok), n
         GROUP BY doc_id""",

    "q_bigram_logprob" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS t
           FROM documents),
         bg AS (
           SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t) - 1)) AS i
                 FROM toks WHERE len(t) >= 2)),
         uni AS (SELECT unnest(t) AS w FROM toks),
         u AS (SELECT w, COUNT(*) AS uc FROM uni GROUP BY w),
         tot AS (SELECT COUNT(*)::DOUBLE AS t_total FROM uni),
         bc AS (SELECT w1, w2, COUNT(*) AS nbc FROM bg GROUP BY w1, w2),
         scored AS (
           SELECT bg.doc_id,
                  CAST(round(ln(0.7 * (bc.nbc / u1.uc) +
                               0.3 * (u2.uc / tot.t_total)) * 1000000)
                    AS BIGINT) AS lp_micro
           FROM bg
           JOIN bc USING (w1, w2)
           JOIN u u1 ON bg.w1 = u1.w
           JOIN u u2 ON bg.w2 = u2.w, tot)
         SELECT doc_id, COUNT(*) AS n_bigrams,
                CAST(SUM(lp_micro) AS BIGINT) AS lp_sum_micro,
                round((CAST(SUM(lp_micro) AS BIGINT) / 1000000.0
                  / COUNT(*)) * 10000) / 10000 AS avg_logprob
         FROM scored GROUP BY doc_id""",

    // Mirrors Text.perplexityBuckets: the q_bigram_logprob score CTEs,
    // nll = −avg_logprob (same 4dp snap), rank by (nll, doc_id), and
    // integer tercile cutoffs ceil(n/3), ceil(2n/3) on the 1-based rank.
    "q_ppl_buckets" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS t
           FROM documents),
         bg AS (
           SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM (SELECT doc_id, t,
                        unnest(generate_series(1, len(t) - 1)) AS i
                 FROM toks WHERE len(t) >= 2)),
         uni AS (SELECT unnest(t) AS w FROM toks),
         u AS (SELECT w, COUNT(*) AS uc FROM uni GROUP BY w),
         tot AS (SELECT COUNT(*)::DOUBLE AS t_total FROM uni),
         bc AS (SELECT w1, w2, COUNT(*) AS nbc FROM bg GROUP BY w1, w2),
         scored AS (
           SELECT bg.doc_id,
                  CAST(round(ln(0.7 * (bc.nbc / u1.uc) +
                               0.3 * (u2.uc / tot.t_total)) * 1000000)
                    AS BIGINT) AS lp_micro
           FROM bg
           JOIN bc USING (w1, w2)
           JOIN u u1 ON bg.w1 = u1.w
           JOIN u u2 ON bg.w2 = u2.w, tot),
         lp AS (
           SELECT doc_id, COUNT(*) AS nb,
                  CAST(SUM(lp_micro) AS BIGINT) AS s
           FROM scored GROUP BY doc_id),
         nl AS (
           SELECT doc_id,
                  round((s / 1000000.0 / nb) * 10000) / 10000 * -1.0
                    AS nll
           FROM lp),
         rk AS (
           SELECT doc_id, nll,
                  row_number() OVER (ORDER BY nll, doc_id) AS rank,
                  count(*) OVER () AS n
           FROM nl)
         SELECT doc_id, nll, rank::BIGINT AS rank,
                CASE WHEN rank <= ceil(n / 3.0) THEN 'head'
                     WHEN rank <= ceil(2.0 * n / 3.0) THEN 'middle'
                     ELSE 'tail' END AS ppl_bucket
         FROM rk""",

    "q_chunk_overlap" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS t
           FROM documents),
         st AS (SELECT doc_id, t, len(t) AS n,
                       unnest(range(1, len(t) + 1, 48)) AS start
                FROM toks WHERE len(t) >= 1),
         ch AS (SELECT doc_id,
                       CAST((start - 1) // 48 AS INT) AS chunk_idx,
                       CAST(start AS INT) AS start,
                       t[start:least(start + 63, n)] AS chunk
                FROM st)
         SELECT doc_id, chunk_idx, start,
                CAST(len(chunk) AS INT) AS chunk_len,
                array_to_string(chunk, ' ') AS chunk_text
         FROM ch WHERE start = 1 OR len(chunk) > 16""",

    "q_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS t
           FROM documents),
         st AS (SELECT doc_id, t, len(t) AS n,
                       unnest(range(1, len(t) + 1, 32)) AS start
                FROM toks WHERE len(t) >= 1),
         ch AS (SELECT doc_id,
                       CAST((start - 1) // 32 AS INT) AS chunk_idx,
                       array_to_string(t[start:least(start + 31, n)], ' ')
                         AS chunk_text
                FROM st),
         flagged AS (SELECT doc_id, chunk_idx,
                       CASE WHEN row_number() OVER
                         (PARTITION BY md5(chunk_text)
                          ORDER BY doc_id, chunk_idx) = 1
                       THEN 1 ELSE 0 END AS kept
                     FROM ch)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                CAST(SUM(kept) AS BIGINT) AS n_kept,
                round(CAST(SUM(kept) AS BIGINT)
                      / CAST(COUNT(*) AS BIGINT), 6) AS kept_ratio
         FROM flagged GROUP BY doc_id""",

    "q_corpus_mix" ->
      """WITH by_lang AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_orig
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(SUM(n_orig) AS BIGINT) AS n_total,
                        CAST(COUNT(*) AS BIGINT) AS n_langs FROM by_lang),
         thr AS (SELECT lang, n_orig,
                        least(10000,
                          ((n_total // n_langs) * 10000) // n_orig)
                          AS threshold
                 FROM by_lang, tot),
         kept AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept
                  FROM documents d JOIN thr USING (lang)
                  WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))
                        ::BIGINT % 10000) < threshold
                  GROUP BY lang)
         SELECT t.lang, t.n_orig, t.threshold,
                COALESCE(k.n_kept, 0) AS n_kept
         FROM thr t LEFT JOIN kept k ON t.lang = k.lang""",

    "q_tempered_mix" ->
      """WITH by_lang AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_orig,
                  CAST(round(power(COUNT(*), 0.7) * 1000000) AS BIGINT)
                    AS w_micro
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS wt_micro,
                        CAST(SUM(n_orig) AS BIGINT) AS n_total
                 FROM by_lang),
         thr AS (SELECT lang, n_orig,
                        CAST(round(w_micro / CAST(wt_micro AS DOUBLE)
                          * 1000000) AS BIGINT) AS share_micro,
                        least(10000,
                          ((n_total // 2) *
                           CAST(round(w_micro / CAST(wt_micro AS DOUBLE)
                             * 1000000) AS BIGINT)) // (100 * n_orig))
                          AS threshold
                 FROM by_lang, tot),
         kept AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept
                  FROM documents d JOIN thr USING (lang)
                  WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))
                        ::BIGINT % 10000) < threshold
                  GROUP BY lang)
         SELECT t.lang, t.n_orig, t.share_micro, t.threshold,
                COALESCE(k.n_kept, 0) AS n_kept
         FROM thr t LEFT JOIN kept k ON t.lang = k.lang""",

    // frequency-ranked prefix sums on the distinct-token frame
    "q_vocab_coverage" ->
      s"""WITH tf AS (
           SELECT unnest(string_split_regex(trim(regexp_replace(
                    lower(text), '[^a-z0-9\\s]+', ' ', 'g')), '\\s+'))
                    AS tok
           FROM documents),
         freq AS (SELECT tok, COUNT(*) AS cnt FROM tf GROUP BY 1),
         r AS (SELECT cnt, tok,
                      SUM(cnt) OVER (ORDER BY cnt DESC, tok) AS cum,
                      ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rk
               FROM freq),
         tot AS (SELECT SUM(cnt) AS n_total FROM freq)
         SELECT p.pct, MIN(rk) AS k_tokens,
                CAST(MAX(n_total) AS BIGINT) AS n_total
         FROM r, tot, (SELECT unnest([50, 90, 95, 99]) AS pct) p
         WHERE cum * 100 >= n_total * p.pct
         GROUP BY 1 ORDER BY 1""",

    // whole-second gaps; CV² by the same two-step floor division
    "q_burstiness" ->
      """WITH g0 AS (
           SELECT user_id,
                  epoch_us(ts) // 1000000 AS sec,
                  LAG(epoch_us(ts) // 1000000, 1) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    AS prev_sec
           FROM events),
         g AS (SELECT user_id, sec - prev_sec AS g FROM g0
               WHERE prev_sec IS NOT NULL),
         a AS (SELECT user_id, COUNT(*) AS n_gaps,
                      CAST(SUM(g) AS BIGINT) AS sx,
                      CAST(SUM(g * g) AS BIGINT) AS sxx
               FROM g GROUP BY 1)
         SELECT user_id, n_gaps,
                CAST((sx * 1000000) // n_gaps AS BIGINT)
                  AS mean_gap_micro,
                CAST((n_gaps * sxx - sx * sx) // (sx * sx) * 1000000
                     + (((n_gaps * sxx - sx * sx) % (sx * sx))
                        * 1000000) // (sx * sx) AS BIGINT) AS cv2_micro
         FROM a WHERE sx > 0
         ORDER BY user_id""",

    "q_pack_sequences" ->
      """WITH toks AS (
           SELECT doc_id,
                  len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS n_tokens
           FROM documents),
         cum AS (
           SELECT doc_id, n_tokens,
                  COALESCE(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS cum_before
           FROM toks)
         SELECT cum_before // 2048 AS seq_id,
                COUNT(*) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS fill_tokens,
                MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM cum GROUP BY 1""",

    "q_heavy_hitters" ->
      """WITH tf AS (
           SELECT lang,
                  unnest(string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+')) AS tok
           FROM documents),
         c AS (SELECT lang, tok, COUNT(*) AS cnt FROM tf
               GROUP BY lang, tok)
         SELECT lang, tok, cnt FROM (
           SELECT lang, tok, cnt,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY cnt DESC, tok ASC) AS rn
           FROM c)
         WHERE rn <= 3""",

    "q_text_repetition" ->
      """WITH tk AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS toks
           FROM documents)
         SELECT doc_id,
                round(CASE WHEN len(toks) - 2 > 0
                  THEN 1.0 - len(list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+2], ' '))))::DOUBLE
                       / (len(toks) - 2)
                  ELSE 0.0 END, 6) AS rep_ratio
         FROM tk""",

    "q_oov_rate" ->
      """WITH tf AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(lower(text),
                    '[^a-z0-9\s]+', ' ', 'g')), '\s+')) AS tok
           FROM documents),
         vocab AS (
           SELECT tok FROM (
             SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok)
           WHERE df >= 10)
         SELECT t.doc_id,
                round(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE
                      / COUNT(*), 6) AS oov_rate
         FROM tf t LEFT JOIN vocab v ON t.tok = v.tok
         GROUP BY t.doc_id""",

    // mirrors stripBoilerplate: non-overlapping 4-token chunks, df over
    // DISTINCT docs, >= 3 docs => dropped everywhere, string_agg with
    // ORDER BY ci restores document order (NULLed boiler chunks are
    // skipped without a separator; all-dropped docs coalesce to '')
    "q_boilerplate_strip" ->
      """WITH tok AS (
           SELECT doc_id,
                  string_split_regex(trim(regexp_replace(
                    lower(coalesce(text, '')), '[^a-z0-9\s]+', ' ',
                    'g')), '\s+') AS t
           FROM documents),
         ch AS (
           SELECT doc_id, i AS ci,
                  array_to_string(t[i*4 + 1 : i*4 + 4], ' ') AS chunk
           FROM (SELECT doc_id, t,
                        unnest(generate_series(0,
                          CAST(ceil(len(t) / 4.0) AS INT) - 1)) AS i
                 FROM tok)),
         df AS (SELECT chunk, count(DISTINCT doc_id) AS nd
                FROM ch GROUP BY chunk),
         fl AS (SELECT doc_id, ci, chunk, nd >= 3 AS boiler
                FROM ch JOIN df USING (chunk))
         SELECT doc_id, count(*)::BIGINT AS n_chunks,
                sum(CASE WHEN boiler THEN 1 ELSE 0 END)::BIGINT
                  AS n_dropped,
                coalesce(string_agg(CASE WHEN NOT boiler THEN chunk END,
                  ' ' ORDER BY ci), '') AS clean_text
         FROM fl GROUP BY doc_id""",

    // mirrors cleanText over the same deterministic re-dirtying: both
    // engines splice 'a'+U+0301 (decomposed accent) + BEL into every
    // "table", then NFC-compose (utf8proc here, java.text.Normalizer in
    // Spark — same UAX #15 algorithm), strip Cc/Cf to spaces, collapse
    // whitespace, trim
    "q_text_clean" ->
      """SELECT doc_id, clean, length(clean)::INT AS n_chars_clean
         FROM (
           SELECT doc_id,
                  trim(regexp_replace(regexp_replace(
                    nfc_normalize(replace(text, 'table',
                      'ta' || chr(769) || 'ble' || chr(7))),
                    '[\p{Cc}\p{Cf}]', ' ', 'g'),
                    '\s+', ' ', 'g')) AS clean
           FROM documents)""",

    // mirrors sourceOverlap: distinct (source, shingle) pairs, pairwise
    // intersection counts via the per-shingle source set, containment
    // normalized by the left side's set size
    // same tokenizer + md5-prefix bucket; sparse COO cells (scalar
    // columns only — array cells defeat the harness's row sort)
    "q_hashing_tf" ->
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(
                    lower(text), '[^a-z0-9\s]+', ' ', 'g')), '\s+'))
                    AS tok
           FROM documents),
         b AS (SELECT doc_id,
                      ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64
                        AS bucket
               FROM tok)
         SELECT doc_id, bucket, COUNT(*) AS tf
         FROM b GROUP BY 1, 2
         ORDER BY doc_id, bucket""",

    // same shingle + md5-prefix hash as the engine; per-source cut,
    // per-pair union merge, identical integer estimators
    "q_kmv_overlap" ->
      """WITH tok AS (
           SELECT source, string_split_regex(trim(regexp_replace(
             lower(text), '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS t
           FROM documents),
         sh AS (
           SELECT DISTINCT source AS src,
                  array_to_string(t[i:i+2], ' ') AS g
           FROM (SELECT source, t,
                        unnest(generate_series(1, len(t) - 2)) AS i
                 FROM tok)),
         hh AS (SELECT DISTINCT src,
                       ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
                FROM sh),
         sk AS (SELECT src, h FROM (
                  SELECT src, h, row_number() OVER (PARTITION BY src
                    ORDER BY h) AS r
                  FROM hh) WHERE r <= 128),
         srcs AS (SELECT DISTINCT src FROM sk),
         pairs AS (SELECT a.src AS src_a, b.src AS src_b
                   FROM srcs a JOIN srcs b ON a.src < b.src),
         u AS (SELECT p.src_a, p.src_b, s.h,
                      MAX(CASE WHEN s.src = p.src_a THEN 1 ELSE 0 END)
                        AS in_a,
                      MAX(CASE WHEN s.src = p.src_b THEN 1 ELSE 0 END)
                        AS in_b
               FROM pairs p JOIN sk s ON s.src IN (p.src_a, p.src_b)
               GROUP BY 1, 2, 3),
         r AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b
                 ORDER BY h) AS rnk
               FROM u),
         agg AS (SELECT src_a, src_b, COUNT(*) AS k_used,
                        SUM(in_a * in_b) AS est_inter, MAX(h) AS kth
                 FROM r WHERE rnk <= 128 GROUP BY 1, 2)
         SELECT src_a, src_b, CAST(k_used AS BIGINT) AS k_used,
                CAST(est_inter AS BIGINT) AS est_inter,
                CAST((est_inter * 1000000) // k_used AS BIGINT)
                  AS est_jaccard_micro,
                CAST(CASE WHEN k_used < 128 THEN k_used
                     ELSE (CAST(k_used - 1 AS HUGEINT) *
                       1152921504606846976) // kth END AS BIGINT)
                  AS est_union
         FROM agg ORDER BY src_a, src_b""",

    "q_source_overlap" ->
      """WITH tok AS (
           SELECT source, string_split_regex(trim(regexp_replace(
             lower(text), '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS t
           FROM documents),
         sh AS (
           SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS g
           FROM (SELECT source, t,
                        unnest(generate_series(1, len(t) - 2)) AS i
                 FROM tok)),
         sizes AS (SELECT source, count(*)::BIGINT AS n
                   FROM sh GROUP BY source),
         pairs AS (
           SELECT a.source AS src_a, b.source AS src_b,
                  count(*)::BIGINT AS n_shared
           FROM sh a JOIN sh b ON a.g = b.g AND a.source <> b.source
           GROUP BY 1, 2),
         universe AS (
           SELECT x.source AS src_a, y.source AS src_b
           FROM sizes x JOIN sizes y ON x.source <> y.source)
         SELECT u.src_a, u.src_b,
                COALESCE(n_shared, 0)::BIGINT AS n_shared,
                round(COALESCE(n_shared, 0)::DOUBLE / n, 6)
                  AS containment
         FROM universe u
         LEFT JOIN pairs p ON u.src_a = p.src_a AND u.src_b = p.src_b
         JOIN sizes ON u.src_a = sizes.source""",

    // mirrors bpeTrain with the 3 rounds unrolled: same wrapped-segment
    // representation, same weighted adjacent-pair counts, same
    // (n DESC, pair ASC) argmax, same literal replace whose left-to-
    // right non-overlapping semantics is the greedy BPE fold
    "q_bpe_merges" ->
      """WITH v0 AS (
           SELECT w, count(*)::BIGINT AS c,
                  regexp_replace(w, '(.)', '(\1)', 'g') AS seg
           FROM (SELECT unnest(string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9\s]+', ' ', 'g')), '\s+')) AS w
                 FROM documents)
           WHERE length(w) >= 1 GROUP BY w),
         p1 AS (
           SELECT unnest(list_transform(generate_series(1, len(s)-1),
                    i -> s[i] || ' ' || s[i+1])) AS p, c
           FROM (SELECT c, string_split(seg[2:-2], ')(') AS s FROM v0)),
         a1 AS (SELECT p, sum(c)::BIGINT AS n FROM p1 GROUP BY p),
         m1 AS (SELECT split_part(p, ' ', 1) AS l,
                       split_part(p, ' ', 2) AS r, n
                FROM a1 ORDER BY n DESC, p LIMIT 1),
         v1 AS (SELECT w, c, replace(seg, '('||m1.l||')('||m1.r||')',
                  '('||m1.l||m1.r||')') AS seg FROM v0, m1),
         p2 AS (
           SELECT unnest(list_transform(generate_series(1, len(s)-1),
                    i -> s[i] || ' ' || s[i+1])) AS p, c
           FROM (SELECT c, string_split(seg[2:-2], ')(') AS s FROM v1)),
         a2 AS (SELECT p, sum(c)::BIGINT AS n FROM p2 GROUP BY p),
         m2 AS (SELECT split_part(p, ' ', 1) AS l,
                       split_part(p, ' ', 2) AS r, n
                FROM a2 ORDER BY n DESC, p LIMIT 1),
         v2 AS (SELECT w, c, replace(seg, '('||m2.l||')('||m2.r||')',
                  '('||m2.l||m2.r||')') AS seg FROM v1, m2),
         p3 AS (
           SELECT unnest(list_transform(generate_series(1, len(s)-1),
                    i -> s[i] || ' ' || s[i+1])) AS p, c
           FROM (SELECT c, string_split(seg[2:-2], ')(') AS s FROM v2)),
         a3 AS (SELECT p, sum(c)::BIGINT AS n FROM p3 GROUP BY p),
         m3 AS (SELECT split_part(p, ' ', 1) AS l,
                       split_part(p, ' ', 2) AS r, n
                FROM a3 ORDER BY n DESC, p LIMIT 1)
         SELECT 1 AS round, l AS "left", r AS "right", l || r AS merged,
                n AS weight FROM m1
         UNION ALL SELECT 2, l, r, l || r, n FROM m2
         UNION ALL SELECT 3, l, r, l || r, n FROM m3""",

    // same train chain as q_bpe_merges, then the apply half on the
    // weighted vocab (≡ segmenting every occurrence): top-20 symbols
    "q_bpe_tokenize" ->
      """WITH v0 AS (
           SELECT w, count(*)::BIGINT AS c,
                  regexp_replace(w, '(.)', '(\1)', 'g') AS seg
           FROM (SELECT unnest(string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9\s]+', ' ', 'g')), '\s+')) AS w
                 FROM documents)
           WHERE length(w) >= 1 GROUP BY w),
         p1 AS (
           SELECT unnest(list_transform(generate_series(1, len(s)-1),
                    i -> s[i] || ' ' || s[i+1])) AS p, c
           FROM (SELECT c, string_split(seg[2:-2], ')(') AS s FROM v0)),
         a1 AS (SELECT p, sum(c)::BIGINT AS n FROM p1 GROUP BY p),
         m1 AS (SELECT split_part(p, ' ', 1) AS l,
                       split_part(p, ' ', 2) AS r, n
                FROM a1 ORDER BY n DESC, p LIMIT 1),
         v1 AS (SELECT w, c, replace(seg, '('||m1.l||')('||m1.r||')',
                  '('||m1.l||m1.r||')') AS seg FROM v0, m1),
         p2 AS (
           SELECT unnest(list_transform(generate_series(1, len(s)-1),
                    i -> s[i] || ' ' || s[i+1])) AS p, c
           FROM (SELECT c, string_split(seg[2:-2], ')(') AS s FROM v1)),
         a2 AS (SELECT p, sum(c)::BIGINT AS n FROM p2 GROUP BY p),
         m2 AS (SELECT split_part(p, ' ', 1) AS l,
                       split_part(p, ' ', 2) AS r, n
                FROM a2 ORDER BY n DESC, p LIMIT 1),
         v2 AS (SELECT w, c, replace(seg, '('||m2.l||')('||m2.r||')',
                  '('||m2.l||m2.r||')') AS seg FROM v1, m2),
         p3 AS (
           SELECT unnest(list_transform(generate_series(1, len(s)-1),
                    i -> s[i] || ' ' || s[i+1])) AS p, c
           FROM (SELECT c, string_split(seg[2:-2], ')(') AS s FROM v2)),
         a3 AS (SELECT p, sum(c)::BIGINT AS n FROM p3 GROUP BY p),
         m3 AS (SELECT split_part(p, ' ', 1) AS l,
                       split_part(p, ' ', 2) AS r, n
                FROM a3 ORDER BY n DESC, p LIMIT 1),
         v3 AS (SELECT w, c, replace(seg, '('||m3.l||')('||m3.r||')',
                  '('||m3.l||m3.r||')') AS seg FROM v2, m3)
         SELECT sym, sum(c)::BIGINT AS n
         FROM (SELECT c, unnest(string_split(seg[2:-2], ')(')) AS sym
               FROM v3)
         GROUP BY sym ORDER BY n DESC, sym LIMIT 20""",

    // mirrors gopherFlags: raw whitespace words, integer-count divisions
    // (bit-equal cross-engine, so the UNROUNDED band compares in `keep`
    // cannot straddle an ulp), 6dp display rounding only
    "q_gopher_rules" ->
      """WITH m AS (
           SELECT doc_id,
                  len(string_split_regex(trim(text), '\s+'))::BIGINT
                    AS n_words,
                  length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                    AS non_ws,
                  len(regexp_extract_all(text,
                    '#|\.\.\.|…'))::DOUBLE AS symbols,
                  len(list_filter(string_split_regex(trim(text), '\s+'),
                    w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                    AS n_alpha,
                  len(list_intersect(list_distinct(string_split_regex(
                    trim(regexp_replace(lower(text), '[^a-z0-9\s]+', ' ',
                    'g')), '\s+')),
                    ['the','be','to','of','and','that','have','with']))
                    ::INT AS n_stop
           FROM documents)
         SELECT doc_id, n_words,
                round(non_ws / greatest(n_words, 1), 6) AS mean_word_len,
                round(symbols / greatest(n_words, 1), 6) AS symbol_ratio,
                round(n_alpha / greatest(n_words, 1), 6) AS alpha_frac,
                n_stop,
                (n_words >= 50 AND n_words <= 100000
                 AND non_ws / greatest(n_words, 1) >= 3.0
                 AND non_ws / greatest(n_words, 1) <= 10.0
                 AND symbols / greatest(n_words, 1) <= 0.1
                 AND n_alpha / greatest(n_words, 1) >= 0.8
                 AND n_stop >= 2) AS keep
         FROM m""",
  )
}
