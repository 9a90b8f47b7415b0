package graft.text

import graft.Staging._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: tokenization, language-ID, quality scoring, document
  * fingerprinting. All are built-in Column expressions (codegen'd, no UDFs),
  * so they run scan-local with zero shuffle — at 100 TB each executor
  * processes its parquet splits independently.
  */
object Text {

  /** Whitespace tokenization after lowercase + punctuation strip.
    * The BPE-ish variant additionally splits digits from letters. */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9\\s]+", " ")), "\\s+")

  /** Distinct token set (for Jaccard/minhash). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** The whitespace class shared with every DuckDB twin: EXPLICIT, not
    * `\s` — Java's `\s` includes vertical tab (U+000B), RE2's does
    * not, so a `\s`-based raw tokenizer would split on VT only on the
    * Spark side. (The normalized [[tokens]] path is immune: its
    * `[^a-z0-9\s]+`→space rewrite hits VT symmetrically on both
    * engines.) */
  private[graft] val WsClass = "[ \\t\\n\\f\\r]"

  /** Token count — whitespace tokens of the raw text. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), WsClass + "+"))

  /** Word k-shingles over the token array (n-gram units for dedup):
    * the native [[graft.functions.Shingles]] expression — one fused,
    * codegen-callable loop per document. Shingling feeds every dedup
    * operator, so it's the hottest text-side loop in the engine.
    * `shinglesHof` below keeps the pure-built-in formulation as the
    * semantic reference (equivalence-tested in TextSpec). */
  def shingles(toks: Column, k: Int): Column =
    call_function("graft_shingles", toks, lit(k))

  /** HOF reference formulation of `shingles`: zip_with the token array
    * against its own k-1 shifted copies — O(n) per document, but each
    * zip_with evaluates its lambda interpreted. (The naive
    * `transform(sequence(1, n-k+1), i => slice(toks, i, k))` is ~10×
    * worse again: one interpreted `slice` per output element, measured
    * ~7 µs per shingle.) zip_with pads the shorter side with null and
    * `concat` propagates it, so the trailing k-1 partial windows drop out
    * in `array_compact`; docs with fewer than k tokens yield an empty
    * set. */
  def shinglesHof(toks: Column, k: Int): Column = {
    val joined = (1 until k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(array_compact(joined))
  }

  /** Heuristic language-ID: score text against per-language stopword lists
    * (the classic n-gram/stopword profile approach, cf. Cavnar & Trenkle
    * '94). Returns the language whose stopword hit-count over the token set
    * is highest; ties break lexicographically. Pure expressions → scan-local.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo", "ta"))

  def langScore(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  def langId(text: Column): Column = {
    val toks = tokenSet(text)
    // struct(score, negated-lang) max ≡ (max score, lexicographically first
    // lang on ties) — array_max over structs compares fields in order.
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(langScore(toks, words).as("score"),
        lit(lang).as("lang"))
    }
    // greatest() on structs: highest score wins; on equal score the later
    // lang string wins, so order langs ascending and flip via reverse sort
    // key is avoided by using aggregate with explicit comparison.
    scored.reduce { (a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a)
    }.getField("lang")
  }

  /** Corpus data card (Gebru et al. '21 datasheet shape): the headline
    * statistics a published training corpus ships with, as one
    * long-format (metric, value) frame — volume (docs/tokens/chars),
    * composition (sources/langs, top-source share), hygiene (empty
    * rate, exact-dup rate) and shape (mean + exact median doc tokens).
    *
    * Cost: one multi-distinct aggregate over the corpus (Expand ×4 —
    * the audit-grade exact pass; a 100 TB run swaps the distincts for
    * sketches, see q_profile_approx's pattern), one |sources|-bounded
    * count agg, and the spillable exact-percentile pass. All ratios
    * are integer divisions rounded 6dp; the median carries the
    * quantile 4dp rule. */
  def dataCard(docs: DataFrame, idCol: String, textCol: String,
               langCol: String, sourceCol: String): DataFrame = {
    val tx = coalesce(col(textCol), lit(""))
    // an empty/whitespace-only text must count 0 tokens, not the one
    // phantom token split("") yields — otherwise a doc counted in
    // n_empty simultaneously contributes token volume, and the same
    // "no content" doc changes n_tokens depending on NULL vs ""
    val toks = when(length(trim(tx)) === 0, lit(0L))
      .otherwise(coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)))
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(toks).as("n_tokens"),
      sum(length(tx).cast("long")).as("n_chars"),
      countDistinct(col(sourceCol)).as("n_sources"),
      countDistinct(col(langCol)).as("n_langs"),
      sum(when(length(tx) === 0, 1L).otherwise(0L)).as("n_empty"),
      countDistinct(md5(tx)).as("n_distinct_text"))
    val topShare = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("top_c"))
    val p50 = graft.ops.quantiles.exactPercentiles(
      docs.select(lit(1).as("__g"), toks.as("__toks")), "__g", "__toks",
      Seq("p50" -> 0.5)).select(col("p50"))
    val nD = col("n_docs").cast("double")
    base.crossJoin(broadcast(topShare)).crossJoin(broadcast(p50))
      .select(explode(array(Seq(
        "n_docs" -> col("n_docs").cast("double"),
        "n_tokens" -> col("n_tokens").cast("double"),
        "n_chars" -> col("n_chars").cast("double"),
        "n_sources" -> col("n_sources").cast("double"),
        "n_langs" -> col("n_langs").cast("double"),
        "empty_rate" -> round(col("n_empty").cast("double") / nD, 6),
        "mean_doc_tokens" ->
          round(col("n_tokens").cast("double") / nD, 6),
        "exact_dup_rate" -> round(lit(1.0) -
          col("n_distinct_text").cast("double") / nD, 6),
        "p50_doc_tokens" -> round(col("p50"), 4),
        "top_source_share" ->
          round(col("top_c").cast("double") / nD, 6)).map {
          case (name, v) => struct(lit(name).as("metric"),
            v.as("value"))
        }: _*)).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
  }

  /** Within-group rank normalization of a quality metric: percent_rank
    * of each row inside its group (orderBy (metric, id) — fully
    * deterministic under ties), plus a keep flag for the top `keepTop`
    * share PER GROUP. The cross-scorer calibration step of corpus
    * selection: heterogeneous sources score on incomparable scales, so
    * selection quotas operate on within-source ranks, never raw scores
    * (otherwise one generous scorer floods the mix — the bias
    * [[domainCap]] limits by COUNT, this removes at the SCORE level).
    *
    * Two bounded shuffles: a load-balanced range partition over the
    * full sort key, then a (partition-id, group) re-key whose cells
    * never exceed one range-partition's rows — see the skew note in
    * the body.
    */
  def rankNormalize(df: DataFrame, groupCol: String, metric: Column,
                    idCol: String, keepTop: Double): DataFrame = {
    require(keepTop > 0.0 && keepTop <= 1.0,
      s"keepTop must be in (0, 1]: $keepTop")
    import org.apache.spark.sql.expressions.Window
    // NOT `percent_rank over (partition by group)`: that window buffers
    // every group in ONE task, so a dominant source (half the corpus)
    // becomes a straggler no AQE rule can split. Instead: range-
    // partition by the FULL (group, metric, id) sort key — load-
    // balanced even when one group dominates — rank within each
    // physical partition (bounded), and lift to the global within-group
    // rank by adding per-(partition, group) row-count offsets (the
    // Packing offset trick; the offsets table is ≤ partitions·groups
    // rows). percent_rank then reconstructs as (rank−1)/(n_g−1),
    // identical to the window form incl. the single-row-group → 0 case.
    // pinned ONCE: __pid is read by two independent consumers (the
    // in-partition ranking and the per-(pid, group) counts) — without
    // the materialization their correctness would hinge on exchange
    // reuse giving both the same physical partitioning, which AQE or
    // reuseExchange=false can silently break
    val staged = df.withColumn("__metric", metric)
      .repartitionByRange(col(groupCol), col("__metric"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .stage()
    val wIn = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(col("__metric"), col(idCol))
    val inPart = staged.withColumn("__rk_in", row_number().over(wIn))
    val partCounts = staged.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__pn"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per (partition, group): the running-offset window and the
    // group totals are bounded by that cardinality, never by row volume
    val offsets = partCounts
      .withColumn("__off", coalesce(sum(col("__pn")).over(wOff), lit(0L)))
      .withColumn("__ng", sum(col("__pn")).over(
        Window.partitionBy(col(groupCol))))
      .select(col("__pid"), col(groupCol), col("__off"), col("__ng"))
    val pct = when(col("__ng") > 1L,
      round((col("__rk_in") + col("__off") - 1L).cast("double") /
        (col("__ng") - 1L), 6)).otherwise(lit(0.0))
    inPart.join(broadcast(offsets), Seq("__pid", groupCol))
      .select(col(idCol), col(groupCol),
        col("__metric").as("metric"), pct.as("pct"),
        (pct >= lit(1.0) - lit(keepTop)).as("keep"))
  }

  /** Unicode-script composition of a document: counts of Latin, digit,
    * whitespace, Cyrillic, CJK and other characters as a struct — the
    * routing signal multilingual pipelines apply BEFORE language id
    * (script is a hard prior: a Cyrillic-dominant doc never enters the
    * Latin langid path) and the mojibake/binary-junk detector (high
    * `other` ratio on a supposedly-Latin source). Explicit BMP
    * code-point ranges, not \\p{Script=} classes, so the DuckDB twin
    * (RE2) and Spark (java.util.regex) compile the identical automaton.
    * Scan-local: length/regexp_replace only, no shuffle, null text
    * counts as empty. */
  def scriptCounts(text: Column): Column = {
    val tx = coalesce(text, lit(""))
    def cnt(cls: String) =
      (length(tx) - length(regexp_replace(tx, cls, ""))).as("c")
    val latin = cnt("[A-Za-z]")
    val digit = cnt("[0-9]")
    val space = cnt("[ \\t\\n\\r]")
    val cyr = cnt("[\\u0400-\\u04FF]")
    val cjk = cnt("[\\u4E00-\\u9FFF\\u3040-\\u30FF\\uAC00-\\uD7AF]")
    struct(length(tx).as("n_chars"), latin.as("latin"),
      digit.as("digit"), space.as("space"), cyr.as("cyrillic"),
      cjk.as("cjk"),
      (length(tx) - latin - digit - space - cyr - cjk).as("other"))
  }

  /** Quality scoring: token count, mean word length, punctuation ratio
    * — the standard cheap quality filters (cf. Gopher/C4 rules).
    * mean_word_len divides NON-WHITESPACE characters by the token
    * count (dividing the full length would inflate every word by ~1
    * separator char — `gopherFlags` computes the same metric). */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val punct =
      (nChars - length(regexp_replace(text,
        "[^a-zA-Z0-9 \\t\\n\\f\\r]", ""))) /
        greatest(nChars, lit(1.0))
    val nonWs =
      length(regexp_replace(text, WsClass, "")).cast("double")
    val meanWordLen = nonWs / greatest(nTokens, lit(1.0))
    struct(nTokens.as("n_tokens"), meanWordLen.as("mean_word_len"),
      punct.as("punct_ratio"))
  }

  /** Document fingerprint: md5 of the normalized text (exact-dup key), plus
    * a winnowing-style min-shingle-hash fingerprint for near-dup blocking.
    */
  def exactFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Min over shingle hashes — a 1-permutation minhash usable as a cheap
    * near-dup block key (full LSH lives in graft.dedup). Native
    * [[graft.functions.MinMd5]]: ≡ `array_min(transform(shingles, md5))`
    * without the interpreted per-element lambda. */
  def minShingleFingerprint(text: Column, k: Int): Column =
    call_function("graft_min_md5", shingles(tokens(text), k))

  /** Polynomial rolling-hash fingerprint — resolves to the native
    * [[graft.functions.RollingHash]] expression (registered by
    * GraftExtensions). */
  def rollingFingerprint(text: Column): Column =
    call_function("graft_rolling_hash", text)

  /** Within-document repetition ratio (a Gopher-style quality gate:
    * heavily templated/repeated text is low-value training data):
    * 1 − |distinct k-shingles| / |shingle windows|, 0 for docs shorter
    * than k tokens. Scan-local — the two sizes come from one token
    * array. */
  def repetitionRatio(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val windows = (size(toks) - (k - 1)).cast("double")
    round(when(windows > 0,
      lit(1.0) - size(shingles(toks, k)).cast("double") / windows)
      .otherwise(lit(0.0)), 6)
  }

  /** BPE-ish token count: greedy regex segmentation into letter runs,
    * digit runs, and punctuation runs (the shape of GPT-style pre-
    * tokenizers, without a learned merge table). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"), lit(0)))

  /** Deterministic hash-bucket in [0, buckets) for train/val/test splits:
    * stable across runs, engines, and cluster sizes (md5 of the id — no
    * RNG, no row order dependence). The standard way to split a 100 TB
    * corpus without a shuffle or a seed file. */
  def splitBucket(id: Column, buckets: Int): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("bigint") % buckets).cast("int")

  /** PII scrub for training text: emails, then phone-shaped digit runs,
    * then IPv4 literals, each replaced by a typed placeholder token. Pure
    * `regexp_replace` chain — codegen'd, scan-local, no shuffle; order
    * matters (emails carry digits, so they're replaced first).
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    regexp_replace(ip,
      "\\+?\\d[\\d\\s().-]{7,}\\d", "<PHONE>")
  }

  /** Deterministic per-stratum downsampling: keep a row iff its id's
    * md5-bucket (out of 10k) falls under the stratum's configured rate.
    * Same row set on every run/engine — reproducible corpus sampling,
    * unlike `sample()` whose seed is partition-layout-dependent. The
    * rates dim is tiny and broadcasts; the filter runs scan-local.
    *
    * @param rates (stratum value → keep fraction) pairs
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Double]): DataFrame = {
    // resolve rates to integer bucket thresholds on the driver — a float
    // boundary compare would be engine-rounding-dependent
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (k, r)) =>
      when(stratum === k, lit(math.round(r * 10000))).otherwise(acc)
    }
    df.filter(splitBucket(id, 10000) < threshold)
  }

  /** Deterministic weighted sampling WITHOUT replacement per stratum
    * (Efraimidis–Spirakis A-ES): draw k rows where each row's inclusion
    * odds are proportional to its weight, by ranking on
    * key = −ln(u)/w with u ∈ (0,1) derived from the id's md5 — the same
    * seedless engine-stable source as [[splitBucket]], so the sample is
    * identical on every run, partitioning, and engine. The whole draw
    * is one window rank per stratum (a single shuffle on the stratum
    * key); no RNG state, no driver round-trip — the way to pull a
    * length-weighted documents sample out of a 100 TB corpus
    * reproducibly.
    *
    * Ties on the double key are broken by id, so the result is total-
    * ordered even in the (measure-zero) equal-key case. Weights must be
    * strictly positive.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     stratum: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // A-ES requires strictly positive weights and a non-null id: a null
    // id hashes to a NULL key (which Spark's ascending sort ranks
    // FIRST — deterministic selection of exactly the garbage rows) and
    // a zero/negative weight flips the key's sign, inverting selection
    // odds. Such rows are ineligible by definition — drop them rather
    // than let them poison the sample
    val eligible = df.filter(id.isNotNull &&
      weight.isNotNull && weight.cast("double") > 0.0)
    // 32-bit md5 prefix → u in (0,1); +0.5 keeps ln away from 0
    val u = (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5d) / 4294967296.0d
    val key = -log(u) / weight.cast("double")
    eligible.withColumn("es_key", key)
      .withColumn("rn", row_number().over(
        Window.partitionBy(stratum).orderBy(col("es_key"), id)))
      .filter(col("rn") <= k)
      .drop("es_key", "rn")
  }

  /** All positional k-token windows of a document, duplicates included —
    * the span view for substring-level dedup. Native
    * [[graft.functions.ShingleSpans]]; `shingles` above is its distinct
    * counterpart. */
  def shingleSpans(toks: Column, k: Int): Column =
    call_function("graft_shingle_spans", toks, lit(k))

  /** Cross-document duplicated-span stats, the reporting half of
    * substring-level exact dedup (Lee et al. '21, "Deduplicating Training
    * Data Makes Language Models Better": training corpora carry verbatim
    * repeated spans that doc-level dedup never sees). A span = a k-token
    * window; a span value is DUPLICATED iff it occurs in ≥ 2 distinct
    * documents. Returns per doc: total windows, duplicated windows, and
    * the duplicated fraction — the score a span-dedup pass would cut on.
    *
    * Shape at scale: windows explode scan-local (native expression), the
    * df count is one hash-groupBy on the span's 64-bit hash (map-side
    * partial combine collapses within-doc repeats before the exchange),
    * and the per-doc rollup is a second groupBy keyed by doc — no
    * self-join, no driver state, candidate volume ∝ corpus tokens.
    * Grouping keys are xxhash64(span), 8 bytes in flight instead of the
    * ~20·k-char window text; a 2⁻⁶⁴ collision could only merge two span
    * groups, never drop a row. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String, k: Int)
  : DataFrame = {
    require(k >= 1, s"span width k must be >= 1, got $k")
    // collapse within-doc repeats FIRST: (doc, span) → occurrence count.
    // Everything downstream then works on distinct (doc, span) pairs —
    // the df count is a plain count(*) (no countDistinct Expand), and
    // the flag join-back carries one row per distinct pair instead of
    // one per occurrence.
    // staged once: the df count and the flag join-back both read it —
    // without the checkpoint the explode+groupBy subtree runs twice
    val perDoc = docs
      .select(col(idCol).as("doc_id"),
        explode(shingleSpans(tokens(col(textCol)), k)).as("w"))
      .groupBy(col("doc_id"), xxhash64(col("w")).as("wh"))
      .agg(count(lit(1)).as("c"))
      .stage()
    val dup = perDoc.groupBy("wh")
      .agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("wh"), lit(1).as("is_dup"))
    val counted = perDoc.join(dup, Seq("wh"), "left")
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("bigint").as("n_windows"),
        sum(when(col("is_dup").isNotNull, col("c")).otherwise(lit(0)))
          .cast("bigint").as("n_dup_windows"))
    // docs with fewer than k tokens have ZERO windows and would vanish
    // from the report via the explode — join them back with zero
    // counts (dup_ratio 0: nothing to duplicate), the same "every doc
    // appears" contract the sibling spanScrub keeps
    docs.select(col(idCol).as("doc_id"))
      .join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_ratio",
        when(col("n_windows") > 0,
          round(col("n_dup_windows").cast("double") / col("n_windows"),
            6)).otherwise(lit(0.0)))
  }

  /** The REMOVAL half of substring-level dedup ([[dupSpans]] is the
    * reporting half; Lee et al. '21 cut the duplicated spans, not the
    * documents): every k-token window occurring in ≥ 2 distinct docs
    * marks its k token positions for removal in EVERY doc carrying it;
    * overlapping dup windows union naturally (position-set semantics);
    * survivors reassemble in order. Returns (doc_id, n_tokens,
    * n_removed, scrubbed) where `scrubbed` is the normalized-token text
    * (the operator runs downstream of [[cleanText]], where token text
    * IS the document).
    *
    * Shape at scale: windows explode scan-local (native spans), the df
    * count collapses distinct (doc, hash) pairs map-side first, and the
    * interval → position fan-out is |dup windows|·k — bounded by the
    * duplicated mass, not the corpus. The anti-join and the per-doc
    * regroup are the only corpus-volume exchanges. The collect_list
    * buffer is bounded by one document's length. */
  def spanScrub(docs: DataFrame, idCol: String, textCol: String, k: Int)
  : DataFrame = {
    require(k >= 1, s"span width k must be >= 1, got $k")
    // NULL text → empty: the doc keeps its report row (n_tokens counts
    // the one empty token) instead of vanishing through the explode
    val toked = docs.select(col(idCol).as("doc_id"),
      tokens(coalesce(col(textCol), lit(""))).as("t"))
      .stage() // windows + the position explode both read it
    val wins = toked
      .select(col("doc_id"),
        posexplode(shingleSpans(col("t"), k)).as(Seq("wi", "w")))
      .select(col("doc_id"), col("wi"), xxhash64(col("w")).as("wh"))
      .stage() // df count + dup join-back
    val dup = wins.select("doc_id", "wh").distinct()
      .groupBy("wh").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("wh"))
    val removePos = wins.join(dup, Seq("wh"))
      .select(col("doc_id"),
        explode(sequence(col("wi"), col("wi") + k - 1)).as("pos"))
      .distinct()
    toked
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
      .join(removePos, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          c => c.getField("tok")), " ").as("scrubbed"))
      .join(toked.select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens")), Seq("doc_id"),
        "right")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("scrubbed"), lit("")).as("scrubbed"))
  }

  /** Cross-source shingle-containment matrix: for every ordered source
    * pair (a,b), the fraction of a's distinct k-shingles that also occur
    * in b — the corpus-level overlap/contamination report (which crawl
    * snapshots or vendors duplicate each other, which benchmark split
    * leaks into which training source). Asymmetric by design:
    * containment(a,b) = |Sa ∩ Sb| / |Sa|.
    *
    * Shape at scale: shingles explode scan-local and collapse to
    * distinct (source, hash) pairs map-side; the intersection counts
    * come from ONE groupBy per hash with a collect_set bounded by
    * |sources| (10s-100s in any real corpus — never corpus-sized) and a
    * scan-local pair fan-out of that set (Σ m² rows, m ≤ |sources|) —
    * no shingle-keyed self-join anywhere. Only |sources|² result rows
    * leave the final agg. */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"shingle width must be >= 1, got $k")
    val sh = docs
      .select(col(sourceCol).as("src"),
        explode(shingles(tokens(col(textCol)), k)).as("g"))
      .select(col("src"), xxhash64(col("g")).as("h"))
      .distinct()
      .stage() // set sizes + intersections both read it
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = sh.groupBy("h").agg(collect_set(col("src")).as("ss"))
      .select(explode(col("ss")).as("src_a"), col("ss"))
      .select(col("src_a"), explode(col("ss")).as("src_b"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    // EVERY ordered pair appears, including disjoint ones at zero —
    // a report matrix with missing cells is indistinguishable from
    // "not computed". The pair universe is |sources|², tiny vs corpus
    val srcs = sizes.select(col("src"))
    val allPairs = srcs.select(col("src").as("src_a"))
      .crossJoin(srcs.select(col("src").as("src_b")))
      .filter(col("src_a") =!= col("src_b"))
    allPairs
      .join(inter, Seq("src_a", "src_b"), "left")
      .join(sizes.select(col("src").as("src_a"), col("n").as("n_a")),
        Seq("src_a"))
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_a"), 6).as("containment"))
  }

  /** Per-doc interpolated-bigram LM score — the shape of a CCNet/KenLM
    * perplexity filter: p(w2|w1) = 0.7·bigram MLE + 0.3·unigram backoff,
    * scored against the corpus's own counts. Per-token logprobs are
    * snapped to integer micros at the ln boundary so the per-doc sum is
    * associative (independent of partition order and of 1-ulp ln()
    * divergence between engines). Returns (doc_id, n_bigrams,
    * lp_sum_micro); docs with < 2 tokens have no bigrams and drop out.
    *
    * Shape at scale: the token/bigram/vocab frames are staged once and
    * reused; counts are map-side-combined groupBys; the score join
    * shuffles on token keys (bounded by vocabulary, not corpus). */
  def bigramLogprobMicro(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val toked = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .stage()
    val bg = toked.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 1),
           i -> struct(element_at(t, i) AS w1,
                       element_at(t, i + 1) AS w2))""")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .stage()
    val uni = toked.select(explode(col("t")).as("w"))
    val u = uni.groupBy("w").agg(count(lit(1)).as("uc"))
      .stage()
    val tot = uni.agg(count(lit(1)).cast("double").as("t_total"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    bg.join(bc, Seq("w1", "w2"))
      .join(u.select(col("w").as("w1"), col("uc").as("u1")), Seq("w1"))
      .join(u.select(col("w").as("w2"), col("uc").as("u2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        round(log(lit(0.7) *
            (col("bc").cast("double") / col("u1").cast("double")) +
          lit(0.3) *
            (col("u2").cast("double") / col("t_total"))) * 1e6)
          .cast("long").as("lp_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp_micro")).as("lp_sum_micro"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. '19): score every
    * doc with the corpus bigram LM ([[bigramLogprobMicro]]), rank by
    * per-bigram negative log-likelihood ascending (low nll ≈ low
    * perplexity = cleanest), and cut the ranking into head / middle /
    * tail thirds. Rank-based cuts — not interpolated-percentile
    * thresholds — so the tercile boundary is exact integer math on both
    * engines (an interpolated threshold can land on a 4dp boundary and
    * round apart cross-engine). Ties order by doc_id, deterministically.
    *
    * Shape at scale: the global rank is a distributed range sort +
    * `zipWithIndex` (partition sizes and per-partition offsets — the
    * [[graft.dedup.Dedup.ngramJaccardPairs]] dictionary idiom), NEVER a
    * single-partition window; the two cutoff ranks are driver scalars
    * and the bucket label is scan-local. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val spark = docs.sparkSession
    // staged: the expensive bigram-LM frame is consumed by count(),
    // the zipWithIndex partition-size job, AND the ranked output — the
    // pin keeps the corpus-volume joins to one execution
    val nll = bigramLogprobMicro(docs, idCol, textCol)
      .select(col("doc_id"),
        (round((col("lp_sum_micro") / lit(1e6) / col("n_bigrams"))
          * 1e4) / 1e4 * lit(-1.0)).as("nll"))
      .stage()
    val n = nll.count()
    val r1 = math.ceil(n / 3.0).toLong
    val r2 = math.ceil(2.0 * n / 3.0).toLong
    val ranked = spark.createDataFrame(
      nll.sort("nll", "doc_id").rdd.zipWithIndex.map {
        case (row, idx) => org.apache.spark.sql.Row.fromSeq(
          row.toSeq :+ (idx + 1L))
      },
      nll.schema.add("rank", org.apache.spark.sql.types.LongType,
        nullable = false))
    ranked.withColumn("ppl_bucket",
      when(col("rank") <= r1, lit("head"))
        .when(col("rank") <= r2, lit("middle"))
        .otherwise(lit("tail")))
  }

  /** Per-group percentile quality gate: keep rows whose `metric` is at or
    * above their group's p-th percentile — the "top quartile per
    * language" corpus cut. The threshold is the EXACT interpolated
    * percentile via [[graft.ops.quantiles.exactPercentiles]] (spillable,
    * no whole-group buffer), joined back broadcast (one row per group).
    *
    * Both sides of the `>=` are rounded through a fixed 4dp scale
    * (the [[graft.ops.analytics.roundDouble]] pattern): at a tied
    * boundary the interpolated threshold lands exactly ON a data value,
    * and the two-sided weighted interpolation can differ from another
    * engine's lo+frac·(hi−lo) form in the last ulp — unrounded, that
    * flips inclusion of the boundary rows.
    */
  def percentileGate(df: DataFrame, groupCol: String, metric: Column,
                     p: Double): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile must be in [0,1], got $p")
    // materialized (as the name promises): the metric expression and
    // its input are read by BOTH the percentile pass and the join side
    val staged = df.withColumn("__metric", metric).stage()
    val thresholds = graft.ops.quantiles.exactPercentiles(
      staged, groupCol, "__metric", Seq("__thr" -> p))
    staged.join(broadcast(thresholds), Seq(groupCol))
      .filter(graft.ops.analytics.roundDouble(col("__metric"), 4) >=
        graft.ops.analytics.roundDouble(col("__thr"), 4))
      .drop("__metric", "__thr")
  }

  /** BM25 lexical top-k retrieval (Robertson/Sparck-Jones; the Lucene
    * variant with idf = ln(1 + (N−df+0.5)/(df+0.5))): score every
    * document against a fixed bag of query terms, return the k best.
    * The retrieval half of hybrid (lexical + ANN) search over a corpus.
    *
    * Shape at scale: tokens explode scan-local and are FILTERED to query
    * terms before any shuffle (the explode's output volume is bounded by
    * |matching occurrences|, not corpus tokens); tf and df come from one
    * partial-agg groupBy each; N, avgdl, and the per-term df are
    * broadcast scalars/rows; the final top-k is a TakeOrderedAndProject,
    * never a global sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k >= 1 && k1 > 0 && b >= 0 && b <= 1,
      s"invalid bm25 params: k=$k k1=$k1 b=$b")
    // tokenize ONCE: doc lengths, the occurrence explode, and the corpus
    // stats all read this frame — without the checkpoint the tokenizer
    // regex runs three times over the corpus
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
      .stage()
    val lens = toks.select(col("doc_id"), size(col("toks")).as("dl"))
    val occ = toks
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isInCollection(queryTerms))
    val tf = occ.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df_ = occ.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    // corpus scalars: one tiny agg, joined as a broadcast literal row
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * col("tf") /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") / col("avgdl")))
    val scored = tf
      .join(broadcast(df_), Seq("tok"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      // per-term scores round through decimal(18,8) before the sum so
      // Spark's and any other engine's float addition order can't
      // diverge the total (same trick as the decimal sum aggregates)
      .withColumn("s", round(termScore, 8).cast("decimal(18,8)"))
      .groupBy("doc_id")
      .agg(sum(col("s")).cast("double").as("score"))
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("score"), 6).as("score"))
  }

  /** Exact phrase search through a POSITIONAL inverted index — the
    * operator behind `"multi word query"` retrieval: postings are
    * (doc, position) lists per term, and a phrase hit is an
    * intersection of the m term posting lists with positions offset
    * 0..m-1 (the classic positional-index phrase algorithm, as in
    * Lucene/Manning-IR §2.4). Returns (doc_id, n_matches) for docs with
    * ≥ 1 occurrence; overlapping matches all count.
    *
    * Shape at scale: the position explode is scan-local and FILTERED to
    * the m phrase terms before any exchange (like [[bm25TopK]]'s
    * occurrence cut, volume = matching postings, not corpus tokens);
    * each of the m−1 intersection joins shuffles only the surviving
    * posting rows on (doc, aligned position). Rare-first join order
    * doesn't matter here because every join key includes the position —
    * fan-out per key is ≤ 1 row. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: String): DataFrame = {
    val terms = phrase.toLowerCase
      .replaceAll("[^a-z0-9\\s]+", " ").trim.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty,
      s"phrase has no tokens: '$phrase'")
    val post = docs
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok").isInCollection(terms.distinct))
      .stage() // each term's postings slice reads this once
    val starts = terms.zipWithIndex.map { case (term, i) =>
      post.filter(col("tok") === term)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }.reduce(_.join(_, Seq("doc_id", "start")))
    starts.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Staged (doc_id, tok, df, w, suf2, n2) weight frame shared by the
    * candidate and verify phases of [[tfidfCosinePairs]]: integer-unit
    * tf-idf weights on the `maxDfFrac`-pruned vocabulary, each row's
    * squared-suffix-norm `suf2` = Σ w² over the doc's terms from this
    * one onward in the GLOBAL (df asc, tok asc) term order, and the
    * doc's total squared norm `n2`. Exposed package-private so the
    * stop-token ScaleSmoke can count candidates directly. */
  private[graft] def tfidfWeights(docs: DataFrame, idCol: String,
                                  textCol: String, maxDfFrac: Double)
  : DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.count()
    // suffix squared norms under the global order: per-doc window, a few
    // hundred terms per partition key — never a single-partition sort
    val suffix = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    tf.join(df_, Seq("tok"))
      .filter(col("df") <= lit(maxDfFrac * n))
      .select(col("doc_id"), col("tok"), col("df"),
        round(col("tf") * log(lit(n.toDouble) / col("df")) * 1e4)
          .cast("long").as("w"))
      .withColumn("suf2",
        sum((col("w") * col("w")).cast("decimal(38,0)")).over(suffix))
      .withColumn("n2",
        sum((col("w") * col("w")).cast("decimal(38,0)"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id")))
      .stage()
  }

  /** Lossless candidate pairs for [[tfidfCosinePairs]] via AllPairs
    * prefix filtering (Bayardo et al. '07) adapted to exact integer
    * weights. A term position j of doc d is PREFIX iff the suffix norm
    * from j on satisfies √(suf2/n2) ≥ t: by Cauchy–Schwarz the common
    * terms of any qualifying pair — all of which sit at or after the
    * smallest common term g in BOTH docs' (df asc, tok asc) orderings —
    * contribute dot ≤ √suf2_a(g)·√suf2_b(g), so cos ≥ t forces g into
    * both prefixes, and a prefix×prefix equi-join on the term is a
    * candidate SUPERSET. The per-row pair bound
    * suf2_a·suf2_b ≥ t²·n2_a·n2_b (valid on the g row the lemma
    * guarantees survives) cuts further; both tests are ε-relaxed so
    * float rounding can only ADMIT a candidate, never drop a true pair.
    * Prefixes hold each doc's RAREST terms (df-ascending order puts the
    * high-idf, high-energy weights first), so a stop-token in half the
    * corpus carries near-zero suffix energy, never enters a prefix, and
    * its df² fan-out never materializes. */
  private[graft] def tfidfCandidates(w: DataFrame, threshold: Double)
  : DataFrame = {
    val pref = w.filter(col("suf2").cast("double") >=
      lit(threshold * threshold) * col("n2").cast("double") *
        lit(1.0 - 1e-9))
    pref.select(col("tok"), col("doc_id").as("doc_a"),
        col("suf2").as("s2_a"), col("n2").as("n2_a"))
      .join(pref.select(col("tok"), col("doc_id").as("doc_b"),
        col("suf2").as("s2_b"), col("n2").as("n2_b")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("s2_a").cast("double") * col("s2_b").cast("double") >=
        lit(threshold * threshold) * col("n2_a").cast("double") *
          col("n2_b").cast("double") * lit(1.0 - 1e-9))
      // n2 is functional on doc_id, so carrying it through the distinct
      // keeps cardinality = |pairs| and saves the verify phase a
      // separate norms aggregation + two corpus-sized joins
      .select("doc_a", "doc_b", "n2_a", "n2_b")
      .distinct()
  }

  /** Sparse all-pairs document similarity over tf-idf vectors: every
    * unordered pair with cosine ≥ threshold, computed through the
    * corpus INVERTED INDEX — the pair dot product Σ w_a(t)·w_b(t) only
    * has terms where both docs contain t, so joins on the term key
    * generate exactly the nonzero contributions and no dense d×d work
    * exists anywhere (the Elsayed et al. '08 pairwise-similarity shape,
    * hardened with AllPairs prefix filtering, [[tfidfCandidates]]):
    * the candidate join touches only each doc's low-df PREFIX terms —
    * a stop-token spanning half the corpus would otherwise fan out
    * (n/2)² rows on its posting list alone — and the exact dot is then
    * computed only for surviving candidate pairs. Lossless: the result
    * set is identical to the naive full postings self-join.
    *
    * `maxDfFrac` prunes terms with df > maxDfFrac·N from the VOCABULARY
    * (weights and norms are computed on the pruned vocabulary — part of
    * the operator's contract, not an approximation); with prefix
    * filtering it is no longer load-bearing for scale, just a modeling
    * knob for dropping stop-terms from the similarity definition.
    *
    * Determinism: weights tf·ln(N/df) are snapped to integer 1e-4 units
    * at the ln boundary, so dot products and norms are exact integer
    * sums (order-free, decimal accumulators); with tf ≤ ~10³ the
    * squares stay < 2⁵³ and the final double cosine is reproduced
    * bit-for-bit by any engine. */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       maxDfFrac: Double, threshold: Double)
  : DataFrame = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine threshold must be in (0, 1], got $threshold")
    val w = tfidfWeights(docs, idCol, textCol, maxDfFrac)
    val cands = tfidfCandidates(w, threshold)
    // exact verify: the inverted index restricted to candidate pairs —
    // fan-out is |cands|·|terms(a)| then the (doc_b, tok) equi-join
    // keeps only true intersections, so volume is candidate-bounded,
    // never df²
    val dots = cands
      .join(w.select(col("doc_id").as("doc_a"), col("tok"),
        col("w").as("w_a")), Seq("doc_a"))
      .join(w.select(col("doc_id").as("doc_b"), col("tok"),
        col("w").as("w_b")), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b", "n2_a", "n2_b")
      .agg(sum((col("w_a") * col("w_b")).cast("decimal(38,0)"))
        .as("dot"))
    dots
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("n2_a").cast("double")) *
          sqrt(col("n2_b").cast("double"))))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 6).as("cos"))
  }

  /** Reciprocal-rank fusion (Cormack et al. '09): merge any number of
    * ranked retrieval lists into one consensus ranking by
    * score(d) = Σ_lists 1/(k0 + rank_list(d)) — the standard hybrid
    * (BM25 + ANN) combiner, score-scale-free so lexical and vector
    * scores never need calibration.
    *
    * Each input carries (`idCol`, `rankCol`) with rank 1-based. Shape
    * at scale: the lists are already top-k bounded (|lists|·k rows
    * total), so the union + groupBy is tiny regardless of corpus size;
    * the final order is a TakeOrderedAndProject. The per-doc sum is
    * order-independent (1-2 IEEE additions of identical operands on any
    * engine). Ties (same single-list rank in disjoint lists) break by
    * id. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              k0: Int, topK: Int): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 0 && topK >= 1, s"invalid rrf params: k0=$k0 topK=$topK")
    lists.map(df => df.select(col(idCol),
        (lit(1.0) / (lit(k0) + col(rankCol))).as("__rrf")))
      .reduce(_.unionByName(_))
      .groupBy(idCol)
      .agg(sum(col("__rrf")).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), round(col("rrf_score"), 6).as("rrf_score"),
        col("n_lists"))
  }

  /** Per-domain cap: keep at most `cap` documents per `domain` value (the
    * per-source ceiling of a pretraining mix — one crawl domain must not
    * flood the corpus). Selection is deterministic and order-independent:
    * rank within each domain by (md5(id), id) and keep the first `cap` —
    * the same documents survive on any run, engine, or partitioning, and
    * the rank is a two-phase WindowGroupLimit (per-partition top-cap
    * before the exchange), so a 100 TB domain never sorts globally.
    *
    * Spark only compiles the rank filter to a WindowGroupLimit when the
    * bound is ≤ `spark.sql.window.group.limit.threshold` (default
    * 1000); above it the "pre-cut" silently degrades to a full
    * per-domain window sort — so caps past the threshold route through
    * the offset-lift rank ([[graft.ops.windows.groupedPrefixSum]])
    * automatically instead: same selection bit for bit, and the
    * dominant domain range-partitions instead of funnelling through
    * one task. PlanSpec pins both shapes.
    *
    * The offset-lift is for the FEW-HUGE-GROUPS regime only — its
    * offsets frame (#domains·#partitions rows) is broadcast, so a
    * high-cardinality domain column (millions of crawl domains) would
    * blow the driver / Spark's 8 GB broadcast hard limit. The
    * auto-route therefore gates on [[offsetLiftSafe]] (one
    * approx-distinct aggregate — at the lake a column-statistics
    * lookup, not a scan) and falls back to the plain per-domain window
    * when domains are many: with no dominant group there is no
    * straggler for the lift to fix, so slow-but-safe IS the right
    * plan there. */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String,
                cap: Int): DataFrame = {
    require(cap >= 1, s"domain cap must be >= 1, got $cap")
    val threshold = docs.sparkSession.conf
      .get("spark.sql.window.group.limit.threshold", "1000").toInt
    if (cap <= threshold || !offsetLiftSafe(docs, domainCol)) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(domainCol))
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
      docs.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= cap)
        .drop("__rk")
    } else
      graft.ops.windows.groupedPrefixSum(
          docs.withColumn("__h", md5(col(idCol).cast("string"))),
          Seq(domainCol), Seq(col("__h"), col(idCol)), lit(0L),
          rankName = "__rk")
        .filter(col("__rk") <= cap)
        .select(docs.columns.map(col): _*) // join-back reorders columns
  }

  /** Gate for the [[graft.ops.windows.groupedPrefixSum]] auto-routes
    * ([[domainCap]], [[tokenBudgetMix]]): true iff the offset-lift's
    * broadcast offsets frame (≤ #groups·#shuffle-partitions rows)
    * stays comfortably under broadcast limits. One
    * `approx_count_distinct` aggregate over the group column — the
    * bounded-scalar class of collect (ivfFilteredTopK's selectivity
    * scalars); a lake deployment answers it from column statistics.
    * The 2²² ceiling (~4M offset rows ≈ low hundreds of MB) is far
    * inside the 8 GB broadcast hard limit while still admitting every
    * few-huge-groups workload the lift exists for. */
  private def offsetLiftSafe(df: DataFrame, groupCol: String): Boolean = {
    val groups = df.agg(approx_count_distinct(col(groupCol)))
      .head.getLong(0)
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toLong
    groups * parts <= (1L << 22)
  }

  /** Canonical text cleaning for scraped corpora, the pass that runs
    * BEFORE dedup/shingling so byte-different-but-canonically-equal
    * documents collide: (1) Unicode NFC composition (native
    * [[graft.functions.Nfc]] — Spark has no built-in), (2) control and
    * format characters (C0/C1, zero-width joiners, BOMs — `\p{Cc}\p{Cf}`)
    * to spaces, (3) whitespace runs collapsed, (4) trim. Pure scan-local
    * expressions; the NFC fast path is a no-alloc `isNormalized` probe,
    * so overwhelmingly-ASCII corpora pay one table lookup per char. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      call_function("graft_nfc", text),
      "[\\p{Cc}\\p{Cf}]", " "), "\\s+", " "))

  /** Gopher-style document quality rules (Rae et al. '21 §A1.1, the
    * repetition axis lives in [[repetitionRatio]]): per-doc rule metrics
    * plus the conjunctive keep verdict. Raw whitespace words (not the
    * normalized token view) are the unit, as in the paper. Pure
    * scan-local expressions; the only lambda is the alpha-word filter
    * (bounded by doc length, interpreted per token — measured noise next
    * to the regex scans).
    *
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10] chars
    *   - symbol-to-word ratio (# and ellipsis) ≤ 0.1
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 distinct stopwords of the classic 8-word list
    */
  def gopherFlags(text: Column, minWords: Int = 50,
                  maxWords: Int = 100000): Column = {
    val words = split(trim(text), WsClass + "+")
    val nWords = size(words).cast("double")
    val nonWs =
      length(regexp_replace(text, WsClass + "+", "")).cast("double")
    val meanLen = nonWs / greatest(nWords, lit(1.0))
    // symbol OCCURRENCES, not characters: the cited Gopher rule is
    // occurrence-based — counting chars would weigh an ASCII '...' 3x
    // its Unicode '…' equivalent and filter ASCII sources ~3x harder
    val symbols =
      regexp_count(text, lit("#|\\.\\.\\.|…")).cast("double")
    val symbolRatio = symbols / greatest(nWords, lit(1.0))
    val alphaFrac = size(filter(words, w => w.rlike("[A-Za-z]")))
      .cast("double") / greatest(nWords, lit(1.0))
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStop = size(array_intersect(tokenSet(text),
      array(stops.map(lit): _*)))
    struct(
      nWords.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStop.as("n_stop"),
      (nWords >= minWords && nWords <= maxWords &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        symbolRatio <= 0.1 && alphaFrac >= 0.8 && nStop >= 2).as("keep"))
  }

  /** CCNet-style boilerplate removal by cross-document unit dedup
    * (Wenzek et al. '19 dedup lines across shards before LM filtering;
    * RefinedWeb strips nav/footer lines the same way). The unit here is
    * a non-overlapping `chunkTokens`-token chunk (the corpus has no
    * newlines, so chunks stand in for lines; the operator is
    * unit-agnostic — swap the chunker for a `split(text, '\n')` on real
    * web text). A chunk value is boilerplate iff it occurs in
    * ≥ `minDocs` DISTINCT documents; every occurrence is dropped and
    * the survivors re-join in original order.
    *
    * Returns (doc_id, n_chunks, n_dropped, clean_text) — the cleaned
    * corpus plus the audit counts a pipeline cuts on.
    *
    * Shape at scale: chunking is scan-local (one sequence+slice per
    * doc); the document-frequency count collapses within-doc repeats
    * map-side FIRST (distinct (doc, hash) pairs) so the df exchange
    * carries ≤ one 8-byte key per distinct chunk per doc; the flag
    * join-back and the per-doc reassembly are the only corpus-volume
    * shuffles (2 total). No self-join, no driver state. The
    * collect_list buffer is bounded by a single document's chunk count,
    * exactly like the reassembly in sequence packing. */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int, minDocs: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunk width must be >= 1, got $chunkTokens")
    require(minDocs >= 2, s"boilerplate needs minDocs >= 2, got $minDocs")
    val k = chunkTokens
    // ceil(n/k) chunks; the trailing partial chunk is kept (slice clamps)
    // so reconstruction of a boilerplate-free doc is lossless. NULL text
    // is treated as empty (the doc still appears, with its one empty
    // chunk) — without the coalesce the explode would silently DROP the
    // doc from the report.
    val chunks = docs
      .select(col(idCol).as("doc_id"),
        tokens(coalesce(col(textCol), lit(""))).as("t"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, cast(ceil(size(t) / $k.0) as int) - 1),
            i -> struct(i as ci,
                        array_join(slice(t, i * $k + 1, $k), ' ')
                          as chunk))""")).as("c"))
      .select(col("doc_id"), col("c.ci").as("ci"),
        col("c.chunk").as("chunk"), xxhash64(col("c.chunk")).as("h"))
      .stage() // read twice: df count + flag join-back
    val boiler = chunks.select("doc_id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("h"), lit(1).as("is_boiler"))
    chunks.join(boiler, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_boiler").isNotNull, 1).otherwise(0))
          .cast("bigint").as("n_dropped"),
        // collect_list skips NULLs, so boilerplate chunks vanish here;
        // array_sort on (ci, chunk) structs restores document order
        array_join(transform(
          array_sort(collect_list(when(col("is_boiler").isNull,
            struct(col("ci"), col("chunk"))))),
          c => c.getField("chunk")), " ").as("clean_text"))
  }

  /** Token-budget corpus mix: keep documents per source, in the seedless
    * md5 shuffle order, until each source's cumulative TOKEN count would
    * exceed its budget — the "every source contributes ≤ B tokens to the
    * training mix" allocation, where [[domainCap]]'s document cap is the
    * wrong unit (sources differ in doc length).
    *
    * The kept set is an order-prefix: a doc survives iff the running sum
    * INCLUDING it is ≤ budget, so selection is deterministic on any
    * engine/partitioning and downstream-stable when docs are added (only
    * the boundary moves). Shape at scale: one token-count scan
    * (scan-local), then a per-source running sum — a single hash
    * exchange on source + in-partition sort. With a per-doc length cap
    * L the prefix holds ≤ budget/1 rows only in the degenerate all-
    * 1-token case and ≥ budget/L rows always; a two-phase pre-cut
    * (WindowGroupLimit at rank ≤ budget, since every doc has ≥ 1 token)
    * bounds the sort input for a 100 TB source before the exact pass.
    * Spark only compiles the rank filter to a WindowGroupLimit when
    * the bound is ≤ spark.sql.window.group.limit.threshold (default
    * 1000) — budgets past the threshold therefore route through the
    * distributed per-source running sum
    * ([[graft.ops.windows.groupedPrefixSum]]) automatically: the same
    * prefix bit for bit, with the dominant source range-partitioned
    * instead of buffered in one task. PlanSpec pins both shapes.
    * Like [[domainCap]], the auto-route gates on [[offsetLiftSafe]]:
    * the lift's broadcast offsets frame is #sources·#partitions rows,
    * so a high-cardinality source column falls back to the plain
    * window (a mix with millions of sources has no dominant-source
    * straggler for the lift to fix).
    *
    * @param budgetTokens per-source token quota
    * @return kept docs + (n_tokens, cum_tokens) audit columns
    */
  def tokenBudgetMix(docs: DataFrame, idCol: String, textCol: String,
                     sourceCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1L,
      s"token budget must be >= 1, got $budgetTokens")
    // token-less docs (NULL text) are EXCLUDED up front: they contribute
    // nothing to a token mix, and dropping them is what makes "every
    // ranked doc has ≥ 1 token" true — the invariant the rank ≤ budget
    // pre-cut needs to be a sound upper bound (a NULL row would consume
    // a rank slot without consuming budget and could push a legitimate
    // doc past the cut)
    val counted = docs
      .withColumn("n_tokens",
        coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)))
      .filter(col("n_tokens") >= 1L)
    val threshold = docs.sparkSession.conf
      .get("spark.sql.window.group.limit.threshold", "1000").toLong
    // gate on the RAW frame: the cardinality probe must not pay the
    // token-count scan that `counted` carries
    if (budgetTokens <= threshold || !offsetLiftSafe(docs, sourceCol)) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(sourceCol))
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
      counted
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= budgetTokens)
        .withColumn("cum_tokens", sum(col("n_tokens")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .filter(col("cum_tokens") <= budgetTokens)
        .drop("__rk")
    } else
      // the offset-lift path needs no rank pre-cut: the running sum
      // itself is distributed, so no task ever buffers a whole source
      graft.ops.windows.groupedPrefixSum(
          counted.withColumn("__h", md5(col(idCol).cast("string"))),
          Seq(sourceCol), Seq(col("__h"), col(idCol)),
          col("n_tokens"), cumName = "cum_tokens", rankName = "__rk")
        .filter(col("cum_tokens") <= budgetTokens)
        // join-back reorders columns; match the window path's schema
        .select(docs.columns.map(col) :+ col("n_tokens")
          :+ col("cum_tokens"): _*)
  }

  /** Pointwise mutual information over token co-occurrence pairs
    * (Church & Hanks '90): PMI(a,b) = ln(p(a,b) / (p(a)·p(b))) with
    * p(a,b) estimated from sliding-window co-occurrences — the
    * collocation / word-association scorer embedding pipelines
    * (word2vec's SGNS objective is shifted PMI, Levy & Goldberg '14)
    * and phrase-mining passes consume.
    *
    * Pair generation is WINDOW-BOUNDED, never per-doc all-pairs: each
    * token row joins only its `window` successors via an offset
    * explode + (doc, pos) equi-join, so candidate volume is
    * n_tokens·window — linear in corpus size. Pairs are canonicalized
    * unordered (least/greatest). The token frame is staged once and
    * feeds the unigram counts, both join sides, and the total; corpus
    * totals T and P are two bounded driver scalars baked into the
    * scan-local PMI expression (ln in integer micros at the boundary,
    * the [[graft.text.Text]] fixed-point convention — sums stay
    * associative and the DuckDB oracle reproduces them bit-exactly).
    *
    * `minCount` prunes rare pairs BEFORE the unigram joins (the
    * classic noisy-PMI guard: a 1-count pair of two rare words maxes
    * the score).
    *
    * @return (tok_a, tok_b, c_ab, pmi_micro) — top `topK` by PMI
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               window: Int, minCount: Long, topK: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val tok = docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col(idCol).as("doc_id"), col("pos"), col("tok"))
      .stage()
    val t = tok.count()
    val uni = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    val left = tok
      .withColumn("off", explode(sequence(lit(1), lit(window))))
      .select(col("doc_id"), (col("pos") + col("off")).as("pos"),
        col("tok").as("tok_l"))
    val pc = left
      .join(tok.select(col("doc_id"), col("pos"),
        col("tok").as("tok_r")), Seq("doc_id", "pos"))
      .select(least(col("tok_l"), col("tok_r")).as("tok_a"),
        greatest(col("tok_l"), col("tok_r")).as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c_ab"))
      .stage()
    val p = pc.agg(coalesce(sum(col("c_ab")), lit(0L)).cast("long"))
      .head.getLong(0)
    pc.filter(col("c_ab") >= minCount)
      .join(uni.select(col("tok").as("tok_a"), col("c").as("c_a")),
        Seq("tok_a"))
      .join(uni.select(col("tok").as("tok_b"), col("c").as("c_b")),
        Seq("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        expr(s"cast(round(ln((c_ab * 1e0 * $t * $t) / " +
          s"($p * 1e0 * c_a * c_b)) * 1000000) as bigint)")
          .as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("tok_a"), col("tok_b"))
      .limit(topK)
  }

  /** Feature hashing (the "hashing trick", Weinberger et al. '09):
    * per-doc term frequencies bucketed into a fixed `numBuckets`-wide
    * hashed feature space, emitted as sparse COO rows (doc_id, bucket,
    * tf) — the vocabulary-free featurizer for linear classifiers /
    * MinHash inputs at corpus scale (no dictionary build, no vocab
    * shuffle, new tokens never resize anything). The exploded-row form
    * is deliberate: it stays joinable/aggregable downstream without
    * array surgery, and every cell is a scalar (array columns defeat
    * row-wise canonicalization in pandas-style comparison harnesses);
    * `collect_list(struct(bucket, tf))` reassembles dense vectors
    * per-doc when a consumer wants them, bounded by `numBuckets`.
    *
    * Scan-local hash + one map-side-combined aggregate. The bucket
    * hash is the engine-portable md5-prefix idiom
    * ([[graft.ops.relational.datasetFingerprint]]), so the oracle
    * reproduces the exact cells.
    *
    * @return (doc_id, bucket, tf) sparse rows, tf >= 1
    */
  def hashingTf(docs: DataFrame, idCol: String, textCol: String,
                numBuckets: Int): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          % numBuckets).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
  }

  /** KMV (k-minimum-values) sketch overlap between sources (Beyer et
    * al. '07): per source keep only the k SMALLEST 60-bit shingle
    * hashes; any two sketches then estimate Jaccard and union
    * cardinality from ≤2k values — the mergeable-profile form of
    * [[sourceOverlap]]. The exact version re-reads the corpus per
    * comparison; sketches are k·|sources| rows, persist with the
    * profile, and compare in milliseconds — at 100 TB that's the only
    * version that runs routinely (and sketches from disjoint
    * partitions/dates merge by "union then re-cut at k").
    *
    * Estimator: for the merged union's k smallest values U_k,
    * Ĵ = |U_k ∩ A ∩ B| / |U_k|; union cardinality (|U_k| − 1)·2⁶⁰ /
    * max(U_k) when the sketch is full, exact when it holds the whole
    * set. DETERMINISTIC approximation: the md5-prefix hash is the
    * engine-portable [[graft.ops.relational.datasetFingerprint]]
    * idiom, so the DuckDB oracle reproduces every estimate bit-exactly
    * (the error bound is a property of the hash, ~1/√k relative).
    *
    * Shape: ONE corpus-sized distinct; the per-source cut is a
    * hash-partitioned window (|sources| partitions), everything after
    * runs on the k·|sources| sketch table; per-pair frames are ≤2k
    * rows by construction.
    *
    * @return (src_a, src_b, k_used, est_inter, est_jaccard_micro,
    *         est_union) for every unordered source pair
    */
  def kmvOverlap(docs: DataFrame, sourceCol: String, textCol: String,
                 shingleK: Int, k: Int): DataFrame = {
    require(shingleK >= 1, s"shingle width must be >= 1: $shingleK")
    require(k >= 2, s"sketch size must be >= 2: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy("h")
    val sk = docs
      .select(col(sourceCol).as("src"),
        explode(shingles(tokens(col(textCol)), shingleK)).as("g"))
      .select(col("src"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
          .as("h"))
      .distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .stage()
    val srcs = sk.select("src").distinct()
    val pairs = srcs.select(col("src").as("src_a"))
      .crossJoin(srcs.select(col("src").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val ua = pairs.join(sk.select(col("src").as("src_a"), col("h")),
        Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val ub = pairs.join(sk.select(col("src").as("src_b"), col("h")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("src_a", "src_b").orderBy("h")
    ua.unionAll(ub)
      .groupBy("src_a", "src_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rnk", row_number().over(pw))
      .filter(col("rnk") <= k)
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("est_inter"),
        max(col("h")).as("__kth"))
      .select(col("src_a"), col("src_b"), col("k_used"),
        col("est_inter"),
        expr("(est_inter * 1000000L) div k_used")
          .as("est_jaccard_micro"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr("cast((cast(k_used - 1 as decimal(38,0)) * " +
            "1152921504606846976) div __kth as bigint)"))
          .as("est_union"))
  }

  /** URL decomposition for crawl curation: host, registrable domain,
    * TLD, path depth, and query-parameter count — the grouping keys
    * every web-corpus pipeline needs before [[domainCap]] (cap per
    * registrable domain, not per full host, or `a.blogspot.com` /
    * `b.blogspot.com` evade the cap) and TLD/depth quality priors
    * (deep paths and tracking-param-heavy URLs skew boilerplate).
    *
    * Pure built-in Column expressions (parse_url + array ops) —
    * codegen'd, scan-local, zero shuffle. The registrable domain is
    * the last-two-labels heuristic: correct for generic TLDs, merges
    * sibling subdomains; a public-suffix-list join is the extension
    * point when ccTLD registries (`.co.uk`) matter.
    *
    * @return struct(host, domain, tld, path_depth: int, n_params: int)
    */
  def urlFeatures(url: Column): Column = {
    val host = lower(parse_url(url, lit("HOST")))
    val labels = split(host, "\\.")
    val path = coalesce(parse_url(url, lit("PATH")), lit(""))
    val query = coalesce(parse_url(url, lit("QUERY")), lit(""))
    struct(
      host.as("host"),
      array_join(slice(labels, -least(size(labels), lit(2)),
        least(size(labels), lit(2))), ".").as("domain"),
      element_at(labels, -1).as("tld"),
      size(filter(split(path, "/"), x => x =!= "")).as("path_depth"),
      when(query === "", lit(0))
        .otherwise(size(split(query, "&"))).as("n_params"))
  }
}
