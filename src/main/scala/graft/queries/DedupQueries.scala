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

/** exact / MinHash-LSH / SimHash dedup and record linkage — the Dedup slice of the
  * extension surface, split out of [[ExtensionQueries]] (round 12)
  * with zero behavior change: entries are verbatim; shared artifact
  * helpers and oracle CTE fragments stay package-private in
  * [[ExtensionQueries]]. Composed back in [[ExtensionQueries.queries]]
  * / [[ExtensionQueries.oracleSql]]. */
private[graft] object DedupQueries {
  import Tables.t
  import ExtensionQueries._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Jaro-Winkler record linkage ---------------------------------------
    // typo'd part names matched back to the canonical list: blocked
    // equi-join on the first character, scored by the exact-rational
    // native graft_jaro_winkler inside whole-stage codegen — never an
    // unblocked all-pairs
    "q_jaro_linkage" -> ((s, d) => {
      val canon = t(s, d, "part").select(col("p_name").as("name"))
        .distinct()
      val typos = canon.select(
        expr("concat(substr(name,1,1), substr(name,3,1), " +
          "substr(name,2,1), substr(name,4))").as("t_name"))
      typos.withColumn("blk", expr("substr(t_name,1,1)"))
        .join(canon.withColumn("blk", expr("substr(name,1,1)")),
          Seq("blk"))
        .withColumn("jw", expr("graft_jaro_winkler(t_name, name)"))
        .filter(col("jw") >= lit(880000L))
        .select(col("t_name"), col("name").as("match_name"),
          levenshtein(col("t_name"), col("name")).as("lev"))
        .orderBy("t_name", "match_name")
    }),

    // ---- phonetic blocking linkage -----------------------------------------
    // same typo'd-names task, but candidates block on the SOUNDEX of the
    // first word (exprs.soundexKey — scan-local fold, zero shuffle to
    // key) instead of the first character: the classic phonetic blocking
    // strategy, scored by the same exact-rational Jaro-Winkler gate
    "q_phonetic_linkage" -> ((s, d) => {
      val canon = t(s, d, "part").select(col("p_name").as("name"))
        .distinct()
        .withColumn("skey",
          exprs.soundexKey(split(col("name"), " ").getItem(0)))
      val typos = canon.select(
        expr("concat(substr(name,1,1), substr(name,3,1), " +
          "substr(name,2,1), substr(name,4))").as("t_name"))
        .withColumn("skey",
          exprs.soundexKey(split(col("t_name"), " ").getItem(0)))
      typos.join(canon, Seq("skey"))
        .withColumn("jw", expr("graft_jaro_winkler(t_name, name)"))
        .filter(col("jw") >= lit(880000L))
        .select(col("t_name"), col("name").as("match_name"),
          levenshtein(col("t_name"), col("name")).as("lev"))
        .orderBy("t_name", "match_name")
    }),

    // ---- dedup -------------------------------------------------------------
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")),

    "q_dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
        numPerms = 8, numBands = 4, threshold = 0.8)),

    "q_dedup_components" -> ((s, d) =>
      Dedup.connectedComponents(
        Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8),
        "doc_a", "doc_b")),

    // ---- LSH recall against exact-Jaccard truth -------------------------------
    // measured recall of the banded MinHash pipeline vs the lossless
    // prefix-filtered exact pairs — the index-quality eval that decides
    // band/perm settings, the dedup twin of q_ann_recall. LSH output is
    // a verified SUBSET of truth, so recall = |lsh| / |truth|
    "q_lsh_recall" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // staged: truth feeds BOTH the denominator count and the hit
      // join; unstaged, the whole exact AllPairs candidate join +
      // verify ran twice (the two consumers prune different columns,
      // so no exchange reuse) — measured ~2× the truth cost per run
      val truth = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.8)
        .select("doc_a", "doc_b")
        .stage()
      val got = Dedup.minhashLshPairs(docs, "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8)
        .select("doc_a", "doc_b")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(got.join(truth, Seq("doc_a", "doc_b"))
          .agg(count(lit(1)).as("n_hit"))) // two one-row frames
        .select(col("n_truth"), col("n_hit"),
          expr("(n_hit * 1000000L) div nullif(n_truth, 0)")
            .as("recall_micro"))
    }),

    // ---- entity resolution: golden-record survivorship --------------------
    // the full ER recipe over documents-as-entities: LSH blocking →
    // match pairs → connected components as entity clusters → ONE
    // golden record per entity under deterministic survivorship rules
    // (entity id = cluster min, representative = most-complete member
    // with id tie-break, completeness stats aggregated). Singleton docs
    // are their own entity via the left join, so the output is a full
    // registry, not just the merged clusters.
    "q_entity_golden" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.goldenRecords(docs, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8),
        "doc_a", "doc_b", completenessCol = "n_chars")
    }),

    // leakage-safe split: near-dup CLUSTERS (not docs) get hashed into
    // train/val/test, so no near-copy pair can straddle the eval cut
    "q_leakage_split" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.leakageSafeSplit(docs, "doc_id",
          Dedup.minhashLshPairs(docs, "doc_id", "text",
            numPerms = 8, numBands = 4, threshold = 0.8),
          "doc_a", "doc_b", trainPct = 80, valPct = 10)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("n_chars")).as("n_chars"))
    }),

    // sorted-neighborhood ER blocking: customers sorted by zero-padded
    // balance cents (decimal-exact — the double route can round apart
    // cross-engine), window-5 pane pairs = near-balance match candidates
    "q_sorted_neighborhood" -> ((s, d) =>
      Dedup.sortedNeighborhoodPairs(
        t(s, d, "customer").select(col("c_custkey"),
          lpad(((col("c_acctbal").cast("decimal(18,2)") * 100)
              .cast("long") + 1000000).cast("string"), 9, "0")
            .as("bal_key")),
        "c_custkey", "bal_key", window = 5)),

    // corpus-level near-dup dedup: minhash pairs → components → keep one
    // doc per cluster, pass untouched docs through
    "q_dedup_keep" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.keepCanonical(docs, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8),
        "doc_a", "doc_b")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("n_chars"))
    }),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhash(t(s, d, "documents"), "doc_id", "text", bits = 16)),

    "q_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), k = 3,
        threshold = 0.5)),

    // asymmetric near-dup: ordered pairs where ≥ half of A's shingles
    // appear in B — catches a short doc embedded in a long one, which
    // the symmetric Jaccard threshold misses
    "q_containment_pairs" -> ((s, d) =>
      Dedup.containmentPairs(t(s, d, "documents"), k = 3,
        threshold = 0.5)),

    // daily-ingest dedup: "new arrivals" (every 17th doc) probed against
    // the remaining corpus via the banded index — candidates are
    // new×corpus only, never corpus×corpus
    "q_dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 17 === 0),
        docs.filter(col("doc_id") % 17 =!= 0),
        "doc_id", "text", numPerms = 8, numBands = 4, threshold = 0.8)
    }),

    // the daily-ingest cluster merge, end to end: yesterday's labels =
    // CC over corpus-side pairs; today's edges = new×new LSH pairs plus
    // new×corpus probes of the persisted index; incrementalComponents
    // folds label stars + new edges — and must reproduce the
    // from-scratch full-corpus CC exactly (the oracle recomputes it)
    "q_dedup_cc_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") % 17 =!= 0)
      val newDocs = docs.filter(col("doc_id") % 17 === 0)
      val oldLabels = Dedup.connectedComponents(
        Dedup.minhashLshPairs(corpus, "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8),
        "doc_a", "doc_b")
      val store = sharedLshIndex(s, d)
      val crossPairs = Dedup.incrementalNearDupsIndexed(newDocs,
          s.read.parquet(s"$store/sets"),
          s.read.parquet(s"$store/buckets"),
          "doc_id", "text", numPerms = 8, numBands = 4, threshold = 0.8)
        .select(col("new_id").as("a"), col("corpus_id").as("b"))
      val newNew = Dedup.minhashLshPairs(newDocs, "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      Dedup.incrementalComponents(oldLabels, "doc_id", "comp",
        crossPairs.unionByName(newNew), "a", "b")
    }),

    // the same probe against the PERSISTED index files (sharedLshIndex):
    // corpus signatures and banded buckets read at rest, only the new
    // side computes anything — must equal q_dedup_incremental exactly
    "q_lsh_index_at_rest" -> ((s, d) => {
      val store = sharedLshIndex(s, d)
      Dedup.incrementalNearDupsIndexed(
        t(s, d, "documents").filter(col("doc_id") % 17 === 0),
        s.read.parquet(s"$store/sets"),
        s.read.parquet(s"$store/buckets"),
        "doc_id", "text", numPerms = 8, numBands = 4, threshold = 0.8)
    }),

    // production-width fingerprint; compared as a 64-char bit string so
    // the oracle never has to assemble a (sign-overflowing) BIGINT
    "q_dedup_simhash64" -> ((s, d) =>
      Dedup.simhash(t(s, d, "documents"), "doc_id", "text", bits = 64)
        .select(col("doc_id"),
          lpad(bin(col("simhash")), 64, "0").as("fp_bits"))),

    "q_dedup_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text",
        bits = 16, maxHamming = 3)),

    // the production-width path end to end: 64-bit fingerprints, banded
    // candidates (16-bit bands — selective, unlike the oracle-width
    // 4-bit bands), exact hamming verify
    "q_dedup_simhash64_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text",
        bits = 64, maxHamming = 3)),

    "q_dedup_embedding" -> ((s, d) =>
      Similarity.cosineNearDupPairs(t(s, d, "embeddings"), dim = 64,
        numTables = 4, planesPerTable = 6, threshold = 0.95)),

    // ---- fuzzy join (edit-distance match under blocked candidates) --------
    // candidates are blocked on (first char, |length delta| ≤ 2) before
    // the levenshtein filter — the blocked side is broadcast, so there
    // is never an unbounded string-similarity cross product. Best match
    // per probe via one min(struct): ties break on (distance, key).
    "q_fuzzy_join" -> ((s, d) => {
      val nation = t(s, d, "nation").select("n_nationkey", "n_name")
      val typos = nation.select(col("n_nationkey").as("t_key"),
        expr("concat(substr(n_name, 1, 1), substr(n_name, 3))").as("t_name"))
      typos.join(broadcast(nation),
        expr("substr(t_name, 1, 1) = substr(n_name, 1, 1)" +
          " AND abs(length(t_name) - length(n_name)) <= 2"))
        .withColumn("dist", levenshtein(col("t_name"), col("n_name")))
        .filter(col("dist") <= 2)
        .groupBy("t_key", "t_name")
        .agg(min(struct(col("dist"), col("n_nationkey"), col("n_name")))
          .as("m"))
        .select(col("t_key"), col("t_name"), col("m.dist").as("dist"),
          col("m.n_nationkey").as("match_key"),
          col("m.n_name").as("match_name"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // first-char-blocked candidates, DuckDB's jaro_winkler as the gate
    "q_jaro_linkage" ->
      """WITH canon AS (SELECT DISTINCT p_name AS name FROM part),
         typos AS (SELECT concat(substr(name, 1, 1), substr(name, 3, 1),
                                 substr(name, 2, 1), substr(name, 4))
                     AS t_name
                   FROM canon),
         cand AS (SELECT t.t_name, c.name
                  FROM typos t JOIN canon c
                    ON substr(t.t_name, 1, 1) = substr(c.name, 1, 1))
         SELECT t_name, name AS match_name,
                levenshtein(t_name, name) AS lev
         FROM cand
         WHERE jaro_winkler_similarity(t_name, name) >= 0.88
         ORDER BY t_name, match_name""",

    // same fold as exprs.soundexKey, expressed with an explode + the
    // last-non-transparent-class window: translate table, h/w='9'
    // transparent, vowels='0' reset, first-3-kept-digits, rpad
    "q_phonetic_linkage" ->
      """WITH canon AS (SELECT DISTINCT p_name AS name FROM part),
         typos AS (SELECT concat(substr(name, 1, 1), substr(name, 3, 1),
                                 substr(name, 2, 1), substr(name, 4))
                     AS t_name
                   FROM canon),
         cw AS (SELECT name, split_part(name, ' ', 1) AS w FROM canon),
         cdg AS (SELECT name, w,
                        translate(w, 'abcdefghijklmnopqrstuvwxyz',
                          '01230129022455012623019202') AS ds
                 FROM cw),
         cch AS (SELECT name, w,
                        unnest(generate_series(1, length(ds))) AS i, ds
                 FROM cdg),
         cpv AS (SELECT name, w, i, substr(ds, i, 1) AS d,
                        last_value(CASE WHEN substr(ds, i, 1) <> '9'
                          THEN substr(ds, i, 1) END IGNORE NULLS)
                          OVER (PARTITION BY name ORDER BY i
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev
                 FROM cch),
         ckp AS (SELECT name, d,
                        row_number() OVER (PARTITION BY name
                          ORDER BY i) AS rn
                 FROM cpv
                 WHERE i > 1 AND d BETWEEN '1' AND '6'
                   AND (prev IS NULL OR d <> prev)),
         csk AS (SELECT w2.name, rpad(substr(w2.w, 1, 1) ||
                        coalesce(string_agg(k.d, '' ORDER BY k.rn)
                          FILTER (k.rn <= 3), ''), 4, '0') AS skey
                 FROM cw w2 LEFT JOIN ckp k USING (name)
                 GROUP BY w2.name, w2.w),
         tw AS (SELECT t_name, split_part(t_name, ' ', 1) AS w
                FROM typos),
         tdg AS (SELECT t_name, w,
                        translate(w, 'abcdefghijklmnopqrstuvwxyz',
                          '01230129022455012623019202') AS ds
                 FROM tw),
         tch AS (SELECT t_name, w,
                        unnest(generate_series(1, length(ds))) AS i, ds
                 FROM tdg),
         tpv AS (SELECT t_name, w, i, substr(ds, i, 1) AS d,
                        last_value(CASE WHEN substr(ds, i, 1) <> '9'
                          THEN substr(ds, i, 1) END IGNORE NULLS)
                          OVER (PARTITION BY t_name ORDER BY i
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev
                 FROM tch),
         tkp AS (SELECT t_name, d,
                        row_number() OVER (PARTITION BY t_name
                          ORDER BY i) AS rn
                 FROM tpv
                 WHERE i > 1 AND d BETWEEN '1' AND '6'
                   AND (prev IS NULL OR d <> prev)),
         tsk AS (SELECT w2.t_name, rpad(substr(w2.w, 1, 1) ||
                        coalesce(string_agg(k.d, '' ORDER BY k.rn)
                          FILTER (k.rn <= 3), ''), 4, '0') AS skey
                 FROM tw w2 LEFT JOIN tkp k USING (t_name)
                 GROUP BY w2.t_name, w2.w)
         SELECT t_name, name AS match_name,
                levenshtein(t_name, name) AS lev
         FROM tsk JOIN csk USING (skey)
         WHERE jaro_winkler_similarity(t_name, name) >= 0.88
         ORDER BY t_name, match_name""",

    "q_dedup_exact" ->
      s"""WITH fp AS (
            SELECT doc_id,
                   md5(array_to_string(string_split_regex(trim(
                     regexp_replace(lower(text), '[^a-z0-9\\s]+', ' ', 'g')),
                     '\\s+'), ' ')) AS fp
            FROM documents)
          SELECT fp, min(doc_id) AS keep_id, COUNT(*) AS n_copies
          FROM fp GROUP BY fp""",

    "q_dedup_minhash_lsh" ->
      s"""WITH $minhashPairCtes
          SELECT doc_a, doc_b, jaccard FROM mh_pairs""",

    // truth = exact-jaccard all-pairs at the same 0.8 threshold and
    // 3-token shingle unit; mh_pairs is the fragment's verified output
    "q_lsh_recall" ->
      s"""WITH $minhashPairCtes,
          truth AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(a.shset) > 0 AND len(b.shset) > 0
              AND len(list_intersect(a.shset, b.shset))::DOUBLE /
                  len(list_distinct(list_concat(a.shset, b.shset)))
                  >= 0.8),
          nt AS (SELECT COUNT(*) AS n_truth FROM truth),
          nh AS (SELECT COUNT(*) AS n_hit
                 FROM mh_pairs p JOIN truth t
                   ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b)
          SELECT nt.n_truth, nh.n_hit,
                 CAST((nh.n_hit * 1000000) // NULLIF(nt.n_truth, 0)
                   AS BIGINT) AS recall_micro
          FROM nt, nh""",

    "q_dedup_keep" ->
      s"""WITH RECURSIVE $minhashPairCtes,
          edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                    UNION SELECT doc_b, doc_a FROM mh_pairs),
          reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id),
          dropped AS (
            SELECT id FROM reach GROUP BY id HAVING id <> min(comp))
          SELECT lang, COUNT(*) AS n_kept,
                 CAST(SUM(n_chars) AS BIGINT) AS n_chars
          FROM documents
          WHERE doc_id NOT IN (SELECT id FROM dropped)
          GROUP BY lang""",

    // min-label transitive closure over the minhash near-dup graph; the
    // UNION de-dupes (id, comp) rows so the recursion reaches a fixpoint
    "q_dedup_components" ->
      s"""WITH RECURSIVE $minhashPairCtes,
          edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                    UNION SELECT doc_b, doc_a FROM mh_pairs),
          reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id)
          SELECT id AS doc_id, min(comp) AS comp,
                 (id = min(comp)) AS is_canonical
          FROM reach GROUP BY id""",

    // the incremental merge must land on the SAME partition as a
    // from-scratch CC over the whole corpus — the oracle IS the
    // q_dedup_components recomputation (different engine formulation,
    // identical fixpoint)
    "q_dedup_cc_incremental" ->
      s"""WITH RECURSIVE $minhashPairCtes,
          edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                    UNION SELECT doc_b, doc_a FROM mh_pairs),
          reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id)
          SELECT id AS doc_id, min(comp) AS comp,
                 (id = min(comp)) AS is_canonical
          FROM reach GROUP BY id""",

    // components as in q_dedup_components, then per-entity survivorship:
    // representative = (n_chars DESC, doc_id ASC) first member — the
    // same (max_by struct) rule the engine applies
    "q_entity_golden" ->
      s"""WITH RECURSIVE $minhashPairCtes,
          edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                    UNION SELECT doc_b, doc_a FROM mh_pairs),
          reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id),
          cmp AS (SELECT id AS doc_id, min(comp) AS comp
                  FROM reach GROUP BY id),
          assigned AS (
            SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS entity_id,
                   d.n_chars
            FROM documents d LEFT JOIN cmp c ON d.doc_id = c.doc_id),
          rep AS (
            SELECT entity_id, doc_id AS rep_doc_id FROM (
              SELECT entity_id, doc_id,
                     row_number() OVER (PARTITION BY entity_id
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM assigned) WHERE rn = 1)
          SELECT a.entity_id, COUNT(*) AS n_members,
                 MAX(a.n_chars) AS max_n_chars,
                 CAST(SUM(a.n_chars) AS BIGINT) AS sum_n_chars,
                 MIN(r.rep_doc_id) AS rep_doc_id
          FROM assigned a JOIN rep r ON a.entity_id = r.entity_id
          GROUP BY a.entity_id""",

    // same recursive-CTE components as q_entity_golden; split = md5
    // bucket of the CLUSTER id, mirroring Text.splitBucket
    "q_leakage_split" ->
      s"""WITH RECURSIVE $minhashPairCtes,
          edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
                    UNION SELECT doc_b, doc_a FROM mh_pairs),
          reach(id, comp) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id),
          cmp AS (SELECT id AS doc_id, min(comp) AS comp
                  FROM reach GROUP BY id),
          assigned AS (
            SELECT d.doc_id, d.n_chars,
                   COALESCE(c.comp, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN cmp c ON d.doc_id = c.doc_id),
          s AS (SELECT cluster_id, n_chars,
                       ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),
                         1, 8))::BIGINT % 100 AS bucket
                FROM assigned)
          SELECT CASE WHEN bucket < 80 THEN 'train'
                      WHEN bucket < 90 THEN 'val'
                      ELSE 'test' END AS split,
                 COUNT(*) AS n_docs,
                 COUNT(DISTINCT cluster_id) AS n_clusters,
                 CAST(SUM(n_chars) AS BIGINT) AS n_chars
          FROM s GROUP BY 1""",

    // window-5 pane over the balance-cents sort; ties break by custkey
    // — same order the distributed zipWithIndex rank uses
    "q_sorted_neighborhood" ->
      """WITH t0 AS (
           SELECT c_custkey AS id,
                  lpad(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                    AS BIGINT) + 1000000 AS VARCHAR), 9, '0') AS k
           FROM customer),
         r AS (SELECT id, k,
                      row_number() OVER (ORDER BY k, id) AS rn
               FROM t0)
         SELECT a.id AS doc_a, b.id AS doc_b,
                a.k AS key_a, b.k AS key_b
         FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 4""",

    "q_dedup_simhash" ->
      s"""WITH tok AS (
            SELECT doc_id, len($dTokens) AS n_toks,
                   unnest($dTokens) AS tok
            FROM documents),
          h AS (SELECT doc_id, n_toks, md5(tok) AS h FROM tok),
          bits AS (
            SELECT doc_id, n_toks, h, i AS bit
            FROM h CROSS JOIN range(16) r(i)),
          nib AS (
            SELECT doc_id, n_toks, bit,
                   CASE WHEN ascii(substr(h, (bit // 4)::INT + 1, 1)) <= 57
                        THEN ascii(substr(h, (bit // 4)::INT + 1, 1)) - 48
                        ELSE ascii(substr(h, (bit // 4)::INT + 1, 1)) - 87
                   END AS nibble
            FROM bits),
          bitset AS (
            SELECT doc_id, bit,
                   floor(nibble / 2 ** (3 - bit % 4))::INT % 2 AS bit_set,
                   n_toks
            FROM nib),
          ones AS (
            SELECT doc_id, bit, SUM(bit_set) AS ones,
                   max(n_toks) AS n_toks
            FROM bitset GROUP BY doc_id, bit)
          SELECT doc_id,
                 SUM(CASE WHEN ones * 2 > n_toks
                          THEN (2 ** (15 - bit))::BIGINT ELSE 0 END)::BIGINT
                   AS simhash
          FROM ones GROUP BY doc_id""",

    // 64-bit fingerprint as an ordered bit string: bit j of md5(token)
    // for j in 0..63, majority-voted per doc — assembled with string_agg
    // so no engine ever shifts into the BIGINT sign bit
    "q_dedup_simhash64" ->
      s"""WITH tok AS (
            SELECT doc_id, len($dTokens) AS n_toks,
                   unnest($dTokens) AS tok
            FROM documents),
          h AS (SELECT doc_id, n_toks, md5(tok) AS h FROM tok),
          bits AS (
            SELECT doc_id, n_toks, h, i AS bit
            FROM h CROSS JOIN range(64) r(i)),
          nib AS (
            SELECT doc_id, n_toks, bit,
                   CASE WHEN ascii(substr(h, (bit // 4)::INT + 1, 1)) <= 57
                        THEN ascii(substr(h, (bit // 4)::INT + 1, 1)) - 48
                        ELSE ascii(substr(h, (bit // 4)::INT + 1, 1)) - 87
                   END AS nibble
            FROM bits),
          bitset AS (
            SELECT doc_id, bit,
                   floor(nibble / 2 ** (3 - bit % 4))::INT % 2 AS bit_set,
                   n_toks
            FROM nib),
          ones AS (
            SELECT doc_id, bit, SUM(bit_set) AS ones,
                   max(n_toks) AS n_toks
            FROM bitset GROUP BY doc_id, bit)
          SELECT doc_id,
                 string_agg(CASE WHEN ones * 2 > n_toks THEN '1' ELSE '0'
                            END, '' ORDER BY bit) AS fp_bits
          FROM ones GROUP BY doc_id""",

    // same signature/banding math as the minhash CTEs, with candidates
    // restricted to new(doc_id%17=0) × corpus(rest)
    "q_dedup_incremental" ->
      s"""WITH tk AS (
            SELECT doc_id,
                   string_split_regex(trim(regexp_replace(lower(text),
                     '[^a-z0-9\\s]+', ' ', 'g')), '\\s+') AS tk
            FROM documents),
          sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(tk) - 2),
                     i -> array_to_string(tk[i:i+2], ' '))) AS shset
            FROM tk),
          units AS (SELECT doc_id, unnest(shset) AS u FROM sh),
          vocab AS (SELECT DISTINCT u FROM units),
          vh AS (
            SELECT u, i AS perm, md5(i::VARCHAR || ':' || u) AS h
            FROM vocab CROSS JOIN range(8) r(i)),
          mh AS (
            SELECT doc_id, perm, min(h) AS mh
            FROM units JOIN vh USING (u)
            GROUP BY doc_id, perm),
          band AS (
            SELECT doc_id, (perm // 2)::INT AS band,
                   md5(string_agg(mh, ',' ORDER BY perm)) AS bucket
            FROM mh GROUP BY doc_id, perm // 2),
          cand AS (
            SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
            FROM band a JOIN band b
              ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.doc_id % 17 = 0 AND b.doc_id % 17 <> 0)
          SELECT new_id, corpus_id,
                 round(len(list_intersect(sa.shset, sb.shset))::DOUBLE /
                   len(list_distinct(list_concat(sa.shset, sb.shset))), 6)
                   AS jaccard
          FROM cand
          JOIN sh sa ON cand.new_id = sa.doc_id
          JOIN sh sb ON cand.corpus_id = sb.doc_id
          WHERE len(list_intersect(sa.shset, sb.shset))::DOUBLE /
                  len(list_distinct(list_concat(sa.shset, sb.shset)))
                  >= 0.8""",

    // the file-backed index probe must reproduce q_dedup_incremental's
    // result exactly — same signature/banding math, same split
    "q_lsh_index_at_rest" ->
      s"""WITH tk AS (
            SELECT doc_id,
                   string_split_regex(trim(regexp_replace(lower(text),
                     '[^a-z0-9\\s]+', ' ', 'g')), '\\s+') AS tk
            FROM documents),
          sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(tk) - 2),
                     i -> array_to_string(tk[i:i+2], ' '))) AS shset
            FROM tk),
          units AS (SELECT doc_id, unnest(shset) AS u FROM sh),
          vocab AS (SELECT DISTINCT u FROM units),
          vh AS (
            SELECT u, i AS perm, md5(i::VARCHAR || ':' || u) AS h
            FROM vocab CROSS JOIN range(8) r(i)),
          mh AS (
            SELECT doc_id, perm, min(h) AS mh
            FROM units JOIN vh USING (u)
            GROUP BY doc_id, perm),
          band AS (
            SELECT doc_id, (perm // 2)::INT AS band,
                   md5(string_agg(mh, ',' ORDER BY perm)) AS bucket
            FROM mh GROUP BY doc_id, perm // 2),
          cand AS (
            SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
            FROM band a JOIN band b
              ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.doc_id % 17 = 0 AND b.doc_id % 17 <> 0)
          SELECT new_id, corpus_id,
                 round(len(list_intersect(sa.shset, sb.shset))::DOUBLE /
                   len(list_distinct(list_concat(sa.shset, sb.shset))), 6)
                   AS jaccard
          FROM cand
          JOIN sh sa ON cand.new_id = sa.doc_id
          JOIN sh sb ON cand.corpus_id = sb.doc_id
          WHERE len(list_intersect(sa.shset, sb.shset))::DOUBLE /
                  len(list_distinct(list_concat(sa.shset, sb.shset)))
                  >= 0.8""",

    // naive all-pairs ground truth over the 64-bit fingerprints; hamming
    // as a per-position bitstring diff count, so no BIGINT assembly
    "q_dedup_simhash64_pairs" ->
      s"""WITH tok AS (
            SELECT doc_id, len($dTokens) AS n_toks,
                   unnest($dTokens) AS tok
            FROM documents),
          h AS (SELECT doc_id, n_toks, md5(tok) AS h FROM tok),
          bits AS (
            SELECT doc_id, n_toks, h, i AS bit
            FROM h CROSS JOIN range(64) r(i)),
          nib AS (
            SELECT doc_id, n_toks, bit,
                   CASE WHEN ascii(substr(h, (bit // 4)::INT + 1, 1)) <= 57
                        THEN ascii(substr(h, (bit // 4)::INT + 1, 1)) - 48
                        ELSE ascii(substr(h, (bit // 4)::INT + 1, 1)) - 87
                   END AS nibble
            FROM bits),
          bitset AS (
            SELECT doc_id, bit,
                   floor(nibble / 2 ** (3 - bit % 4))::INT % 2 AS bit_set,
                   n_toks
            FROM nib),
          ones AS (
            SELECT doc_id, bit, SUM(bit_set) AS ones,
                   max(n_toks) AS n_toks
            FROM bitset GROUP BY doc_id, bit),
          fp AS (
            SELECT doc_id,
                   string_agg(CASE WHEN ones * 2 > n_toks THEN '1'
                              ELSE '0' END, '' ORDER BY bit) AS fp_bits
            FROM ones GROUP BY doc_id)
          SELECT doc_a, doc_b, hamming FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_filter(range(1, 65),
                     i -> substr(a.fp_bits, i, 1) <>
                          substr(b.fp_bits, i, 1)))::INT AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
          WHERE hamming <= 3""",

    // ground truth is the naive all-pairs definition: the Spark side's
    // prefix-filtered candidate join must reproduce it exactly
    "q_dedup_ngram_jaccard" ->
      s"""WITH staged AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(string_split_regex(trim(
                       regexp_replace(lower(text), '[^a-z0-9\\s]+', ' ',
                       'g')), '\\s+')) - 2),
                     i -> array_to_string((string_split_regex(trim(
                       regexp_replace(lower(text), '[^a-z0-9\\s]+', ' ',
                       'g')), '\\s+'))[i:i+2], ' '))) AS grams
            FROM documents
            WHERE len(string_split_regex(trim(regexp_replace(lower(text),
                  '[^a-z0-9\\s]+', ' ', 'g')), '\\s+')) >= 3)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                   len(list_distinct(list_concat(a.grams, b.grams))), 6)
                   AS jaccard
          FROM staged a JOIN staged b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
                  len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5""",

    // Mirrors Dedup.containmentPairs: same distinct-shingle staging as
    // the jaccard twin, asymmetric |A∩B|/|A| over ORDERED pairs
    "q_containment_pairs" ->
      """WITH t AS (
            SELECT doc_id,
                   string_split_regex(trim(regexp_replace(lower(text),
                     '[^a-z0-9\s]+', ' ', 'g')), '\s+') AS tk
            FROM documents),
          staged AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, len(tk) - 2),
                     i -> array_to_string(tk[i:i+2], ' '))) AS grams
            FROM t WHERE len(tk) >= 3)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                   len(a.grams), 6) AS containment
          FROM staged a JOIN staged b ON a.doc_id <> b.doc_id
          WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
                  len(a.grams) >= 0.5""",

    "q_dedup_simhash_pairs" ->
      s"""WITH tok AS (
            SELECT doc_id, len($dTokens) AS n_toks,
                   unnest($dTokens) AS tok
            FROM documents),
          h AS (SELECT doc_id, n_toks, md5(tok) AS h FROM tok),
          bits AS (
            SELECT doc_id, n_toks, h, i AS bit
            FROM h CROSS JOIN range(16) r(i)),
          nib AS (
            SELECT doc_id, n_toks, bit,
                   CASE WHEN ascii(substr(h, (bit // 4)::INT + 1, 1)) <= 57
                        THEN ascii(substr(h, (bit // 4)::INT + 1, 1)) - 48
                        ELSE ascii(substr(h, (bit // 4)::INT + 1, 1)) - 87
                   END AS nibble
            FROM bits),
          bitset AS (
            SELECT doc_id, bit,
                   floor(nibble / 2 ** (3 - bit % 4))::INT % 2 AS bit_set,
                   n_toks
            FROM nib),
          ones AS (
            SELECT doc_id, bit, SUM(bit_set) AS ones,
                   max(n_toks) AS n_toks
            FROM bitset GROUP BY doc_id, bit),
          fp AS (
            SELECT doc_id,
                   SUM(CASE WHEN ones * 2 > n_toks
                            THEN (2 ** (15 - bit))::BIGINT ELSE 0
                       END)::BIGINT AS simhash
            FROM ones GROUP BY doc_id)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 bit_count(xor(a.simhash, b.simhash))::INT AS hamming
          FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",

    "q_dedup_embedding" -> embeddingPairsSql(4, 6, 0.95),

    "q_fuzzy_join" ->
      """WITH typos AS (
           SELECT n_nationkey AS t_key,
                  substr(n_name, 1, 1) || substr(n_name, 3) AS t_name
           FROM nation),
         cand AS (
           SELECT t_key, t_name, n_nationkey, n_name,
                  CAST(levenshtein(t_name, n_name) AS INT) AS dist
           FROM typos JOIN nation
             ON substr(t_name, 1, 1) = substr(n_name, 1, 1)
            AND abs(length(t_name) - length(n_name)) <= 2
           WHERE levenshtein(t_name, n_name) <= 2)
         SELECT t_key, t_name, dist, n_nationkey AS match_key,
                n_name AS match_name
         FROM cand
         QUALIFY row_number() OVER (PARTITION BY t_key, t_name
                                    ORDER BY dist, n_nationkey) = 1""",
  )
}
