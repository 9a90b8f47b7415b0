package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.ops.{exprs, relational, windows}

/** End-to-end pipeline compositions — SURVEY.md §3 (E1-E3).
  *
  * The reference runs these as Airflow DAGs: one DAG-run per season, pandas
  * in a single process, CSV as the inter-task IR
  * (`scrape_data_to_gcs.py:56-96,268-277`). Here each pipeline is ONE
  * declarative DataFrame chain: the 26 season runs collapse into partitions
  * of a single job, the CSV IR disappears into Catalyst stages, and the only
  * cross-node boundary is a join shuffle (avoided below by broadcasting the
  * small side). At 100 TB: scans split by row-group, the season dim is a
  * few-KB broadcast, and the detail window runs per game_id partition.
  */
object Pipelines {

  /** E2 — "@yearly season backfill" (reference `games.py:6-88` driven by
    * `scrape_data_to_gcs.py:268-277`): filter unplayed (F1), drop
    * pre-season exhibition rows of the anomalous season (F6, COVID
    * analog), season→cutoff-date broadcast lookup (J4), regular-season
    * flag (M8), global sort (O1), deterministic id (M7), positional
    * rename (P2).
    */
  def e2SeasonPipeline(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val seasonDim = orders
      .select(year(col("o_orderdate")).as("season"))
      .distinct()
      .withColumn("cutoff",
        to_timestamp(concat(col("season").cast("string"), lit("-07-01"))))

    val staged = orders
      .filter(col("o_totalprice").isNotNull)                        // F1
      .withColumn("season", year(col("o_orderdate")))
      .filter(col("o_orderdate") > "1998-02-01" ||
              col("season") =!= 1998)                               // F6
      .join(broadcast(seasonDim), "season")                         // J4
      .withColumn("isRegular",
        exprs.boolFlag(col("o_orderdate") < col("cutoff")))         // M8
      .orderBy(col("o_orderdate"), col("o_orderkey"))               // O1
      .select(
        col("season"),
        col("o_orderdate"),
        col("o_totalprice"),
        col("isRegular"),
        exprs.detId(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd")))           // M7

    relational.renameAll(staged,                                    // P2
      Seq("seasonStartYear", "gameDate", "totalPrice", "isRegular", "gameId"))
  }

  val e2OracleSql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS seasonStartYear,
              o_orderdate AS gameDate,
              o_totalprice AS totalPrice,
              CASE WHEN o_orderdate <
                     CAST(year(o_orderdate) || '-07-01' AS TIMESTAMP)
                   THEN 1 ELSE 0 END AS isRegular,
              md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
                strftime(o_orderdate, '%Y-%m-%d'))) AS gameId
       FROM orders
       WHERE o_totalprice IS NOT NULL
         AND (o_orderdate > TIMESTAMP '1998-02-01'
              OR year(o_orderdate) <> 1998)
       ORDER BY o_orderdate, o_orderkey"""

  /** E1 — "@once full load" (reference `coaches.py` driven by
    * `scrape_data_to_gcs.py:199-207`): looped page scan accumulated by
    * union (S2/A1), pattern filter on the season string (F3),
    * numeric-parse filter (F4), season split (M2), conditional classify
    * (M6). The reference's per-page loop is a union of disjoint key
    * slices of ONE table — semantically the table itself, so the load
    * is a single scan here (a literal union of pmod filters would plan
    * FOUR FileScans of the same file: no Catalyst rule merges union
    * branches, and pmod never reaches parquet — 3 wasted full reads at
    * lake scale). The page-loop SHAPE — one planned partition per page
    * — lives where it belongs: the staged-pages DSV2 source (S2), and
    * the union-with-missing-columns operator is exercised by A1.
    */
  def e1FullLoadPipeline(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "part")
      .withColumn("season_raw",
        when(col("p_partkey") % 11 === 0, lit("Career"))
          .otherwise(concat((col("p_size") + 1990).cast("string"), lit("-"),
            lpad(((col("p_size") + 1991) % 100).cast("string"), 2, "0"))))
      .filter(size(split(col("season_raw"), "-")) === 2)            // F3
      .withColumn("g_raw",
        when(col("p_partkey") % 4 === 0, col("p_size").cast("string"))
          .otherwise(col("p_type")))
      .withColumn("role",
        when(col("p_partkey") % 7 === 0, lit("Player Development"))
          .otherwise(concat(col("p_brand"), lit(" Coach pro"))))
      .select(
        col("p_partkey").as("coach_key"),
        exprs.seasonStartYear(col("season_raw")).as("seasonStartYear"), // M2
        exprs.classifyCoach(col("g_raw"), col("role"),
          "Player Development").as("coachType"))                    // M6
  }

  val e1OracleSql: String =
    """WITH staged AS (
         SELECT p_partkey,
                CASE WHEN p_partkey % 11 = 0 THEN 'Career'
                     ELSE (p_size + 1990)::VARCHAR || '-' ||
                          lpad(((p_size + 1991) % 100)::VARCHAR, 2, '0')
                END AS season_raw,
                CASE WHEN p_partkey % 4 = 0 THEN CAST(p_size AS VARCHAR)
                     ELSE p_type END AS g_raw,
                CASE WHEN p_partkey % 7 = 0 THEN 'Player Development'
                     ELSE p_brand || ' Coach pro' END AS role
         FROM part)
       SELECT p_partkey AS coach_key,
              TRY_CAST(string_split(season_raw, '-')[1] AS INTEGER)
                AS seasonStartYear,
              CASE WHEN TRY_CAST(g_raw AS INTEGER) IS NOT NULL
                     THEN 'Head Coach'
                   WHEN role = 'Player Development' THEN role
                   ELSE split_part(role, 'Coach', 1) || 'Coach'
              END AS coachType
       FROM staged
       WHERE len(string_split(season_raw, '-')) = 2"""

  /** E3 — dependent detail pipeline (reference `playByplay.py:78-132`):
    * manifest (played games) drives the detail fetch (J3 — here an equi
    * join detail↔manifest on the key), per-detail-row id (M7), running
    * period counter (W1), score forward-fill with seed 0 (W2), duplicate
    * null-out (M9). The reference's per-row HTTP loop + iterrows state
    * machines become one join plus window expressions over
    * `(game_id, seq)`.
    */
  def e3DetailPipeline(spark: SparkSession, dir: String): DataFrame = {
    val manifest = t(spark, dir, "orders")
      .filter(col("o_orderstatus") =!= "P")                         // F1-ish
      .select(col("o_orderkey"))
    val detail = t(spark, dir, "lineitem")
    // Materialize the stable row order the reference gets implicitly from
    // file order (SURVEY.md §2.8, §7 hard part 1): (l_orderkey,
    // l_linenumber, l_partkey, l_suppkey) is a unique natural key, so this
    // seq is deterministic.
    val seqW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("game_id"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    // running windows share seqW's (partition, ordering) — ordering by the
    // derived seq column would be semantically identical, but Spark can't
    // prove the equivalence and would insert a second per-partition sort.
    val w = seqW.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)

    detail
      .join(manifest.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"))                                          // J3
      .withColumnRenamed("l_orderkey", "game_id")
      .withColumn("seq", row_number().over(seqW))
      .withColumn("parsed",
        when(col("seq") % 2 === 1, col("l_extendedprice")))
      .select(
        col("game_id"),
        col("seq"),
        exprs.detId(col("game_id"), col("seq")).as("play_id"),      // M7
        windows.runningCounter(col("l_quantity") > 25, w).as("period"), // W1
        windows.forwardFill(col("parsed"), w, lit(0.0))
          .as("away_points"),                                       // W2
        exprs.nullOutWhen(col("l_returnflag"),
          col("l_returnflag") === col("l_linestatus")).as("event_away")) // M9
  }

  val e3OracleSql: String =
    """WITH det AS (
         SELECT l_orderkey AS game_id, l_quantity, l_extendedprice,
                l_returnflag, l_linestatus,
                row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY l_linenumber, l_partkey, l_suppkey) AS seq
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus <> 'P')
       SELECT game_id, seq,
              md5(concat_ws('|', CAST(game_id AS VARCHAR),
                CAST(seq AS VARCHAR))) AS play_id,
              CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                OVER w AS BIGINT) AS period,
              COALESCE(last_value(
                  CASE WHEN seq % 2 = 1 THEN l_extendedprice END
                  IGNORE NULLS) OVER w, 0.0) AS away_points,
              CASE WHEN l_returnflag = l_linestatus THEN NULL
                   ELSE l_returnflag END AS event_away
       FROM det
       WINDOW w AS (PARTITION BY game_id ORDER BY seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""

  /** Corpus-preparation pipeline — the extension-surface analog of E1-E3,
    * chaining the training-data operators end to end: quality gate →
    * exact-dedup canonical selection → deterministic split assignment →
    * per-(split, lang) accounting.
    *
    * Shuffle budget at 100 TB: the quality gate and split assignment are
    * scan-local expressions; dedup is ONE shuffle (by content hash, via a
    * whole-partition window min rather than groupBy+join, so each doc's
    * keep-decision happens where its hash group lands); the final
    * accounting shuffles |kept| rows into a handful of groups with
    * map-side combine.
    */
  def corpusPrep(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Text
    val docs = t(spark, dir, "documents")
    val gated = docs
      .withColumn("q", Text.qualityScore(col("text")))
      .filter(col("q.n_tokens") >= 20 && col("q.punct_ratio") < 0.2)
    dedupSplitAccounting(gated)
  }

  /** Shared tail of both corpus-prep pipelines: exact-dedup canonical
    * selection (min doc_id per content fingerprint), deterministic
    * 90/5/5 md5-bucket split, per-(split, lang) accounting. ONE copy so
    * the dedup rule and split thresholds cannot diverge between v1 and
    * v2. */
  private def dedupSplitAccounting(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.text.Text
    df
      .withColumn("fp", Text.exactFingerprint(col("text")))
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id"))
      .withColumn("split",
        when(Text.splitBucket(col("doc_id"), 100) < 90, "train")
          .when(Text.splitBucket(col("doc_id"), 100) < 95, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
  }

  /** Corpus preparation v2 — the round-4 gates composed end to end:
    * per-language percentile quality cut (drop each language's worst
    * quartile by mean word length) → per-source domain cap (no crawl
    * domain floods the mix) → exact-dedup canonical selection →
    * deterministic split accounting.
    *
    * Extra shuffle budget vs v1: the percentile gate is one spillable
    * rank pass + a broadcast threshold join; the domain cap is one
    * two-phase WindowGroupLimit shuffle by source. Everything else is
    * unchanged from [[corpusPrep]].
    */
  def corpusPrep2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.text.Text

    val docs = t(spark, dir, "documents")
    val gated = Text.percentileGate(docs, "lang",
      Text.qualityScore(col("text")).getField("mean_word_len"), p = 0.25)
    val capped = Text.domainCap(gated, "doc_id", "source", cap = 100)
    dedupSplitAccounting(capped)
  }
}
