package graft.ops

import graft.Staging._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operators — SURVEY.md §2.2 (P), §2.3 (F), §2.4 (J), §2.5 (A),
  * §2.6 (O). Thin, named combinators (`DataFrame => DataFrame`) so pipelines
  * read like the reference's dataflow while staying fully declarative for
  * Catalyst (pushdown, pruning, join selection all apply through these).
  */
object relational {

  /** P2 — positional rename-all (reference `set_axis`, e.g.
    * `games.py:86-87`). */
  def renameAll(df: DataFrame, names: Seq[String]): DataFrame =
    df.toDF(names: _*)

  /** P4 — positional select (reference `table.iloc[:, [i,j]]`,
    * `playerSalary.py:21`). */
  def selectPositional(df: DataFrame, idx: Int*): DataFrame =
    df.select(idx.map(i => col(df.columns(i))): _*)

  /** A1 — vertical concat with by-name alignment, missing columns → null
    * (reference `pd.concat`, e.g. `games.py:15-16,25`). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** J1 — dict-lookup equi-join (reference 37-entry team→abbrev dict,
    * `playByplay.py:84-99`). The dim side is hinted broadcast: at 100 TB the
    * fact side never shuffles for this join.
    */
  def lookupJoin(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), key)

  /** J2 — conditional override after a lookup join (reference `fixHornets`,
    * `playByplay.py:5-9`): when `cond`, replace the joined value. */
  def overrideWhen(df: DataFrame, target: String, cond: Column,
                   replacement: Column): DataFrame =
    df.withColumn(target, when(cond, replacement).otherwise(col(target)))

  /** O3 — deterministic top-k: total order (ties broken by `tieBreak`) then
    * limit. Spark plans this as TakeOrderedAndProject — no global sort, each
    * partition keeps k rows, driver merges k·p rows. */
  def topK(df: DataFrame, n: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(n)

  /** A3/O3 — last-row probe (reference `boxScores.py:48-49`:
    * `table['MP'][-1:].max()` reads the team-totals row to classify the
    * table). Distributed form: sort-desc + limit(1), which Spark plans as
    * TakeOrderedAndProject — each partition keeps its own top-1, the
    * driver merges p candidate rows; no global sort, no single-partition
    * window. */
  def lastRow(df: DataFrame, order: Column*): DataFrame =
    df.orderBy(order.map(_.desc): _*).limit(1)

  /** CDC-style latest-wins upsert: union the incoming batch onto the base
    * table and keep, per key, the row with the highest `version`. The
    * reference's Airflow catchup re-runs a season and overwrites its
    * partition (`scrape_data_to_gcs.py:264-266`); this is the same
    * semantic as one relational operator — re-scraped rows supersede.
    *
    * One shuffle on the key; the window's per-key top-1 never
    * materializes more than the union. `version` must be totally ordered
    * per key (ties would be nondeterministic — use an ingest timestamp or
    * a monotone batch id).
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, keys: Seq[String],
                   version: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(version).desc)
    base.unionByName(updates, allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Skew-mitigating equi-join: salt the (skewed) fact side into
    * `numSalts` sub-keys and replicate the dim side once per salt, so one
    * hot key spreads over `numSalts` reducers instead of melting a single
    * one. Semantically identical to `fact.join(dim, key)` (inner).
    *
    * AQE's skew-join handling covers sort-merge joins at runtime; explicit
    * salting remains the tool when the skew is extreme or the join is
    * hash-partitioned upstream of further keyed work.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 numSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(numSalts)).cast("int"))
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(dimExp, Seq(key, "__salt")).drop("__salt")
  }

  /** Order-independent dataset fingerprint: (row count, commutative
    * content hash) over a canonical projection — the integrity stamp for
    * dataset versioning ("is this the same data I trained on?"). The
    * hash is the SUM (mod 2⁶⁰) of each row's md5-prefix, so it is
    * independent of row order, partitioning, and cluster size, and any
    * single-row change moves it. Scan-local per row + one partial-agg
    * shuffle of two numbers — the 100 TB cost is one pass.
    *
    * 60-bit per-row values (15 hex chars) keep every intermediate inside
    * engine-portable integer ranges; the sum runs in decimal(38,0) so it
    * cannot overflow short of 10¹⁹ rows.
    *
    * Nulls are encoded as a NUL-byte sentinel (not skipped): concat_ws
    * alone drops null columns, which would collide rows that differ only
    * in WHICH column is null — (a,NULL,b) vs (a,b,NULL). The sentinel
    * cannot appear in sane text data; callers with NUL-bearing strings
    * should pre-escape. Each value is additionally LENGTH-PREFIXED
    * (`len:value`) before joining, so a separator character inside a
    * value cannot shift field boundaries. */
  def datasetFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    // length-prefix (`len:value`) so a separator character inside a
    // value cannot shift field boundaries - without it ("a|b", "c") and
    // ("a", "b|c") encode identically, defeating the single-row-change
    // guarantee
    val enc = cols.map { c =>
      val v = coalesce(col(c).cast("string"), lit("\u0000"))
      concat(length(v).cast("string"), lit(":"), v)
    }
    val rowHash = conv(substring(
      md5(concat_ws("|", enc: _*)),
      1, 15), 16, 10).cast("decimal(38,0)")
    df.agg(count(lit(1)).as("n_rows"),
      pmod(sum(rowHash), lit(BigDecimal(2).pow(60)).cast("decimal(38,0)"))
        .cast("string").as("content_hash"))
  }

  /** Incremental aggregate maintenance (materialized-view merge): fold a
    * delta batch's partial summary into an existing summary WITHOUT
    * rescanning the base data — the update step of an incrementally
    * maintained rollup table. Both inputs carry the same shape
    * (keys + mergeable measures: counts, sums, min/max would need their
    * own merge fn); the merge is one groupBy summing every measure, and
    * at 100 TB its cost is |summary| + |delta|, independent of base
    * history. Averages must be stored as (sum, count) — they are not
    * directly mergeable; that decomposition is the caller's contract.
    */
  def incrementalAgg(baseSummary: DataFrame, deltaSummary: DataFrame,
                     keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "incrementalAgg needs grouping keys")
    val measures = baseSummary.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "incrementalAgg needs measure columns")
    // sum widens types (bigint stays, decimal(p,s) → decimal(p+10,s));
    // cast each merged measure back to its declared summary type so the
    // maintained table's schema is stable across merges. Under non-ANSI
    // mode a narrowing overflow would silently become null and corrupt
    // the maintained rollup — fail loudly instead: the cast may only be
    // null where the widened sum itself is null (all-null inputs).
    val merged = measures.map { c =>
      val dt = baseSummary.schema(c).dataType
      val widened = sum(col(c))
      val back = widened.cast(dt)
      when(back.isNull && widened.isNotNull,
        raise_error(concat(
          lit(s"incrementalAgg: merged measure '$c' overflows " +
            s"${dt.simpleString}: "), widened.cast("string"))))
        .otherwise(back).as(c)
    }
    baseSummary.unionByName(deltaSummary)
      .groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Snapshot diff: classify every key as added / removed / changed /
    * unchanged between two table versions — the audit half of a lake
    * upsert (what did this batch actually do?), and the input to
    * incremental downstream refresh (propagate only added∪changed).
    *
    * One full-outer shuffle join on the key; change detection is
    * null-safe column equality (`<=>`) over the compared columns, so a
    * null→value transition counts as a change, not a match. Both sides
    * must be keyed (at most one row per key — dedupe/version first, e.g.
    * via [[upsertLatest]]).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    val o = oldDf.select((keys ++ compareCols).map(col): _*).as("o")
    val n = newDf.select((keys ++ compareCols).map(col): _*).as("n")
    val keyCond = keys.map(k => col(s"o.$k") === col(s"n.$k"))
      .reduce(_ && _)
    val same = compareCols.map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduce(_ && _)
    o.join(n, keyCond, "full_outer")
      .withColumn("change_type",
        when(keys.map(k => col(s"o.$k").isNull).reduce(_ && _), "added")
          .when(keys.map(k => col(s"n.$k").isNull).reduce(_ && _),
            "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .select(keys.map(k =>
        coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) :+
        col("change_type"): _*)
  }

  /** k-anonymity suppression gate (Sweeney '02): rows whose
    * quasi-identifier combination occurs fewer than k times have those
    * columns masked to "*" — the release gate for training data carrying
    * indirect identifiers (a rare attribute combination re-identifies
    * even with direct identifiers stripped).
    *
    * Shape: a map-side-combined groupBy over the quasi key, then a
    * null-safe (`<=>`) hash join of the |groups|-row count table back
    * onto the rows — NOT a `count over (partition by quasi)` window:
    * the window form buffers every group in one task, so a degenerate
    * quasi column (all null, one dominant value) turns into a single
    * straggler at lake scale, while the join form streams and AQE can
    * skew-split it. Nulls group together on both sides (groupBy and
    * `<=>` share that semantics), matching the window behavior.
    * Masked values are cast to string — masking is a domain
    * generalization, so the output column type is the generalized
    * (string) domain.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long)
  : DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier cols")
    require(k >= 1, s"k must be >= 1: $k")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__grp_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+
        col("__grp_n"): _*)
    val cond = quasiCols.map(c => df(c) <=> counts(s"__q_$c"))
      .reduce(_ && _)
    val keep = df.columns.filterNot(quasiCols.contains).toSeq
    df.join(counts, cond)
      .select(
        keep.map(col) ++
          quasiCols.map(c =>
            when(col("__grp_n") < k, lit("*"))
              .otherwise(col(c).cast("string")).as(c)) :+
          (col("__grp_n") < k).as("suppressed") :+
          col("__grp_n").as("grp_n"): _*)
  }

  /** l-diversity release gate (Machanavajjhala et al. '07) — the
    * homogeneity patch on [[kAnonymity]]: a quasi-identifier group can
    * be k-anonymous yet still leak its SENSITIVE attribute when every
    * member shares one value (the "everyone in this zip+age bucket has
    * the same diagnosis" attack). A group passes only when its members
    * span at least `l` distinct sensitive values; rows of failing
    * groups get the sensitive value masked to "*" and flagged.
    *
    * Shape: distinct (quasi, sensitive) projection → map-side-combined
    * groupBy for the per-group diversity (two-level agg, never a
    * `count(distinct) over` window that buffers a group per task),
    * then the same null-safe join-back as [[kAnonymity]]. Nulls: a
    * null sensitive value counts as one distinct value (the projection
    * `distinct` groups it), and null quasi values group together.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs quasi-identifier cols")
    require(l >= 1, s"l must be >= 1: $l")
    val div = df.select((quasiCols :+ sensitiveCol).map(col): _*)
      .distinct()
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__div"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+
        col("__div"): _*)
    val cond = quasiCols.map(c => df(c) <=> div(s"__q_$c"))
      .reduce(_ && _)
    val keep = df.columns.filterNot(_ == sensitiveCol).toSeq
    df.join(div, cond)
      .select(
        keep.map(col) :+
          when(col("__div") < l, lit("*"))
            .otherwise(col(sensitiveCol).cast("string"))
            .as(sensitiveCol) :+
          (col("__div") < l).as("at_risk") :+
          col("__div").as("sens_diversity"): _*)
  }

  /** t-closeness (Li et al. 2007) for a CATEGORICAL sensitive
    * attribute: per quasi-identifier group, the variational distance
    * ½·Σ|p_i − q_i| between the group's sensitive distribution and the
    * table-wide one — the release gate that catches what l-diversity
    * misses (a group can be diverse yet skewed).
    *
    * Distributions are micro-quantized FIRST (p_micro = c·10^6 DIV n_g,
    * a deterministic truncation both engines share), then compared —
    * so every product stays ≤ 10^6·count and nothing approaches the
    * n_g·N cross-products that would overflow int64 on a 10^12-row
    * table. Quantization error is ≤ |domain|·10^−6/2 — far below any
    * useful threshold — and, crucially, bit-identical everywhere.
    *
    * Plan: one (quasi × sensitive) count, one sensitive-marginal count
    * (broadcast — bounded by the sensitive domain), one group rollup.
    * A group missing a sensitive value entirely contributes that
    * value's full global mass via the marginal-side union. No window,
    * no driver state; the output is one row per group. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, tMicro: Long): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs quasi-identifier cols")
    require(tMicro >= 0, s"tMicro must be >= 0: $tMicro")
    val cells = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .stage() // marginals + the dense grid below all read it
    val global = cells.groupBy(col(sensitiveCol))
      .agg(sum(col("__c")).as("__gq"))
      .crossJoin(broadcast(
        cells.agg(sum(col("__c")).cast("long").as("__n"))))
      .select(col(sensitiveCol), expr(
        "CAST(__gq * 1000000 DIV __n AS BIGINT)").as("__qm"))
    val totals = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__ng"))
    // dense (group × sensitive-domain) grid: zero-count cells still
    // contribute |0 − q_i| — build it from the group list × the
    // broadcast domain, then left-join the observed counts
    totals.crossJoin(broadcast(global))
      .join(cells, quasiCols :+ sensitiveCol, "left")
      .withColumn("__pm", expr(
        "CAST(COALESCE(__c, 0) * 1000000 DIV __ng AS BIGINT)"))
      .groupBy((quasiCols.map(col) :+
        col("__ng").cast("long").as("n_group")): _*)
      .agg(expr("CAST(sum(abs(__pm - __qm)) DIV 2 AS BIGINT)")
        .as("t_micro"))
      .withColumn("releasable", col("t_micro") <= tMicro)
  }
}
