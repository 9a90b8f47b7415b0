package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.windows
import graft.Staging.StageOps

/** Corpus-mix planning under a token budget — the allocation half of
  * data-constrained pretraining (Muennighoff et al. 2023, "Scaling
  * Data-Constrained Language Models": repeated data is worth nearly as
  * much as fresh data for a few epochs, so a fixed budget should
  * waterfill epochs across sources up to per-source repeat ceilings).
  */
object Mixing {

  /** Exact integer waterfilling: find the common milli-epoch level e*
    * maximal such that Σ_s n_s · min(e*, M_s) ≤ B·1000 (token·millis),
    * then allocate n_s · min(e*, M_s) to each source.
    *
    * Closed form without iteration: sort sources by ceiling; for each
    * breakpoint r (sources 1..r−1 saturated) the affordable level is
    * e_r = (B·1000 − S_{r−1}) DIV (N − T_{r−1}) with S/T the
    * exclusive prefix sums of n·M and n. Every e_r UNDERESTIMATES e*
    * (assuming the wrong saturation set only overstates cost), and the
    * correct breakpoint achieves it — so e* = max_r e_r, one aggregate.
    *
    * Scale shape: two [[windows.distributedPrefixSum]] passes over the
    * per-source frame (range exchanges — no single-task window even at
    * 10⁷ domains), one scalar max, one broadcast back. Cumulative
    * token·milli products are decimal(38,0) (they pass int64 around
    * 10¹⁹ token·millis); divisions are `DIV`; everything is
    * oracle-reproducible bit for bit.
    *
    * @param sources per-source frame
    * @param srcCol  source key column
    * @param tokCol  per-source fresh-token count (long, ≥ 1)
    * @param capCol  per-source repeat ceiling in MILLI-epochs (long,
    *                ≥ 1) — e.g. 4000 = at most 4 epochs
    * @param budgetTokens total token budget B
    * @return (srcCol, n_tokens, max_epochs_milli, epochs_milli,
    *         alloc_tokens); epochs_milli = min(e*, M_s), alloc_tokens =
    *         n_s·epochs_milli DIV 1000. A budget above every ceiling
    *         saturates every source (e* ≥ max M). */
  def epochWaterfill(sources: DataFrame, srcCol: String, tokCol: String,
                     capCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budget must be >= 1, got $budgetTokens")
    // loud validation of the documented n ≥ 1 / m ≥ 1 domain (the
    // bandedBuckets convention): a zero-token source would drive a
    // breakpoint divisor (__ntot − t_ex) to 0 — a silent NULL candidate
    // under Spark's non-ANSI division while the DuckDB twin errors.
    // NULLs are counted explicitly (min() would skip them, waving
    // through the exact silent-NULL arithmetic the check exists to
    // close). The scalars ride the stage's own materialization job
    // (observe), so validation costs no extra pass.
    val (base, m0) = graft.Staging.stageObserved(
      sources.select(col(srcCol).as("src"),
        col(tokCol).cast("long").as("n"),
        col(capCol).cast("long").as("m")),
      count(lit(1)).as("cnt"),
      count(when(col("n").isNull || col("m").isNull, 1)).as("nnull"),
      min(col("n")).as("minn"), min(col("m")).as("minm"))
    // prefix-sum pass + final projection both read the staged frame
    require(m0("cnt").asInstanceOf[Long] >= 1L,
      "epochWaterfill needs at least one source")
    require(m0("nnull").asInstanceOf[Long] == 0L,
      s"${m0("nnull")} source rows have NULL tokCol/capCol (cast " +
        "failure or missing value) — every source needs n >= 1, m >= 1")
    require(m0("minn").asInstanceOf[Long] >= 1L,
      s"every source needs tokCol >= 1, got min ${m0("minn")}")
    require(m0("minm").asInstanceOf[Long] >= 1L,
      s"every source needs capCol >= 1 milli-epoch, got min ${m0("minm")}")
    // BOTH inclusive prefix sums (token·millis and tokens) in ceiling
    // order from ONE range exchange ([[windows.distributedPrefixSums]]
    // — running the singular version twice would pay a second exchange
    // plus a sampling pass over the first's window output). Ties
    // resolved by src — a total order, so the cums and every candidate
    // are deterministic.
    val withNm = base.withColumn("__nm",
      col("n").cast("decimal(38,0)") * col("m"))
    val pre = windows.distributedPrefixSums(withNm,
      Seq(col("m"), col("src")), Seq(col("__nm"), col("n")),
      Seq("__s", "__t"), rankName = "__r")
    val tot = broadcast(base.agg(
      sum(col("n")).cast("decimal(38,0)").as("__ntot")))
    // per-row candidate from the EXCLUSIVE cums (this row not yet
    // saturated): covers breakpoints 0..K−1; the divisor is ≥ n_row ≥ 1
    val eStar = broadcast(pre.crossJoin(tot)
      .select(expr(
        s"CAST((CAST($budgetTokens AS DECIMAL(38,0)) * 1000 " +
          "- (__s - __nm)) DIV " +
          "(__ntot - (CAST(__t AS DECIMAL(38,0)) - n)) AS BIGINT)")
        .as("__e"))
      .agg(max(col("__e")).as("e_star")))
    base.crossJoin(eStar)
      .select(col("src").as(srcCol), col("n").as("n_tokens"),
        col("m").as("max_epochs_milli"),
        least(col("e_star"), col("m")).as("epochs_milli"),
        expr("CAST((CAST(n AS DECIMAL(38,0)) * least(e_star, m)) " +
          "DIV 1000 AS BIGINT)").as("alloc_tokens"))
  }

  /** Deterministic STRIDE-INTERLEAVED training order — the dataloader
    * schedule that keeps every source at its corpus proportion in
    * EVERY prefix (classic stride scheduling: source s's k-th item
    * targets global position ≈ k·T/n_s, so after any P scheduled items
    * each source has contributed P·n_s/T ± O(1)) — the deterministic,
    * resumable analog of shuffled proportional sampling, with no RNG
    * to disagree between engines or runs.
    *
    * Integer-exact: within-source order is the md5 rank (the
    * [[Text.domainCap]] idiom), the interleave key is k·T DIV n_s with
    * ties broken by (source, k) — a total order — and BOTH ranks are
    * distributed: the per-source sequence via
    * [[graft.ops.windows.groupedPrefixSum]] (a pretraining corpus has
    * ~10–100 sources over billions of docs, so a window partitioned by
    * source alone would funnel the dominant source through one task —
    * precisely the straggler [[Text.rankNormalize]] documents) and the
    * global position via
    * [[graft.ops.windows.distributedPrefixSum]], so nothing is
    * single-task at any corpus size.
    *
    * @return (idCol, srcCol, src_seq, global_pos), a permutation of
    *         the input rows */
  def strideSchedule(df: DataFrame, srcCol: String, idCol: String)
  : DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(srcCol).as("__src"))
      .withColumn("__h", md5(col("__id").cast("string")))
    // per-source rank + source size in ONE offset-lifted pass (the
    // source size rides the same bounded offsets frame — no separate
    // per-source aggregate or join)
    val seqd = windows.groupedPrefixSum(base, Seq("__src"),
        Seq(col("__h"), col("__id")), lit(0L),
        rankName = "__seq0", totalName = "__ns")
      .withColumn("__seq", col("__seq0").cast("long"))
      .stage() // total-count pass + the keyed frame both read it
    // T counted over the STAGED frame — counting the raw df would
    // re-execute the caller's whole upstream lineage a second time
    val tot = broadcast(seqd.agg(count(lit(1)).as("__t")))
    val keyed = seqd.crossJoin(tot)
      .withColumn("__key", // decimal product: seq·T can pass int64
        expr("CAST((CAST(__seq AS DECIMAL(38,0)) * __t) DIV __ns " +
          "AS BIGINT)"))
    windows.distributedPrefixSum(keyed,
        Seq(col("__key"), col("__src"), col("__seq")), lit(0L),
        cumName = "__c", rankName = "global_pos")
      .select(col("__id").as(idCol), col("__src").as(srcCol),
        col("__seq").as("src_seq"),
        col("global_pos").cast("long").as("global_pos"))
  }
}
