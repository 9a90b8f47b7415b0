package graft.ops

import graft.Staging._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over event streams: ordered funnels,
  * cohort retention, and slowly-changing-dimension (SCD type-2)
  * interval construction.
  *
  * All three are single-shuffle-key designs: every join/aggregate keys
  * on the entity id (user/customer), so consecutive stages reuse the
  * same hash partitioning and AQE coalesces the (monotonically
  * shrinking) intermediate frames. No driver-side state anywhere.
  */
object analytics {

  /** Ordered funnel: for each stage k > 0, a user counts as "reached"
    * iff they have an event of stage k STRICTLY AFTER their first
    * qualifying event of stage k-1 (the classic first-touch funnel).
    *
    * Plan shape — ONE scan, one shuffle: the events table is filtered
    * to the stage set once, grouped by user (the single shuffle), and
    * each user's (ts, stage) list is folded in ascending-ts order into
    * the k reach timestamps. The fold computes exactly the recursive
    * definition tₖ = min{stage-k ts > tₖ₋₁}: processing in ascending
    * order means tₖ₋₁ is final before any event that could qualify for
    * stage k arrives, and equal-ts events can never qualify under the
    * strict `>` in either formulation, so tie order is irrelevant
    * (AnalyticsSpec pins both properties and the scan count). The
    * former k-pass shape — one filter-scan + user-key shuffle PER
    * stage — read the events table k times; a 10-stage funnel over
    * 100 TB of events is 10 full scans vs this one. Per-user state is
    * that user's stage events only (the same bound every per-entity
    * stateful op — sessionization, SCD2 — carries), never the corpus;
    * as with those ops, a degenerate hot key (bot traffic, a null/
    * default user id with millions of events) concentrates one
    * aggregation buffer and belongs filtered or capped upstream.
    *
    * @return one row per non-empty stage: (stage_idx, stage, n_users)
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val k = stages.size
    val tsType = events.select(col(tsCol)).schema.head.dataType
    val folded = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), col(typeCol).as("tp")).as("__e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(col(userCol),
        aggregate(col("__evs"),
          array_repeat(lit(null).cast(tsType), k),
          (acc, e) => transform(acc, (t, i) =>
            // keep a reach time once set; otherwise this event sets
            // slot i iff it is slot i's stage NAME (compared per slot,
            // not via a type→index map, so a stage may legitimately
            // repeat — "view, click, view" re-engagement funnels) and
            // it is strictly after the previous stage's reach (slot 0
            // needs no predecessor — the when() keeps
            // element_at(acc, 0) unevaluated)
            coalesce(t,
              when(e.getField("tp") === element_at(typedLit(stages),
                  i + 1) &&
                when(i === 0, lit(true))
                  .otherwise(e.getField("ts") > element_at(acc, i)),
                e.getField("ts")))))
          .as("__reach"))
    folded
      .select(posexplode(col("__reach")).as(Seq("stage_idx", "__t")))
      .filter(col("__t").isNotNull)
      .groupBy(col("stage_idx"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("stage_idx"),
        element_at(typedLit(stages), col("stage_idx") + 1).as("stage"),
        col("n_users"))
  }

  /** Cohort retention grid: users are assigned to the cohort of their
    * first active day; each (cohort_day, day_offset) cell counts the
    * distinct cohort members active that many days later.
    *
    * Two aggregates and one join, all keyed on the user id. The
    * activity frame is de-duplicated to (user, day) BEFORE the join so
    * fan-out is bounded by active days, not raw events.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("__day")).distinct()
    val cohorts = activity.groupBy(col(userCol))
      .agg(min(col("__day")).as("cohort_day"))
    activity.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** SCD type-2 interval construction: collapse an ordered change
    * history per key into validity intervals of `attrCol` — one row per
    * (key, run of equal attr values), with the interval start, the next
    * change's start as the (exclusive) end, and a current-row flag.
    *
    * Gaps-and-islands via two window passes over the same
    * (key, order) sort: lag() to find change points, then lead() over
    * the filtered change rows for interval ends. One shuffle; the
    * second window reuses the first's partitioning and ordering.
    *
    * `orderCols` must make the sort total per key (include tie-breaks)
    * or interval boundaries are nondeterministic.
    */
  def scd2Intervals(history: DataFrame, keyCol: String,
                    tsCol: String, orderCols: Seq[Column],
                    attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    // null-safe change detection: `prev =!= attr` evaluates to NULL
    // (not true) on a value→null transition, silently dropping that
    // change point, and `prev IS NULL` both marks the first row AND
    // fires on every row after a null attr (splitting a null run into
    // one interval per row). A lag'd constant disambiguates "first
    // row" from "previous attr was null", and <=> compares null-safely
    val changes = history
      .withColumn("__prev_attr", lag(col(attrCol), 1).over(w))
      .withColumn("__first", lag(lit(1), 1).over(w).isNull)
      .filter(col("__first") ||
        !(col("__prev_attr") <=> col(attrCol)))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Robust per-group outliers via the modified z-score
    * (Iglewicz–Hoaglin): z = 0.6745·(x − median) / MAD, flagging
    * |z| > zThresh. Median/MAD instead of mean/stddev so the threshold
    * itself isn't dragged by the outliers it is meant to find — the
    * difference between a usable anomaly screen and a circular one on
    * heavy-tailed pipeline metrics.
    *
    * Both medians come from [[quantiles.exactPercentiles]] — the
    * spillable sort-based formulation, no whole-group buffers — and the
    * tiny per-group stat frames broadcast into the scoring joins, so
    * the data-sized frames are never reshuffled: two group-keyed sorts
    * and two broadcast joins total.
    *
    * Median and MAD are rounded to 4 decimals before scoring: the score
    * and the |z| > threshold cut are then pure IEEE-double arithmetic on
    * identical inputs in any engine, which keeps the flagged set
    * reproducible cross-engine (the correctness-gate requirement).
    *
    * Rounding itself must ALSO mirror the oracle engine's op sequence:
    * DuckDB rounds a DOUBLE as `std::round(x·10ⁿ)/10ⁿ`, and the multiply
    * can pull a value sitting one ulp UNDER a .5 boundary exactly onto
    * it (observed at sf0.1: z = 3.85224999…97, ·10⁴ = exactly 38522.5 →
    * 3.8523, where decimal-exact HALF_UP gives 3.8522). [[roundDouble]]
    * reproduces that sequence — Spark's `round(x)` at scale 0 is
    * half-away-from-zero like `std::round`, and the multiply/divide are
    * the same IEEE ops — so boundary values agree at every scale.
    */
  private[graft] def roundDouble(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    round(c * f) / f
  }

  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     idCols: Seq[String], zThresh: Double = 3.5)
  : DataFrame = {
    val vals = df.select((groupCol +: valueCol +: idCols).map(col): _*)
      .filter(col(valueCol).isNotNull)
    val med = quantiles.exactPercentiles(vals, groupCol, valueCol,
      Seq(("__med", 0.5)))
      .withColumn("__med", roundDouble(col("__med"), 4))
    val dev = vals.join(broadcast(med), Seq(groupCol))
      .withColumn("__absdev", abs(col(valueCol) - col("__med")))
    val mad = quantiles.exactPercentiles(dev, groupCol, "__absdev",
      Seq(("__mad", 0.5)))
      .withColumn("__mad", roundDouble(col("__mad"), 4))
    dev.join(broadcast(mad), Seq(groupCol))
      // MAD = 0 (≥ half the group identical) leaves the modified
      // z-score undefined — null it (no flags from that group) instead
      // of dividing by zero, which the session's default ANSI mode
      // raises as a job-killing error. Constant-majority groups are
      // unscoreable by this estimator; callers screening them should
      // gate on a dispersion check first
      .withColumn("robust_z",
        when(col("__mad") =!= 0.0,
          roundDouble(lit(0.6745) * (col(valueCol) - col("__med")) /
            col("__mad"), 4)))
      .filter(abs(col("robust_z")) > zThresh)
      .select((idCols :+ groupCol :+ valueCol).map(col) :+
        col("robust_z"): _*)
  }

  /** Group-wise least-squares trend: OLS slope + intercept of y over x
    * per key, from ONE map-side-combined aggregation of exact integer
    * moment sums — the "is this supplier's volume drifting" fit that a
    * per-group `regr_slope` would compute with an order-dependent
    * double tail. x is an integer regressor (e.g. days since an
    * epoch), y is snapped to integer cents before the moments, so all
    * five sums are exact: the products are evaluated IN decimal(38,0)
    * (never in long, whose x² would wrap for a caller passing unix
    * seconds/micros as x), and a decimal sum that somehow exceeds 38
    * digits fails loudly under ANSI rather than wrapping. The closed-form
    * slope/intercept are ONE deterministic double division each, 6dp.
    * A degenerate group (all x equal, denominator 0) yields null
    * slope/intercept rather than ±Inf.
    *
    * @return (keyCol, n, slope, intercept) — slope/intercept in y
    *         units per x unit, 6dp
    */
  def groupTrend(df: DataFrame, keyCol: String, x: Column, y: Column)
  : DataFrame = {
    val xi = x.cast("long")
    val yc = round(y * 100).cast("long")
    // the fit is over OBSERVED (x, y) pairs: a null on either side must
    // drop the whole row, or n counts rows the moment sums skipped and
    // the closed-form slope/intercept fit no subset of the data
    val agged = df
      .filter(xi.isNotNull && yc.isNotNull)
      .groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(xi.cast("decimal(38,0)")).as("sx"),
      sum(yc.cast("decimal(38,0)")).as("sy"),
      // cast BEFORE multiplying: a long×long product would silently
      // wrap for large regressors (unix micros squared ≈ 2.9e33 ≫
      // Long.Max) — decimal(38,0)×decimal(38,0) holds any long×long
      // product exactly (≤ 8.5e37 < 10³⁸). The decimal SUM can still
      // exceed 38 digits for extreme regressor × group-size combos
      // (micros² × ≥3.4e7 rows/group); under the session's default
      // ANSI mode that fails LOUDLY (ARITHMETIC_OVERFLOW), never wraps
      sum(xi.cast("decimal(38,0)") * yc.cast("decimal(38,0)")).as("sxy"),
      sum(xi.cast("decimal(38,0)") * xi.cast("decimal(38,0)")).as("sxx"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val denom = nD * col("sxx").cast("double") - sxD * sxD
    val slopeCents = (nD * col("sxy").cast("double") - sxD * syD) / denom
    val slope = when(denom =!= 0.0, round(slopeCents / 100.0, 6))
    val intercept = when(denom =!= 0.0,
      round((syD - slopeCents * sxD) / nD / 100.0, 6))
    agged.select(col(keyCol), col("n"), slope.as("slope"),
      intercept.as("intercept"))
  }

  /** Gini coefficient of a weight column over its rows — the corpus-mix
    * concentration report (how unevenly do sources contribute tokens;
    * 0 = perfectly even, →1 = one source is the corpus). Standard
    * sorted-rank form G = 2·Σ i·w_i / (n·Σw) − (n+1)/n over weights
    * ascending (ties broken by the key for determinism).
    *
    * The global rank comes from [[windows.distributedPrefixSum]] — a
    * range exchange plus per-partition windows — NOT a single-partition
    * sort: the operator is generic over whatever grouping the caller
    * aggregated to, and the natural 100 TB inputs (Gini over domains or
    * URL hosts) have 10⁷–10⁸ groups, far past what one task should sort.
    * Exact integer products; one double division, 6dp.
    *
    * @return one row (n_groups, total_weight, gini); empty/zero-mass
    *         input yields null gini
    */
  def giniConcentration(weights: DataFrame, keyCol: String,
                        weightCol: String): DataFrame = {
    windows.distributedPrefixSum(
        weights.select(col(keyCol), col(weightCol)),
        Seq(col(weightCol), col(keyCol)), lit(0L),
        cumName = "__c", rankName = "__rk")
      .withColumn("__i", col("__rk").cast("decimal(38,0)"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col(weightCol).cast("decimal(38,0)")).as("total_weight"),
        sum(col("__i") * col(weightCol).cast("decimal(38,0)"))
          .as("__iw"))
      .select(col("n_groups"),
        col("total_weight").cast("bigint").as("total_weight"),
        when(col("n_groups") > 0 && col("total_weight") > 0,
          round(lit(2.0) * col("__iw").cast("double") /
            (col("n_groups").cast("double") *
              col("total_weight").cast("double")) -
            (col("n_groups") + 1).cast("double") /
              col("n_groups").cast("double"), 6)).as("gini"))
  }

  /** Pearson χ² test of independence between two categorical columns —
    * the data-quality alarm for "is language independent of source?"
    * (a skewed cell means one crawl source is quietly deciding a
    * language's representation) and for drift checks between dataset
    * versions. Returns the statistic, not a p-value: the engine has no
    * χ² CDF, and pipelines threshold the statistic against the dof
    * anyway.
    *
    * ONE corpus-sized aggregate (the contingency groupBy, map-side
    * combined); everything after runs on the |A|·|B| cell table —
    * report-sized by definition (the crossJoins are margin×margin and
    * margin×one-row, the audited bounded-frame pattern). ZERO cells
    * (expected > 0, observed 0) are materialized via the margin cross
    * join — dropping them understates χ², the classic mistake. The
    * per-cell term lands as integer micros so the final sum is
    * order-independent and engine-exact.
    *
    * Precision caveat — weaker than the fully-integer neighbors here:
    * the per-cell term (o − rt·ct/n)²/(rt·ct/n) is DOUBLE arithmetic
    * rounded half-up to micros, and a term landing exactly on a .5
    * micro boundary could round differently on an engine whose double
    * path differs in the last bit. The exact-rational form
    * ⌊10⁶·(o·n − rt·ct)²/(n·rt·ct)⌋ needs ~n⁴·10⁶ headroom — past
    * decimal(38,0)/HUGEINT at ~10⁸ rows — so at corpus scale the
    * double term is the correct trade; a χ² statistic is itself an
    * asymptotic quantity, and a 1-micro wobble is far below its
    * interpretive resolution.
    *
    * @return one row: (chi2_micro, dof, n)
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .stage()
    val rt = o.groupBy("a").agg(sum(col("o")).as("rt"))
    val ct = o.groupBy("b").agg(sum(col("o")).as("ct"))
    val nn = o.agg(sum(col("o")).as("n"))
    rt.crossJoin(ct).crossJoin(nn)
      .join(o, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("o"), lit(0L)).as("o"),
        col("rt"), col("ct"), col("n"))
      .withColumn("tm",
        expr("cast(round(((o - rt * ct * 1.0 / n) * " +
          "(o - rt * ct * 1.0 / n)) / (rt * ct * 1.0 / n) " +
          "* 1000000) as bigint)"))
      .agg(sum(col("tm")).cast("long").as("chi2_micro"),
        ((countDistinct(col("a")) - 1) *
          (countDistinct(col("b")) - 1)).as("dof"),
        max(col("n")).cast("long").as("n"))
  }

  /** Exact trimmed mean per group: the mean of the middle
    * (100 − 2·trimPct)% by rank — the robust location estimate
    * dashboards quote when outliers poison the plain mean, exact
    * rather than the approximate-percentile clip.
    *
    * Ranks never materialize per row: one hash agg shrinks each group
    * to its DISTINCT-value blocks (bounded by the value space —
    * quantized cents/micros — not the row count), a prefix sum places
    * each block on the rank axis, and each block keeps the overlap of
    * its [cum, cum+cnt) rank span with the kept window [klo, khi) —
    * pure integer interval clipping, so the result is exact for any
    * tie structure and floor-divides once to micros at the boundary.
    *
    * @param valueCol integer-quantized values (quantize upstream)
    * @return (group, n_kept, tmean_micro); empty kept window → no row
    */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  trimPct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trimPct >= 0 && trimPct < 50, s"trimPct in [0,50): $trimPct")
    val blocks = df.groupBy(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    blocks
      .withColumn("cum", coalesce(sum(col("cnt")).over(wOrd), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("klo", expr(s"(n * ${trimPct}L) div 100"))
      .withColumn("khi", col("n") - col("klo"))
      .withColumn("kept", greatest(lit(0L),
        least(col("cum") + col("cnt"), col("khi")) -
          greatest(col("cum"), col("klo"))))
      .groupBy("g")
      .agg(sum(col("kept") * col("v")).as("s"),
        max(col("khi") - col("klo")).as("m"))
      .filter(col("m") > 0)
      .select(col("g"), col("m").as("n_kept"),
        expr("(s * 1000000L) div m").as("tmean_micro"))
  }

  /** 2-D Pareto skyline (minimize both dimensions): rows not dominated
    * by any other row — q dominates p iff q ≤ p in both dims and q < p
    * in at least one. The multi-objective shortlist product search and
    * supplier ranking run ("no part is both smaller AND cheaper").
    * Duplicate points co-survive (neither strictly beats the other),
    * matching the textbook definition and the NOT EXISTS oracle.
    *
    * Plan shape — no all-pairs anything: (1) one hash aggregation
    * shrinks the input to min(y) per distinct x — bounded by x's VALUE
    * SPACE, not the row count; (2) the strict-prefix running min over
    * that tiny frame localizes to one task; (3) the per-x thresholds
    * broadcast back onto the scan, which keeps a row iff y equals its
    * x's min and beats every smaller x's min. Survives any corpus size
    * whose discrete dimension has bounded cardinality (sizes, grades,
    * tiers); a continuous x needs quantization upstream.
    */
  def skyline2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minY = df.groupBy(col(xCol)).agg(min(col(yCol)).as("__my"))
    // running min over strictly-smaller x: tiny frame (≤ |x values|),
    // the single-task window is the reduction, not a bottleneck
    val wPrev = Window.partitionBy(windows.boundedGlobal(col(xCol))).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fronts = minY
      .withColumn("__pm", min(col("__my")).over(wPrev))
      // a per-x min survives iff no smaller x already achieved ≤ it
      .filter(col("__pm").isNull || col("__my") < col("__pm"))
      .select(col(xCol), col("__my"))
    df.join(broadcast(fronts), Seq(xCol))
      .filter(col(yCol) === col("__my"))
      .drop("__my")
  }

  /** Out-of-fold target encoding — the leakage-safe categorical
    * feature every tabular-ML pipeline builds: rows in fold k receive
    * their category's label mean computed WITHOUT fold k (so a row
    * never sees its own label). The fold is a keyed md5 draw
    * (deterministic, engine-reproducible); the encoding table is one
    * (category × fold) aggregate plus a category rollup — two
    * map-side-combinable shuffles, output bounded by |categories|·folds.
    *
    * Integer micro-units via truncating DIV; label sums must stay
    * below 2^63/10^6 per category — rescale the label unit upstream
    * if a category's label mass approaches 9·10^12. Single-fold
    * categories (nothing out-of-fold) encode as NULL rather than a
    * fabricated prior. */
  def targetEncoding(df: DataFrame, catCol: String, idCol: String,
                     label: Column, nFolds: Int): DataFrame = {
    require(nFolds >= 2, s"need >= 2 folds, got $nFolds")
    val fold = conv(substring(md5(concat_ws("|", lit("te"),
      col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % nFolds
    val perFold = df
      .select(col(catCol), fold.as("fold"), label.as("__y"))
      .groupBy(col(catCol), col("fold"))
      .agg(sum(col("__y")).cast("long").as("__s"),
        count(lit(1)).as("__c"))
      .stage() // the category rollup reads it too
    val perCat = perFold.groupBy(col(catCol))
      .agg(sum(col("__s")).as("__st"), sum(col("__c")).as("__ct"))
    perFold.join(broadcast(perCat), Seq(catCol))
      .select(col(catCol), col("fold"), col("__c").as("n_fold"),
        when(col("__ct") > col("__c"), expr(
          "CAST((__st - __s) * 1000000 DIV (__ct - __c) AS BIGINT)"))
          .as("enc_micro"))
  }

  /** Two-sample Kolmogorov–Smirnov drift, EXACT in integers: the KS
    * statistic D = max_x |F₁(x) − F₂(x)| always attains its max at a
    * jump point, so it is max over distinct values of
    * |cum₁·n₂ − cum₂·n₁| / (n₁·n₂) — and the numerator is pure integer
    * cross-multiplication (decimal(38,0), exact past 10¹⁸ rows a side),
    * never a float CDF subtraction whose summation order could diverge
    * between engines. The classic "did this week's distribution move"
    * gate with none of PSI's binning/log choices.
    *
    * Shape: one per-value groupBy (value-space-bounded frame), both
    * cumulative counts from ONE range exchange
    * ([[windows.distributedPrefixSums]]), one scalar max. No data-sized
    * window, no driver state.
    *
    * @param sideA membership predicate for sample 1 (sample 2 = rest)
    * @return one row (n1, n2, d_micro): D in micro-units
    *         (DIV — 0..1,000,000); null if either side is empty */
  def ksDrift(df: DataFrame, sideA: Column, valueCol: String)
  : DataFrame = {
    val perValue = df
      .select(col(valueCol).cast("long").as("v"),
        when(sideA, 1L).otherwise(0L).as("__a"))
      .groupBy("v")
      .agg(sum(col("__a")).as("c1"),
        sum(lit(1L) - col("__a")).as("c2"))
    val cums = windows.distributedPrefixSums(perValue, Seq(col("v")),
      Seq(col("c1"), col("c2")), Seq("cum1", "cum2"), rankName = "__r")
    val tot = broadcast(perValue.agg(
      coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c2")), lit(0L)).as("n2")))
    cums.crossJoin(tot)
      .groupBy("n1", "n2")
      .agg(max(abs(col("cum1").cast("decimal(38,0)") * col("n2") -
        col("cum2").cast("decimal(38,0)") * col("n1"))).as("__dmax"))
      .select(col("n1"), col("n2"),
        expr("CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE " +
          "CAST((__dmax * 1000000) DIV " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT) END")
          .as("d_micro"))
  }

  /** Exact 1-D earth mover's distance (Wasserstein-1) between two
    * samples — the INTEGRAL drift companion to [[ksDrift]]'s max:
    * W₁ = ∫|F₁−F₂| dx = Σ over consecutive distinct values of
    * |cum₁·n₂ − cum₂·n₁| · gap / (n₁·n₂), again pure integer
    * cross-multiplication (KS says "somewhere the CDFs split by d";
    * W₁ says "how much mass moved how far", in VALUE units — the one
    * that notices a whole-distribution shift KS caps at its max).
    *
    * The step gap comes from a rank self-join on the
    * [[graft.ops.windows.distributedPrefixSums]] rank (the
    * SuffixArray adjacency idiom), NOT a global lead() window — so
    * nothing is single-task at any distinct-value count. Sum terms are
    * decimal(38,0): |cumdiff| ≤ n₁·n₂ ≈ 10²⁴ at 10¹² rows a side,
    * times gaps summing to the value range, stays within 38 digits
    * for any realistic unit choice.
    *
    * @param sideA membership predicate for sample 1 (sample 2 = rest)
    * @return one row (n1, n2, w1_micro): W₁ in micro-VALUE-units
    *         (DIV); null if either side is empty */
  def emdDrift(df: DataFrame, sideA: Column, valueCol: String)
  : DataFrame = {
    val perValue = df
      .select(col(valueCol).cast("long").as("v"),
        when(sideA, 1L).otherwise(0L).as("__a"))
      .groupBy("v")
      .agg(sum(col("__a")).as("c1"),
        sum(lit(1L) - col("__a")).as("c2"))
    val cums = windows.distributedPrefixSums(perValue, Seq(col("v")),
        Seq(col("c1"), col("c2")), Seq("cum1", "cum2"),
        rankName = "__rk")
      .stage() // both sides of the step-gap adjacency join read it
    val nxt = cums.select((col("__rk") - 1).as("__rk"),
      col("v").as("__vn"))
    val tot = broadcast(perValue.agg(
      coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c2")), lit(0L)).as("n2")))
    // last value has no step, a single distinct value has no terms at
    // all — the global agg still emits its one row (null sum → 0)
    val w = cums.join(nxt, Seq("__rk")).crossJoin(tot)
      .agg(coalesce(sum(abs(
          col("cum1").cast("decimal(38,0)") * col("n2") -
          col("cum2").cast("decimal(38,0)") * col("n1")) *
        (col("__vn") - col("v"))), lit(0).cast("decimal(38,0)"))
        .as("__w"))
    tot.crossJoin(broadcast(w))
      .select(col("n1"), col("n2"),
        expr("CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE " +
          "CAST((__w * 1000000) DIV " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT) END")
          .as("w1_micro"))
  }

  /** Randomized response (Warner 1965) — the ESTIMATOR of the classic
    * local-DP mechanism for collecting a sensitive bit: each row reports
    * its true bit with probability 1−f and a fair coin with probability
    * f; the aggregate debiases exactly (E[observed] = (1−f)·T + f·n/2,
    * so T̂ = (observed − f·n/2)/(1−f)).
    *
    * NOT a usable privacy mechanism — a deterministic DEMONSTRATION of
    * the estimator: the "coin flips" are keyed md5 draws of the PUBLIC
    * row id (so anyone holding the ids can replay every draw and invert
    * every reported bit), and the output emits `true_c` (the exact
    * sensitive count) beside the estimate for the accuracy story. Real
    * local DP needs client-side secret randomness; what this operator
    * demonstrates — and what the oracle verifies — is the debiasing
    * arithmetic and the mechanism's shape, engine-reproducibly.
    * Everything is scan-local + one groupBy; the estimate is integer
    * milli-units via DIV (no float division to diverge), computed in
    * decimal(38,0) so the intermediate `observed·2·10⁶·10³` cannot
    * overflow int64 even at trillion-row groups.
    *
    * @param fMicro flip probability in micros (even, so f·n/2 is
    *               integer-exact); e.g. 250000 = f 0.25
    * @return per group: n, observed, est_milli (debiased count ×1000),
    *         true_c alongside for the accuracy story */
  def randomizedResponse(df: DataFrame, groupCol: String, idCol: String,
                         bit: Column, fMicro: Long): DataFrame = {
    require(fMicro > 0 && fMicro < 1000000 && fMicro % 2 == 0,
      s"fMicro must be an even micro-probability, got $fMicro")
    def draw(salt: String): Column =
      conv(substring(md5(concat_ws("|", lit(salt),
        col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000000L
    val reported = when(draw("rr_flip") < fMicro,
      (draw("rr_coin") < 500000L).cast("long"))
      .otherwise(bit.cast("long"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(reported).as("observed"),
        sum(bit.cast("long")).as("true_c"))
      .select(col(groupCol), col("n"), col("observed"),
        // decimal(38,0) intermediates: observed·2e6·1e3 passes 2^63 at
        // ~4.6e9 rows/group; decimal holds it exactly to ~10^29 rows
        expr(s"CAST((CAST(observed AS DECIMAL(38,0)) * 2000000 - " +
          s"CAST($fMicro AS DECIMAL(38,0)) * n) * 1000 DIV " +
          s"(2 * (1000000 - $fMicro)) AS BIGINT)").as("est_milli"),
        col("true_c"))
  }
}
