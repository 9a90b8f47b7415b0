package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling: densify a per-key daily series so downstream
  * window math (moving averages, forward fills) sees every day.
  *
  * Fully distributed: each key's calendar is generated FROM ITS OWN
  * span with `sequence()` + `explode` — no driver-side date collection,
  * no global calendar cross join. Fan-out per key is bounded by its
  * active span in days, and the fill join is a left join on
  * (key, day), the same shuffle key the aggregate already produced.
  */
object timeseries {

  /** Densify `daily` (one row per (key, day) with observed values) to
    * one row per (key, every day in the key's [min, max] span), filling
    * absent days with each column's default.
    *
    * @param fills (column, default) — output columns beyond key/day
    */
  def fillDailyGaps(daily: DataFrame, keyCol: String, dayCol: String,
                    fills: Seq[(String, Column)]): DataFrame = {
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val cal = spans.select(col(keyCol),
      explode(expr("sequence(__lo, __hi)")).as(dayCol))
    val out = col(keyCol) +: col(dayCol) +: fills.map {
      case (name, default) => coalesce(col(name), default).as(name)
    }
    cal.join(daily, Seq(keyCol, dayCol), "left").select(out: _*)
  }

  /** Linear interpolation of nulls in a (key, day, value) series: each
    * null day gets the straight line between its nearest observed
    * neighbors; leading/trailing nulls back-/forward-fill the nearest
    * single neighbor.
    *
    * Two running-frame window passes (backward and forward) over ONE
    * (key, day) sort — the forward pass reuses the backward pass's
    * shuffle partitioning, so the whole op is one exchange per key
    * regardless of gap length. No per-gap joins, no driver state.
    */
  def interpolateLinear(series: DataFrame, keyCol: String, dayCol: String,
                        valueCol: String): DataFrame = {
    val v = col(valueCol)
    val base = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(v.isNotNull, col(dayCol))
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevD = last(obsDay, ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextD = first(obsDay, ignoreNulls = true).over(fwd)
    val interp = prevV + (nextV - prevV) *
      datediff(col(dayCol), prevD) / datediff(nextD, prevD)
    series.withColumn(valueCol,
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV)
        .when(nextV.isNull, prevV)
        // duplicate-day inputs can put a null row BETWEEN two observed
        // rows of the same day: prevD = nextD makes the slope 0/0 —
        // take the day's observed value instead of an ANSI
        // DIVIDE_BY_ZERO abort
        .when(datediff(nextD, prevD) === 0, prevV)
        .otherwise(interp))
  }

  /** Exponentially time-decayed per-key aggregate: each event's value
    * weighted by 2^(−age/halflife) relative to the stream's latest
    * timestamp — the standard recency-weighted engagement/volume score
    * (a month-old event at halflife=1d is noise; yesterday's counts
    * half). One groupBy after a one-row broadcast of the global max
    * timestamp.
    *
    * Determinism across engines/partitionings: the decay factor is
    * snapped to integer MICROS at the `pow` boundary (the ln-micros
    * rule), the value to integer cents, so the weighted sum is a sum of
    * exact integer products carried in decimal(38,0) — associative, no
    * float tail — with ONE double division + 4dp round at the end.
    *
    * @param halflifeSec decay half-life in seconds
    * @return (keyCol, n_events, decayed_value) — 4dp
    */
  def decayedSum(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, halflifeSec: Long): DataFrame = {
    require(halflifeSec > 0, s"halflife must be > 0: $halflifeSec")
    val tmax = events.agg(max(col(tsCol)).as("tmax"))
    // age in integer MICROseconds: unix_timestamp would FLOOR to
    // seconds while other engines round, so sub-second timestamps
    // diverge — micros are exact on both sides
    val age = unix_micros(col("tmax")) - unix_micros(col(tsCol))
    val decayMicro = round(
      pow(lit(2.0), -(age.cast("double") / 1e6) / halflifeSec.toDouble)
        * 1e6).cast("long")
    val valueCents = round(col(valueCol) * 100).cast("long")
    events.crossJoin(broadcast(tmax))
      .select(col(keyCol),
        // decimal product, not long: valueCents×decayMicro wraps long
        // for values ≳ 9e12 cents; decimal(38,0) is exact for any pair
        (valueCents.cast("decimal(38,0)") *
          decayMicro.cast("decimal(38,0)")).as("wv"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        analytics.roundDouble(sum(col("wv")).cast("double") / 1e8, 4)
          .as("decayed_value"))
  }

  /** Time-weighted average of an interval-valued series, per key: each
    * interval's value counts proportionally to how long it was in
    * force — the correct mean for prices/rates/levels held over
    * varying spans, where a row-weighted AVG over-counts short blips
    * (the standard TWAP formulation).
    *
    * Entirely scan-local + one hash aggregate: duration in exact epoch
    * seconds (timestamp-cast longs, session pinned UTC), value snapped
    * to integer cents, the value·duration products summed in
    * decimal(38,0) (a year-long interval × a large price overflows
    * long), one integral division at the end — associative, shuffle =
    * |keys| rows, oracle-exact at any partitioning.
    *
    * Empty/inverted intervals (end <= start) carry no time mass and are
    * dropped, matching [[graft.ops.rangejoin]]'s guard.
    *
    * @return (keyCol, n_intervals, total_seconds, twa_cents) —
    *         twa_cents = Σ(cents·dur) div Σ(dur), floor
    */
  def timeWeightedAvg(intervals: DataFrame, keyCol: String,
                      startCol: String, endCol: String,
                      valueCol: String): DataFrame = {
    val dur = (col(endCol).cast("timestamp").cast("long") -
      col(startCol).cast("timestamp").cast("long"))
    val cents = round(col(valueCol) * 100).cast("long")
    intervals
      .filter(dur > 0)
      .select(col(keyCol), dur.as("__dur"), cents.as("__cents"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dur")).as("total_seconds"),
        expr("""cast(sum(cast(__cents as decimal(38,0)) *
                        cast(__dur as decimal(38,0)))
                  div sum(cast(__dur as decimal(38,0))) as long)""")
          .as("twa_cents"))
  }

  /** OHLC bar resampling: collapse a tick/event stream into fixed
    * `barSeconds` candles per key — open/high/low/close plus tick count
    * and decimal-exact volume, the standard time-series downsample
    * before charting or sequence modeling.
    *
    * ONE hash aggregate: the bar id is scan-local epoch floor-division,
    * open/close are `min_by`/`max_by` over the (ts, tie) event order —
    * no per-key sort window, no per-bar buffering, so a hot key
    * spreads across bars and AQE can split a hot bar. Tie-break:
    * simultaneous ticks order by `tieCol` (use the event/sequence id;
    * ts alone would make open/close nondeterministic).
    *
    * Volume sums route through decimal(18,2) — double summation order
    * diverges across partitionings/engines, decimals are associative.
    *
    * @return (key, bar_start: timestamp, open, high, low, close,
    *         n_ticks, volume: decimal)
    */
  def ohlcBars(ticks: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, tieCol: String,
               barSeconds: Long): DataFrame = {
    require(barSeconds >= 1, s"barSeconds must be >= 1: $barSeconds")
    val ord = struct(col(tsCol), col(tieCol))
    ticks
      .withColumn("bar_start",
        timestamp_seconds(
          floor(unix_timestamp(col(tsCol)) / barSeconds) * barSeconds))
      .groupBy(col(keyCol), col("bar_start"))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n_ticks"),
        sum(col(valueCol).cast("decimal(18,2)")).as("volume"))
  }

  /** First-order Markov transition matrix over per-key event
    * sequences: counts and probabilities of `type_a → type_b`
    * consecutive steps — the session-flow / next-event model product
    * analytics and sequence-corpus profiling consume ("after `error`,
    * 34% of users retry").
    *
    * Per-key ordering is a hash-partitioned window (key is the
    * partition key — scale-safe for human-scale sequences; a single
    * synthetic mega-key would need session splitting upstream), then
    * everything is two map-side-combined hash aggregates. Transition
    * probability is integer micros by floor division — exact on both
    *  engines.
    *
    * @param tieCol deterministic order for simultaneous events
    * @return (from_type, to_type, c, p_micro) — P(to | from) in micros
    */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val steps = events
      .withColumn("__nxt", lead(col(typeCol), 1).over(w))
      .filter(col("__nxt").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__nxt").as("to_type"))
      .agg(count(lit(1)).as("c"))
    val totals = steps.groupBy("from_type").agg(sum(col("c")).as("tot"))
    steps.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("c"),
        expr("(c * 1000000L) div tot").as("p_micro"))
  }

  /** CUSUM changepoint localization per key: the classic cumulative-sum
    * drift statistic Cₖ = Σᵢ≤ₖ (vᵢ − μ) over each key's time-ordered
    * values, flagging the points where |Cₖ| peaks — where the series'
    * running mean shifted (metric drift, sensor steps, behavior
    * changes). A key whose values hover around its mean keeps C near 0;
    * a level shift makes |C| ramp to its maximum AT the change.
    *
    * Exactness: μ = S/n is a ratio, so everything is scaled by n to
    * stay in integers — n·Cₖ = n·prefixₖ − k·S over cent-quantized
    * values. The flag compares 10·|n·Cₖ| ≥ hotFrac10·max|n·Cₖ| (integer
    * cross-multiplication, no division anywhere), and the reported
    * `cusum_micro` floor-divides once at the output boundary — both
    * engines floor identically.
    *
    * Plan shape: ONE shuffle on the key; the per-key n, S, prefix sums,
    * and running max all ride the same hash-partitioned window. Keys
    * are high-cardinality (users, not the handful of event types), so
    * partitions stay human-scale at any corpus size.
    *
    * @param hotFrac10 flag threshold in tenths of the peak (8 = ≥80%)
    * @return flagged rows: (key, tie, k, value_c, cusum_micro)
    */
  def cusumChangepoints(events: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, valueCol: String,
                        hotFrac10: Int): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // internals carry a __ prefix so no caller key/tie name collides
    val cents = events.select(col(keyCol), col(tsCol), col(tieCol),
      (col(valueCol).cast("decimal(18,2)") * lit(100))
        .cast("long").as("__vc"))
    cents
      .withColumn("__k", row_number().over(wOrd))
      .withColumn("__prefix", sum(col("__vc")).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__vc")).over(wAll))
      // n·Cₖ in cents — exact integers throughout
      .withColumn("__nc",
        col("__n") * col("__prefix") - col("__k") * col("__s"))
      .withColumn("__peak", max(abs(col("__nc"))).over(wAll))
      .filter(col("__peak") > 0 &&
        abs(col("__nc")) * 10 >= col("__peak") * hotFrac10)
      .select(col(keyCol), col(tieCol), col("__k").cast("long").as("k"),
        col("__vc").as("v_c"),
        expr("(__nc * 10000L) div __n").as("cusum_micro"))
  }

  /** Seasonal profile with peak-residual localization: for each
    * (series, hour-of-day) cell, the cell's size, exact mean, and the
    * single observation that deviates most from the cell baseline — the
    * additive-seasonality decomposition consumed by anomaly triage
    * ("checkout latency at 3am is 2× its seasonal norm, worst at event
    * 17 231"). Output is one row per cell, bounded by |series|·24
    * regardless of corpus size.
    *
    * Exactness: the baseline mean is S/n; residuals are compared scaled
    * by n (rᵢ·n = vᵢ·n − S, integers in cents), and ties on |r·n| break
    * to the smallest tie id via one `min(struct(−|rn|, tie))` hash
    * aggregate — no window, no second shuffle: the whole operator is
    * two map-side-combined hash aggregations on the (series, hour)
    * cell key.
    *
    * @return (series, hour, n, mean_micro, peak_tie, peak_res_micro)
    */
  def seasonalProfile(events: DataFrame, seriesCol: String, tsCol: String,
                      tieCol: String, valueCol: String): DataFrame = {
    val cents = events.select(col(seriesCol).as("series"),
      hour(col(tsCol)).as("hr"), col(tieCol).as("tie"),
      (col(valueCol).cast("decimal(18,2)") * lit(100))
        .cast("long").as("v_c"))
    // residuals need the cell's own (n, s): aggregate the tiny cell
    // stats (≤ |series|·24 rows) and broadcast them back onto the raw
    // stream — never a per-cell collect
    val stats = cents.groupBy("series", "hr")
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("s"))
    cents.join(broadcast(stats), Seq("series", "hr"))
      .withColumn("rn", col("v_c") * col("n") - col("s"))
      .groupBy("series", "hr")
      .agg(max(col("n")).as("n"), max(col("s")).as("s_tot"),
        min(struct(-abs(col("rn")), col("tie"), col("rn"))).as("m"))
      .select(col("series"), col("hr"), col("n"),
        expr("(s_tot * 10000L) div n").as("mean_micro"),
        col("m.tie").as("peak_tie"),
        expr("(m.rn * 10000L) div n").as("peak_res_micro"))
  }
}
