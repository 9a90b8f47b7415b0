package graft.ops

import graft.Staging._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the classic co-occurrence
  * analytics layer (Agrawal & Srikant '94 shapes) over (basket, item)
  * rows, powering the same basket machinery as the co-occurrence graph
  * queries but surfacing RULES (confidence / lift) instead of edges.
  *
  * Scale shape: one shuffle to fold baskets into sorted item sets, a
  * scan-local pair expansion bounded by basket size (the upper-triangle
  * slice idiom — never |basket|² structs for the symmetric closure), a
  * map-side-combined pair count, and bounded joins against the |items|
  * support table. Nothing touches the driver; the N-baskets scalar
  * rides a one-row broadcast. */
object baskets {

  /** Distinct (basket, item) incidence — the normalized input every
    * stage shares. Items keep their SOURCE type (any orderable type
    * works for the sorted-set pairing): a hard numeric cast here would
    * crash string SKUs under the session's default ANSI mode — or,
    * with ANSI off, silently null every item. */
  private def incidence(b: DataFrame, basketCol: String, itemCol: String)
  : DataFrame =
    b.select(col(basketCol).as("k"), col(itemCol).as("i"))
      .distinct()

  /** Unordered co-occurring pair supports: (a, b, pair_support) with
    * a < b, counting BASKETS containing both. The expansion works on
    * the per-basket sorted item set and emits only the upper triangle,
    * so a basket of m items costs m(m−1)/2 rows — the inherent output
    * of pair mining — with the groupBy combined map-side. */
  def pairSupports(b: DataFrame, basketCol: String, itemCol: String)
  : DataFrame =
    pairSupportsFromIncidence(incidence(b, basketCol, itemCol))

  private def pairSupportsFromIncidence(inc: DataFrame): DataFrame =
    inc
      .groupBy(col("k"))
      .agg(sort_array(collect_set(col("i"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
           transform(slice(ps, i + 2, size(ps)),
             y -> struct(x AS a, y AS b))))""")).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("pair_support"))

  /** Association rules for every DIRECTED pair whose unordered support
    * clears `minSupport`: (ante, cons, pair_support, conf_micro,
    * lift_micro) with conf = sup(ab)/sup(ante) and
    * lift = sup(ab)·N / (sup(ante)·sup(cons)), both snapped to integer
    * micros straight from the counts (one rounding, not compounded) so
    * the result is order-independent and oracle-exact — the
    * [[graft.graph.Graph.adamicAdar]] micros rule.
    *
    * Skew guards, in order:
    *  - LOSSLESS Apriori prefilter: only items with item support ≥
    *    `minSupport` enter the pair expansion (a pair's support is
    *    bounded by either item's support, so dropped items can never
    *    reach the cut) — a null-like sentinel SKU that appears once
    *    per basket dies here, before it can inflate any basket.
    *  - `maxBasketItems` (opt-in): baskets still holding more than
    *    this many FREQUENT items after the prefilter are DROPPED
    *    whole. This one changes semantics — pairs lose those baskets'
    *    contribution — and is the standard practice for corpus-scale
    *    mining where one boilerplate mega-basket (a crawler session, a
    *    catalog-wide order) would otherwise buffer the whole basket in
    *    one aggregation row and land its m²/2 expansion on one task.
    *    Default 0 = off; the oracle models the exact (cap-off) form.
    *
    * The support cut happens BEFORE the direction fan-out and the
    * support joins, so downstream work is bounded by surviving rules,
    * not raw pairs; the item-support joins are plain equi-joins AQE
    * sizes itself (broadcast when the item dimension is small). */
  def associationRules(b: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long,
                       maxBasketItems: Int = 0): DataFrame = {
    // staged: the incidence distinct is the raw-volume shuffle, and
    // THREE consumers read it (item supports, basket count, pair
    // expansion) — without the pin each would re-run it
    val inc = incidence(b, basketCol, itemCol).stage()
    val itemSup = inc.groupBy(col("i")).agg(count(lit(1)).as("sup"))
    val nBaskets = inc.select(col("k")).distinct()
      .agg(count(lit(1)).as("n"))
    val freqInc = inc.join(
      itemSup.filter(col("sup") >= minSupport).select(col("i")), "i")
    val capped =
      if (maxBasketItems <= 0) freqInc
      else freqInc.withColumn("__bn",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("k"))))
        .filter(col("__bn") <= maxBasketItems).drop("__bn")
    val pairs = pairSupportsFromIncidence(capped)
      .filter(col("pair_support") >= minSupport)
    pairs
      .select(explode(array(
        struct(col("a").as("ante"), col("b").as("cons"),
          col("pair_support")),
        struct(col("b").as("ante"), col("a").as("cons"),
          col("pair_support")))).as("r"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
        col("r.pair_support").as("pair_support"))
      .join(itemSup.select(col("i").as("ante"), col("sup").as("sup_a")),
        "ante")
      .join(itemSup.select(col("i").as("cons"), col("sup").as("sup_c")),
        "cons")
      .crossJoin(broadcast(nBaskets))
      .select(col("ante"), col("cons"), col("pair_support"),
        expr("cast(round(1000000.0 * pair_support / sup_a) as bigint)")
          .as("conf_micro"),
        // sup_a * sup_c evaluated in DOUBLE: the bigint product
        // overflows past ~3e9 baskets, and counts this size are exact
        // in double anyway (< 2^53)
        expr("""cast(round(1000000.0 * pair_support * n
                           / (cast(sup_a as double) * sup_c)) as bigint)""")
          .as("lift_micro"))
  }

  /** Sequential 2-patterns: for each ordered type pair (a → b), the
    * number of sequences (users) where SOME a-event strictly precedes
    * SOME b-event — the order-aware counterpart of [[pairSupports]]
    * (co-occurrence ignores time; "signup before purchase" and
    * "purchase before signup" are different patterns). The GSP/
    * PrefixSpan length-2 support, which is the level every practical
    * sequence-mining pass prunes on first.
    *
    * ∃ aᵢ ≺ bⱼ ⇔ first(a) ≺ last(b), so each (key, type) needs only
    * its first and last occurrence under the (ts, tie) order: one hash
    * agg shrinks the corpus to ≤ |keys|·|types| rows, and the per-key
    * pair join is bounded by the TYPE space squared per key — never
    * events². Support ratios are integer micros over the sequence
    * count.
    *
    * @return (from_type, to_type, n_seq, support_micro)
    */
  def sequentialPairs(events: DataFrame, keyCol: String, typeCol: String,
                      tsCol: String, tieCol: String): DataFrame = {
    val ext = events.groupBy(col(keyCol).as("k"), col(typeCol).as("typ"))
      .agg(min(struct(col(tsCol).as("ts"), col(tieCol).as("tie")))
          .as("first"),
        max(struct(col(tsCol).as("ts"), col(tieCol).as("tie")))
          .as("last"))
      .stage()
    val tot = ext.agg(countDistinct(col("k")).as("n_tot"))
    val a = ext.select(col("k"), col("typ").as("from_type"),
      col("first"))
    val b = ext.select(col("k"), col("typ").as("to_type"), col("last"))
    a.join(b, Seq("k"))
      .filter(col("from_type") =!= col("to_type") &&
        (col("first.ts") < col("last.ts") ||
          (col("first.ts") === col("last.ts") &&
            col("first.tie") < col("last.tie"))))
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_seq"))
      .crossJoin(broadcast(tot)) // one-row totals frame
      .select(col("from_type"), col("to_type"), col("n_seq"),
        expr("(n_seq * 1000000L) div n_tot").as("support_micro"))
  }
}
