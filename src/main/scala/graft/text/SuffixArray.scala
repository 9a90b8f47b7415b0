package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Staging.{stageObserved, StageOps}
import graft.ops.windows

/** Distributed token-level suffix array over a document corpus, by prefix
  * doubling (Manber–Myers), plus the adjacent-LCP index on top of it —
  * the data structure behind EXACT substring-level dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better": their
  * suffix-array pass finds every verbatim span shared across documents,
  * which shingle methods like [[Text.dupSpans]] only approximate at one
  * fixed width).
  *
  * Scale shape (the whole point): a corpus of n token positions is ranked
  * in ceil(log2 maxDocLen) rounds; each round is ONE key-partitioned
  * self-join on (doc, pos) plus ONE dense re-rank of the (rank, rank')
  * pairs via [[windows.distributedPrefixSum]] — every stage shuffles on a
  * data-sized key, nothing funnels through a single task, and each round's
  * state is staged (reliable-checkpoint-aware) so lineage stays flat. At
  * 100 TB that is ~20 rounds of linear shuffles; the only driver-side
  * values are two scalars per round (observed metrics riding the
  * checkpoint job, no extra pass).
  *
  * Suffixes do not cross document boundaries (the corpus is a document
  * SET, not one string); a missing continuation ranks below every real
  * rank (rank 0), so a suffix that is a proper prefix of another sorts
  * first — exactly lexicographic order on the token lists.
  */
object SuffixArray {

  /** One row per token position: (doc_id, pos 1-based, tok) — 1-based so
    * the DuckDB twin's `toks[pos:]` slice lines up with no off-by-one. */
  private def positions(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))

  /** Final prefix-doubling equivalence ranks: (doc_id, pos, r) where
    * r is equal iff the full suffixes are equal token sequences, and
    * r's order IS lexicographic suffix order. Rounds run until either
    * every rank is unique or the doubled span covers the longest
    * document, whichever comes first (convergence is observed on the
    * round's own checkpoint job — no extra scan per round). */
  def ranks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = positions(docs, idCol, textCol).stage()
    // round 0: dense rank of the single token — a vocab-sized sort,
    // distributed (the vocabulary is the ONLY frame this touches)
    val vocab = windows.distributedPrefixSum(
        toked.select(col("tok")).distinct(), Seq(col("tok")), lit(0L),
        cumName = "__c", rankName = "r")
      .select(col("tok"), col("r"))
    val (first, m0) = stageObserved(
      toked.join(vocab, Seq("tok")).select(col("doc_id"), col("pos"),
        col("r").cast("long").as("r")),
      count(lit(1)).as("n"), max(col("r")).as("k"),
      max(col("pos")).as("maxlen"))
    var cur = first
    val n = m0("n").asInstanceOf[Long]
    val maxLen = m0("maxlen").asInstanceOf[Long]
    var distinctRanks = m0("k").asInstanceOf[Long]
    var d = 1L
    while (d < maxLen && distinctRanks < n) {
      // rank of the suffix 2^k positions later, same doc (0 = none):
      // one equi-join on (doc_id, pos) — the shifted copy is the same
      // frame, so both sides hash-partition on the same key
      val shifted = cur.select(col("doc_id"), (col("pos") - d).as("pos"),
        col("r").as("r2"))
      val paired = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("r"),
          coalesce(col("r2"), lit(0L)).as("r2"))
      // dense re-rank of the (r, r2) key space — distinct pairs only,
      // ranked by the distributed prefix sum (no global window)
      val keys = windows.distributedPrefixSum(
          paired.select(col("r"), col("r2")).distinct(),
          Seq(col("r"), col("r2")), lit(0L),
          cumName = "__c", rankName = "nr")
        .select(col("r"), col("r2"), col("nr").cast("long").as("nr"))
      val (staged, m) = stageObserved(
        paired.join(keys, Seq("r", "r2"))
          .select(col("doc_id"), col("pos"), col("nr").as("r")),
        max(col("r")).as("k"))
      cur = staged
      distinctRanks = m("k").asInstanceOf[Long]
      d *= 2
    }
    cur
  }

  /** The suffix array itself: every (doc_id, pos) with its 1-based global
    * rank `sa_rank` in lexicographic token-suffix order, ties (equal
    * suffixes across documents) broken by (doc_id, pos). */
  def suffixArray(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame =
    windows.distributedPrefixSum(ranks(docs, idCol, textCol),
        Seq(col("r"), col("doc_id"), col("pos")), lit(0L),
        cumName = "__c", rankName = "sa_rank")
      .select(col("doc_id"), col("pos"),
        col("sa_rank").cast("long").as("sa_rank"))

  /** Common-prefix length of two already-`cap`-bounded token slices:
    * zip_with pads the shorter side with null (≠ anything), the sentinel
    * `false` bounds array_position — pure codegen HOFs, scan-local. */
  private def commonPrefixLen(a: Column, b: Column): Column =
    (array_position(
      concat(zip_with(a, b, (x, y) => coalesce(x === y, lit(false))),
        array(lit(false))),
      false) - 1).cast("long")

  /** Adjacent-LCP index: for every consecutive suffix pair in SA order,
    * the length of their longest common token prefix, capped at `cap`
    * (dedup only ever thresholds the LCP, so the cap is the threshold's
    * ceiling, not an approximation). One self-join on sa_rank; the token
    * slices ride a broadcast-or-shuffle join back to the docs frame.
    * Output: (sa_rank, doc_id, pos, nxt_doc_id, nxt_pos, lcp). */
  def lcpAdjacent(docs: DataFrame, idCol: String, textCol: String,
                  cap: Int): DataFrame = {
    require(cap >= 1, s"lcp cap must be >= 1, got $cap")
    val sa = suffixArray(docs, idCol, textCol)
    val toks = docs.select(col(idCol).as("doc_id"),
      Text.tokens(col(textCol)).as("t"))
    val sliced = sa.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("sa_rank"),
        slice(col("t"), col("pos"), lit(cap)).as("w"))
      .stage() // both sides of the adjacency join read it
    val nxt = sliced.select((col("sa_rank") - 1).as("sa_rank"),
      col("doc_id").as("nxt_doc_id"), col("pos").as("nxt_pos"),
      col("w").as("w2"))
    sliced.join(nxt, Seq("sa_rank"))
      .select(col("sa_rank"), col("doc_id"), col("pos"),
        col("nxt_doc_id"), col("nxt_pos"),
        commonPrefixLen(col("w"), col("w2")).as("lcp"))
  }

  /** Per-document exact-substring dup report: a position is DUPLICATED
    * iff the `minLen`-token span starting there also occurs somewhere
    * else in the corpus — which in SA terms is max(lcp with the previous
    * suffix, lcp with the next) >= minLen, the classic suffix-array dup
    * criterion (each repeated span's occurrences are adjacent in SA
    * order, so only neighbors need comparing — never all pairs).
    * Output: (doc_id, n_positions, n_dup_positions) for every doc. */
  def dupPositions(docs: DataFrame, idCol: String, textCol: String,
                   minLen: Int): DataFrame = {
    val lcp = lcpAdjacent(docs, idCol, textCol, cap = minLen)
      .filter(col("lcp") >= minLen)
      .stage() // read twice: once per adjacency direction
    val hits = lcp.select(col("doc_id"), col("pos"))
      .union(lcp.select(col("nxt_doc_id").as("doc_id"),
        col("nxt_pos").as("pos")))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_positions"))
    positions(docs, idCol, textCol)
      .groupBy("doc_id").agg(count(lit(1)).as("n_positions"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_positions"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"))
  }
}
