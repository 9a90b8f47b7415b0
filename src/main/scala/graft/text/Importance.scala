package graft.text

import graft.Staging._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection scoring via hashed n-gram importance resampling
  * (DSIR, Xie et al. '23): score each raw document by how much more
  * likely its hashed-unigram bag is under a target-domain distribution
  * than under the raw-pool distribution. The standard recipe for "give
  * me the web pages that look like Wikipedia" at corpus scale.
  *
  * Everything reduces to two tiny aggregates and one broadcast join:
  *   - bucket every token by md5 into B buckets (B ≈ 256-10k; the
  *     hashing trick caps the feature space no matter the vocabulary),
  *   - per-bucket counts under target and raw → B-row table of add-1
  *     smoothed log-likelihood ratios λ_b,
  *   - per-(doc, bucket) counts ⋈ broadcast λ → Σ n_b·λ_b per doc.
  *
  * λ is snapped to integer micros the moment it leaves `ln` (the
  * [[graft.text.Text]] unigram-logprob recipe), so the per-doc sum is
  * integer — associative, partition-order-free, and bit-identical in
  * the DuckDB oracle. At 100 TB the only wide ops are token-bucket
  * aggregations (map-side combined); the λ table is B rows, always
  * broadcastable.
  */
object Importance {

  /** md5 bucket of a token — [[Text.splitBucket]] over the token itself
    * (engine-stable, seedless). */
  private def tokBucket(tok: Column, buckets: Int): Column =
    Text.splitBucket(tok, buckets)

  /** Per-document DSIR score in integer micros.
    *
    * @param isTarget row predicate marking the target-domain exemplars
    *                 (e.g. `col("lang") === "en"`); the complement is
    *                 the raw pool
    * @param buckets  hashed feature-space size B
    * @return (idCol, n_tokens: long, score_micro: long) for EVERY input
    *         doc — callers keep the top slice (score_micro desc) as the
    *         selected corpus
    */
  def dsirScoreMicro(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, buckets: Int = 256): DataFrame = {
    // one tokenize pass feeds both the distribution fit and the scoring
    // tok =!= "" drops the one phantom token split("") yields for an
    // empty/whitespace doc — empty docs must contribute NO token mass
    // to the fitted distributions (null text already vanishes via
    // explode; both re-enter the output through the restore join below)
    val tf = docs
      .select(col(idCol), isTarget.as("is_target"),
        explode(Text.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol), col("is_target"),
        tokBucket(col("tok"), buckets).as("bucket"))
      .stage()

    // B-row side: add-1 smoothed log-ratio per bucket, snapped to micros
    val counts = tf.groupBy("bucket")
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("cr"))
    val totals = tf.agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).cast("double").as("t_total"),
      sum(when(col("is_target"), 0L).otherwise(1L)).cast("double").as("r_total"))
    val lambda = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round((log((col("ct").cast("double") + 1.0d) /
                 (col("t_total") + buckets.toDouble)) -
               log((col("cr").cast("double") + 1.0d) /
                 (col("r_total") + buckets.toDouble))) * 1e6)
          .cast("long").as("lam_micro"))

    // per-(doc, bucket) histogram ⋈ broadcast λ — integer dot product
    val scored = tf.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(lambda), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lam_micro")).as("score_micro"))
    // the contract says EVERY doc: null/empty-text docs have no token
    // rows and would vanish via the explode — restore them with zero
    // tokens and a zero (= neutral) importance score
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** Multiclass hashed-feature multinomial Naive Bayes: count-train on
    * the rows matching `trainPred`, batch-score EVERY row with integer-
    * micros log-posteriors, return the argmax class per doc — the
    * train-a-classifier-then-filter shape of model-based quality /
    * language filtering (fastText-style linear inference; NB because
    * count training is pure aggregation, no gradient loop).
    *
    * Distributed shape: one tokenize pass staged once; the model is a
    * (B·C)-row table (hashed buckets × classes, add-1 smoothed
    * conditional log-probs + class-prior log-probs, all snapped to
    * integer micros at the `ln` boundary) — bounded by construction, so
    * it broadcast-joins onto the per-(doc,bucket) histogram no matter
    * the corpus size. Scoring is an integer dot product + argmax, and
    * the micro-snapped sums make the argmax deterministic cross-engine
    * (ties break on class name DESCENDING — the max(struct) order).
    *
    * @param labelCol  class label column (e.g. lang)
    * @param trainPred rows used to fit counts (e.g. an md5-bucket split
    *                  from [[Text.splitBucket]]); scoring covers all rows
    * @return (idCol, n_tokens, pred, score_micro) — score is the
    *         unnormalized log-posterior of the winning class. An EMPTY
    *         training slice yields an empty result (no model → nothing
    *         scored), not an error — callers gate on output count.
    */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, trainPred: Column,
                 buckets: Int = 256): DataFrame = {
    // tok =!= "": same phantom-empty-token rule as dsirScoreMicro
    val tf = docs
      .select(col(idCol), col(labelCol).as("cls"),
        trainPred.as("is_train"),
        explode(Text.tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol), col("cls"), col("is_train"),
        tokBucket(col("tok"), buckets).as("bucket"))
      .stage()

    // class totals over the training slice: token mass + doc-count prior
    val classes = tf.filter(col("is_train"))
      .groupBy("cls")
      .agg(count(lit(1)).as("cn"),
        countDistinct(col(idCol)).as("cdocs"))
    val totalDocs = classes.agg(sum(col("cdocs")).cast("double").as("td"))
    // dense (bucket × class) grid so every class scores every token:
    // absent counts take the smoothing floor ln(1/(cn+B)), not a dropped
    // term — the grid is B·C rows, small by construction. Buckets come
    // from range(B), not a distinct over the token stream: the values
    // are identical (a bucket no document carries never joins a
    // histogram row), and range skips a full-volume scan+shuffle that
    // existed only to enumerate ≤ B values
    val bcCounts = tf.filter(col("is_train"))
      .groupBy("bucket", "cls").agg(count(lit(1)).as("n"))
    val grid = docs.sparkSession.range(buckets.toLong)
      .select(col("id").cast("int").as("bucket"))
      .crossJoin(broadcast(classes.select(col("cls"), col("cn"))))
      .join(bcCounts, Seq("bucket", "cls"), "left")
      .select(col("bucket"), col("cls"),
        round(log((coalesce(col("n"), lit(0L)).cast("double") + 1.0d) /
          (col("cn").cast("double") + buckets.toDouble)) * 1e6)
          .cast("long").as("w_micro"))
    val prior = classes.crossJoin(broadcast(totalDocs))
      .select(col("cls"),
        round(log(col("cdocs").cast("double") / col("td")) * 1e6)
          .cast("long").as("prior_micro"))

    // per-(doc,bucket) histogram ⋈ broadcast grid → C scores per doc →
    // argmax as one max(struct) partial agg: integer scores compare
    // exactly and ties fall to class name DESC — deterministic and
    // mirrorable in SQL (row_number over score desc, cls desc)
    val scored = tf.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(grid), Seq("bucket"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * col("w_micro")).as("ll_micro"))
      .join(broadcast(prior), Seq("cls"))
      .select(col(idCol), col("cls"), col("n_tokens"),
        (col("ll_micro") + col("prior_micro")).as("score_micro"))
    val argmax = scored.groupBy(col(idCol))
      .agg(max(struct(col("score_micro"), col("cls"),
        col("n_tokens"))).as("best"))
      .select(col(idCol), col("best.n_tokens").as("n_tokens"),
        col("best.cls").as("pred"),
        col("best.score_micro").as("score_micro"))
    // batch-score EVERY row: a tokenless doc (null/empty text) has no
    // histogram rows, so its posterior is the class prior alone —
    // restore it with the prior argmax (same max(struct) tie rule)
    val priorBest = prior
      .agg(max(struct(col("prior_micro"), col("cls"))).as("pb"))
      .select(col("pb.cls").as("__p_pred"),
        col("pb.prior_micro").as("__p_score"))
    docs.select(col(idCol)).join(argmax, Seq(idCol), "left")
      .crossJoin(broadcast(priorBest))
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("pred"), col("__p_pred")).as("pred"),
        coalesce(col("score_micro"), col("__p_score")).as("score_micro"))
      // an EMPTY training slice means no model: prior argmax is null
      // too, and the documented contract is an empty result, not a
      // frame of null predictions
      .filter(col("pred").isNotNull)
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over hashed
    * unigram buckets — the "did one feed go bad / shift under us" check
    * a continuously-ingesting corpus runs per snapshot (high KL = the
    * source's token distribution no longer looks like the pool:
    * boilerplate floods, language flips, spam injection).
    *
    * Everything derives from ONE (source × bucket) count aggregation —
    * the only shuffle that sees token volume; the corpus marginal, the
    * per-source totals, and the dense (bucket × source) smoothing grid
    * are all re-aggregations of that ≤ B·S-row table. Add-1 smoothing
    * keeps every log finite; log-ratios snap to integer micros so the
    * per-source sum is exact, with ONE double division + 4dp round at
    * the very end (the roundDouble cross-engine mirror).
    *
    * KL_s = Σ_b P_s(b)·ln(P_s(b)/Q(b)),  P_s(b) = (c_sb+1)/(n_s+B),
    * Q(b) = (c_b+1)/(N+B), summed over the full B-bucket grid.
    *
    * @return (sourceCol, n_tokens, kl) — kl in nats, 4dp
    */
  def sourceDivergence(docs: DataFrame, sourceCol: String,
                       textCol: String, buckets: Int = 256): DataFrame = {
    val sb = docs
      .select(col(sourceCol).as("src"),
        explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy(col("src"), tokBucket(col("tok"), buckets).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .stage() // tiny (≤ B·S rows); feeds four re-aggregations
    val perSrc = sb.groupBy("src").agg(sum(col("c")).as("n_s"))
    val perBucket = sb.groupBy("bucket").agg(sum(col("c")).as("cb"))
    val total = sb.agg(sum(col("c")).as("n_total"))
    // dense grid over ALL B buckets (not just observed ones): a bucket
    // unseen corpus-wide still contributes its strictly positive
    // smoothing term (1/(n_s+B))·ln((N+B)/(n_s+B)) to every source, so
    // the sum really is the documented full-support KL — dropping the
    // unseen tail would systematically understate drift exactly for the
    // low-volume sources the monitor exists to flag
    val allBuckets = docs.sparkSession.range(buckets.toLong)
      .select(col("id").cast("int").as("bucket"))
    val grid = allBuckets
      .join(perBucket, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(perSrc))
      .join(sb, Seq("src", "bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("src"), col("n_s"),
        (coalesce(col("c"), lit(0L)) + 1L).as("cp"),
        round((log((coalesce(col("c"), lit(0L)).cast("double") + 1.0d) /
                 (col("n_s").cast("double") + buckets.toDouble)) -
               log((col("cb").cast("double") + 1.0d) /
                 (col("n_total").cast("double") + buckets.toDouble)))
          * 1e6).cast("long").as("lr_micro"))
    grid.groupBy(col("src").as(sourceCol))
      .agg(max(col("n_s")).as("n_tokens"),
        (round(sum(col("cp") * col("lr_micro")) /
          (max(col("n_s")) + lit(buckets.toLong)).cast("double") /
          1e6 * 1e4) / 1e4).as("kl"))
  }
}
