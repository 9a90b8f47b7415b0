package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Staging.StageOps

/** Deterministic random walks for graph-embedding training data
  * (DeepWalk / node2vec positive-pair generation, Perozzi et al. 2014 —
  * the walk corpus is the "sentences" a skip-gram model trains on).
  *
  * Walks must be REPRODUCIBLE here (oracle-compared, resumable at
  * scale), so the next hop is not an RNG draw but a keyed deterministic
  * choice: from node u at step t of walk (start, w), move to the
  * neighbor v minimizing md5("start|w|t|v"). That is a uniform-ish
  * pseudo-random pick that any engine reproduces exactly — no numeric
  * hash casts, no platform RNG, ties impossible (distinct v ⇒ distinct
  * digest input).
  *
  * Scale shape: one adjacency join per step — the frontier is
  * |nodes|·walksPerNode rows, each step fans out to the current node's
  * neighbors and immediately reduces with min_by (map-side combinable).
  * State is linear in walks; rounds are the fixed walk length; each
  * round's frontier is staged to keep lineage flat. No driver state.
  */
object Walks {

  /** Walk corpus: (start, walk, step, node) for step 0..steps, one walk
    * tree per (node × walksPerNode). Walks stop early at sink nodes
    * (no outgoing edge) — symmetrize the edges first if that is not
    * intended. */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
                  walksPerNode: Int, steps: Int): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().stage() // probed every step
    val starts = e.select(col("src").as("start")).distinct()
    val walkIds = broadcast(
      e.sparkSession.range(walksPerNode).toDF("walk"))
    var frontier = starts.crossJoin(walkIds)
      .select(col("start"), col("walk"), col("start").as("node"))
      .stage()
    var out = frontier.withColumn("step", lit(0))
    for (t <- 1 to steps) {
      frontier = frontier.join(e, col("node") === col("src"))
        .groupBy("start", "walk")
        .agg(min_by(col("dst"),
          md5(concat_ws("|", col("start"), col("walk"), lit(t),
            col("dst")))).as("node"))
        .stage()
      out = out.unionByName(frontier.withColumn("step", lit(t)))
    }
    out.select(col("start"), col("walk").cast("long").as("walk"),
      col("step").cast("long").as("step"), col("node"))
  }

  /** Skip-gram positive pairs from the walk corpus: co-occurrences
    * within `window` steps on the same walk, aggregated to
    * (center, context, n_cooc). This frame IS the training set a
    * node-embedding job consumes. One self-join per walk bounded by
    * the window width (steps ≤ window apart), then a hash agg. */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val a = walks.select(col("start"), col("walk"),
      col("step").as("s1"), col("node").as("center"))
    val b = walks.select(col("start"), col("walk"),
      col("step").as("s2"), col("node").as("context"))
    a.join(b, Seq("start", "walk"))
      .filter(col("s1") =!= col("s2") &&
        abs(col("s1") - col("s2")) <= window)
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n_cooc"))
  }
}
