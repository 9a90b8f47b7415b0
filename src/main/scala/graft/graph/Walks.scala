package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Staging.StageOps

/** Deterministic random walks for graph-embedding training data
  * (DeepWalk / node2vec positive-pair generation, Perozzi et al. 2014 —
  * the walk corpus is the "sentences" a skip-gram model trains on).
  *
  * Walks must be REPRODUCIBLE here (oracle-compared, resumable at
  * scale), so the next hop is not an RNG draw but a keyed deterministic
  * choice: at step t of walk (start, w) on node u, move to u's neighbor
  * of rank  md5("start|w|t") mod degree(u)  in dst order. The digest
  * depends only on the walk identity and step — NOT on the candidate
  * neighbor — so each walk-step touches exactly ONE adjacency row via an
  * equi-join on (node, rank). A hub node with 10^6 neighbors costs a
  * walk passing through it one probe, not 10^6 hash evaluations (the
  * argmin-over-neighbors formulation fans out by the frontier's degree
  * sum every step — measured 42 s vs ~4 s on the sf0.1 trade graph).
  *
  * Scale shape: the rank-indexed adjacency (row_number per src — a
  * per-key window over the edge list, built once and staged) and the
  * degree table are edge-/node-partitioned; each step is two
  * hash-partitioned equi-joins sized by the walk count. State is linear
  * in walks; rounds are the fixed walk length. No driver state.
  */
object Walks {

  /** Walk corpus: (start, walk, step, node) for step 0..steps, one walk
    * per (node × walksPerNode). Walks stop early at sink nodes (no
    * outgoing edge) — symmetrize the edges first if that is not
    * intended. */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
                  walksPerNode: Int, steps: Int): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    // rank-indexed adjacency + degrees, built once, probed every step
    val adj = e.withColumn("rk",
        row_number().over(
          Window.partitionBy(col("src")).orderBy(col("dst"))) - 1)
      .select(col("src").as("a_src"), col("rk").cast("long").as("a_rk"),
        col("dst").as("a_dst"))
      .stage()
    val deg = adj.groupBy(col("a_src").as("d_src"))
      .agg(count(lit(1)).as("deg")).stage()
    val walkIds = broadcast(
      e.sparkSession.range(walksPerNode).toDF("walk"))
    var frontier = adj.select(col("a_src").as("start")).distinct()
      .crossJoin(walkIds)
      .select(col("start"), col("walk"), col("start").as("node"))
      .stage()
    var out = frontier.withColumn("step", lit(0))
    for (t <- 1 to steps) {
      // md5("start|walk|t") mod degree — one adjacency row per walk
      frontier = frontier
        .join(deg, col("node") === col("d_src"))
        .withColumn("pick",
          conv(substring(md5(concat_ws("|", col("start"), col("walk"),
            lit(t))), 1, 8), 16, 10).cast("long") % col("deg"))
        .join(adj, col("node") === col("a_src") &&
          col("pick") === col("a_rk"))
        .select(col("start"), col("walk"), col("a_dst").as("node"))
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
