package graft

import org.apache.spark.sql.DataFrame

/** Materialize-and-pin for shared subtrees and iterative lineage cuts.
  *
  * Every iterative operator in the engine (PageRank rounds, connected
  * components, BPE merges, k-means) and every shared staged subtree needs
  * its frame MATERIALIZED once — re-reading lineage would recompute the
  * whole upstream per consumer, and an iterative plan grows without a cut.
  * The wrong primitive at cluster scale is `localCheckpoint()` alone: its
  * blocks live in executor storage, so losing ONE executor makes every
  * dependent job unrecoverable ("its lineage has been truncated and cannot
  * be recomputed") — a 40-iteration PageRank on 1000 executors would
  * almost surely die. The right primitive depends on deployment, so
  * [[Staging.stage]] picks at runtime:
  *
  *  - a checkpoint directory IS configured
  *    (`SparkContext.setCheckpointDir`, i.e. a real cluster with durable
  *    storage) → reliable `checkpoint()`: blocks go to the fault-tolerant
  *    store, executor loss just re-reads them;
  *  - no checkpoint directory (local runs, tests, the bench) →
  *    `localCheckpoint()`: executor-local blocks, no filesystem round
  *    trip — strictly faster, and single-JVM local mode has no executor
  *    to lose.
  *
  * Both forms are EAGER (materialize now) and cut lineage identically, so
  * results are bit-identical either way — `StagingSpec` proves it by
  * running PageRank and connected components under both modes.
  */
object Staging {
  implicit class StageOps(private val df: DataFrame) extends AnyVal {
    /** Materialize `df` now and cut its lineage: reliable `checkpoint()`
      * when the session has a checkpoint dir, `localCheckpoint()`
      * otherwise. See [[Staging]] for the cluster-scale rationale.
      *
      * The reliable path persists BEFORE checkpointing: a bare
      * `checkpoint()` runs the materializing action and then a second
      * job that RE-COMPUTES the whole unpersisted subtree to write the
      * checkpoint files (the recomputation RDD.checkpoint's own scaladoc
      * warns about) — persist makes the write job a cache read, and the
      * cache is dropped as soon as the files are down. Deployments
      * should also set `spark.cleaner.referenceTracking.cleanCheckpoints
      * =true` so superseded per-iteration checkpoints are deleted when
      * their frames are garbage-collected; without it, reliable
      * checkpoint data accumulates for the application's lifetime
      * (Spark never cleans it by default). */
    def stage(): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
        val pinned = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try pinned.checkpoint()
        finally pinned.unpersist(blocking = false)
      } else df.localCheckpoint()
  }
}
