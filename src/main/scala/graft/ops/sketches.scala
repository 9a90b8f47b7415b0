package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: the fixed-size, MERGEABLE frequency summary for
  * streams and shards — each of `depth` salted hash rows buckets every
  * observation into `width` counters; a point estimate reads the
  * minimum of a key's `depth` cells and can only over-count (collisions
  * add, never subtract). Cells are plain additive counts, so sketches
  * built per partition / per day / per shard union + re-aggregate into
  * the corpus sketch with no rescan — the property that makes the
  * d·w-cell summary the right answer when the key space itself is too
  * large to hold.
  *
  * Hashes are the engine-portable salted-md5 bucket idiom (same as the
  * samplers and LSH bands), so the DuckDB oracle reproduces every cell
  * exactly; a 100 TB deployment would swap xxhash64 for md5 and keep
  * the shape.
  */
object sketches {

  private def bucket(key: org.apache.spark.sql.Column, seed: Int,
                     width: Int) =
    (conv(substring(md5(concat_ws(":", lit(seed.toString),
      key.cast("string"))), 1, 8), 16, 10)
      .cast("bigint") % width).cast("bigint")

  /** The d (seed, bucket) cells of one key, as an explodable array —
    * shared by the batch builder and the streaming sketch maintainer. */
  private[graft] def cellsOf(key: org.apache.spark.sql.Column,
                             depth: Int, width: Int)
  : org.apache.spark.sql.Column =
    array((0 until depth).map(i =>
      struct(lit(i).as("seed"), bucket(key, i, width).as("bucket"))): _*)

  /** Build the d×w sketch over one key column: ≤ depth·width rows of
    * (seed, bucket, c). One explode (depth small) + one hash agg with
    * map-side combine — a single shuffle of at most d·w rows per task.
    */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int,
               width: Int): DataFrame =
    df.select(explode(cellsOf(col(keyCol), depth, width)).as("cell"))
      .groupBy(col("cell.seed").as("seed"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point-estimate each probe key against a built sketch: min of its
    * depth cells. The sketch is d·w rows — broadcast, never shuffled;
    * the probe side stays partitioned wherever it already lives. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    probes.select(col(keyCol),
        explode(cellsOf(col(keyCol), depth, width)).as("cell"))
      .select(col(keyCol), col("cell.seed").as("seed"),
        col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("c")).as("est"))
  }
}
