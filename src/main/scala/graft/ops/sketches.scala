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
      // shape metadata as literal columns: zero storage beyond d·w rows,
      // lets consumers (cmsJoinSize) validate compatibility in-plan
      .withColumn("__depth", lit(depth)).withColumn("__width", lit(width))

  /** [[cmsBuild]] over a pre-aggregated (key, weight) frame: cells sum
    * the weights instead of counting rows. Lets a caller that already
    * holds per-key counts (dedup stats, join-size probes) sketch them
    * without re-scanning the raw input — cmsBuild(raw) ≡
    * cmsBuildWeighted(raw.groupBy(k).count). */
  def cmsBuildWeighted(df: DataFrame, keyCol: String, weightCol: String,
                       depth: Int, width: Int): DataFrame =
    df.select(col(weightCol).as("__w"),
        explode(cellsOf(col(keyCol), depth, width)).as("cell"))
      .groupBy(col("cell.seed").as("seed"),
        col("cell.bucket").as("bucket"))
      .agg(sum(col("__w")).as("c"))
      .withColumn("__depth", lit(depth)).withColumn("__width", lit(width))

  /** Equi-join size estimate from two sketches (the AGMS/CMS inner
    * product): per hash row, Σ_b cA(row,b)·cB(row,b) over-counts
    * |A ⋈ B| by exactly the colliding cross terms, so MIN over the
    * depth rows is the classic never-under estimate — the cardinality
    * primitive a planner consults before picking join strategy /
    * shuffle partitioning, from two d·w summaries and NO scan of
    * either input. Deterministic buckets → the estimate itself is
    * engine-reproducible, not just bounded.
    *
    * PRECONDITION: both sketches must have been built with the SAME
    * depth AND width. [[cmsBuild]]/[[cmsBuildWeighted]] stamp their
    * shape as literal `__depth`/`__width` columns; when both inputs
    * carry them, any joined cell from mismatched shapes fires
    * `raise_error` at execution — a free per-row comparison of two
    * literals, never an extra scan, and never a silent
    * plausible-looking estimate. Hand-built or merged sketch frames
    * without the stamps skip the guard and inherit the precondition
    * unchecked (a shape mismatch there can return a meaningless
    * number — re-stamp with `lit` columns to keep the check).
    *
    * @return one row (est_join_size) — min over rows of the cell
    *         inner product
    */
  def cmsJoinSize(sketchA: DataFrame, sketchB: DataFrame): DataFrame = {
    val stamped = Seq(sketchA, sketchB).forall(s =>
      s.columns.contains("__depth") && s.columns.contains("__width"))
    val a = sketchA.select(col("seed"), col("bucket"),
      col("c").as("ca"),
      (if (stamped) concat_ws("x", col("__depth"), col("__width"))
       else lit(null)).as("__shape_a"))
    val b = sketchB.select(col("seed"), col("bucket"),
      col("c").as("cb"),
      (if (stamped) concat_ws("x", col("__depth"), col("__width"))
       else lit(null)).as("__shape_b"))
    val cell =
      if (stamped)
        when(col("__shape_a") =!= col("__shape_b"),
          raise_error(format_string(
            "cmsJoinSize: sketch shape mismatch (%s vs %s)",
            col("__shape_a"), col("__shape_b"))).cast("bigint"))
          .otherwise(col("ca") * col("cb"))
      else col("ca") * col("cb")
    a.join(b, Seq("seed", "bucket"))
      .groupBy("seed")
      .agg(sum(cell).as("ip"))
      .agg(min(col("ip")).as("est_join_size"))
  }

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
