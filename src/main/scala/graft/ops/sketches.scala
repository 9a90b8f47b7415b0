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

  /** Serialize a CMS into ONE row with a BINARY payload — the at-rest
    * form a sketch store persists per shard/day: the d×w grid packed
    * dense as big-endian-style 8-byte cells (16 hex digits each,
    * seed-major), `unhex`'d to a w·d·8-byte blob. Pure codegen HOFs
    * (map lookup + transform + unhex), no driver collection; the frame
    * in flight is ≤ d·w rows by construction, so the one-row aggregate
    * is a report-sized reduction, not a data funnel. Shape rides along
    * as (depth, width) columns for the deserializer's guard.
    *
    * Cell counts must fit in unsigned hex-16 (they are nonnegative
    * longs — always true for counts). The (depth, width) args must
    * match the sketch's own `__depth`/`__width` stamps — a mismatch
    * raises at execution (the [[cmsDeserialize]] guard, mirrored):
    * packing with the wrong width would alias cells into the same
    * dense index and silently drop everything past depth·width. */
  def cmsSerialize(sketch: DataFrame, depth: Int, width: Int)
  : DataFrame =
    sketch
      .select(when(col("__depth") =!= depth || col("__width") =!= width,
        raise_error(format_string(
          s"cmsSerialize: shape mismatch (built %sx%s, asked " +
            s"${depth}x$width)", col("__depth"), col("__width"))))
        .otherwise((col("seed").cast("bigint") * width +
          col("bucket").cast("bigint"))).as("__i"), col("c"))
      .agg(map_from_arrays(collect_list(col("__i")),
        collect_list(col("c"))).as("__m"))
      .select(lit(depth).as("depth"), lit(width).as("width"),
        unhex(array_join(transform(
          sequence(lit(0L), lit(depth.toLong * width - 1)),
          i => lpad(hex(coalesce(element_at(col("__m"), i), lit(0L))),
            16, "0")), "")).as("payload"))

  /** Unpack an at-rest sketch blob back into sparse (seed, bucket, c)
    * cells (zero cells dropped — the same sparse form [[cmsBuild]]
    * emits), re-stamped with the shape columns. The (depth, width)
    * args must match the persisted row's stamps; a mismatch raises at
    * execution rather than decoding garbage. One scan-local explode of
    * d·w cells per sketch row. */
  def cmsDeserialize(serialized: DataFrame, depth: Int, width: Int)
  : DataFrame =
    serialized
      .select(when(col("depth") =!= depth || col("width") =!= width,
        raise_error(format_string(
          s"cmsDeserialize: shape mismatch (stored %sx%s, asked " +
            s"${depth}x$width)", col("depth"), col("width"))))
        .otherwise(hex(col("payload"))).as("__h"))
      .select(explode(transform(
        sequence(lit(0L), lit(depth.toLong * width - 1)),
        i => struct(i.as("i"),
          conv(col("__h").substr((i * 16 + 1).cast("int"), lit(16)),
            16, 10).cast("bigint").as("c")))).as("cell"))
      .select(expr(s"cell.i DIV $width").as("seed"),
        (col("cell.i") % width).as("bucket"), col("cell.c").as("c"))
      .filter(col("c") > 0)
      .withColumn("__depth", lit(depth)).withColumn("__width", lit(width))

  /** Merge CMS sketches by cell addition — THE property the summary
    * exists for: per-shard/per-day sketches built independently union
    * into the corpus sketch with no rescan. Inputs are sparse cell
    * frames ([[cmsBuild]] / [[cmsDeserialize]] output); the result is
    * re-stamped from the first input's literal shape columns (all
    * inputs must share one shape — deserializers/builders guarantee
    * it). */
  def cmsMergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("seed", "bucket")
      .agg(sum(col("c")).as("c"), max(col("__depth")).as("__depth"),
        max(col("__width")).as("__width"))

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
