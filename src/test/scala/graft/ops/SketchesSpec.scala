package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(3)
  private val items = (1 to 2000).map(_ =>
    ("k" + rnd.nextInt(50)).hashCode.toLong % 97)

  test("cms point estimates never under-count and are exact when wide") {
    val df = items.toDF("k")
    val truth = items.groupBy(identity).map { case (k, g) =>
      k -> g.size.toLong
    }
    // narrow sketch: collisions expected, estimates must only inflate
    val narrow = sketches.cmsEstimate(
      sketches.cmsBuild(df, "k", depth = 4, width = 16),
      df.distinct(), "k", depth = 4, width = 16)
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, c) =>
      assert(narrow(k) >= c, s"under-count at $k: ${narrow(k)} < $c")
    }
    // wide sketch: collision-free at this key count → exact
    val wide = sketches.cmsEstimate(
      sketches.cmsBuild(df, "k", depth = 4, width = 4096),
      df.distinct(), "k", depth = 4, width = 4096)
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, c) =>
      assert(wide(k) === c, s"wide sketch inexact at $k")
    }
  }

  test("cmsBuildWeighted over key counts equals cmsBuild over raw rows") {
    val raw = items.toDF("k")
    val counted = raw.groupBy("k").agg(count(lit(1)).as("c"))
    val a = sketches.cmsBuild(raw, "k", 4, 64)
      .select("seed", "bucket", "c")
      .as[(Int, Long, Long)].collect().toSet
    val b = sketches.cmsBuildWeighted(counted, "k", "c", 4, 64)
      .select("seed", "bucket", "c")
      .as[(Int, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("cms join-size estimate never under-counts; exact when wide") {
    val a = items.toDF("k")
    val b = items.filter(_ % 3 == 0).toDF("k")
    val ca = items.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cb = items.filter(_ % 3 == 0).groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val exact = ca.map { case (k, c) => c * cb.getOrElse(k, 0L) }.sum
    def est(w: Int): Long = sketches.cmsJoinSize(
      sketches.cmsBuild(a, "k", 4, w), sketches.cmsBuild(b, "k", 4, w))
      .as[Long].head()
    assert(est(16) >= exact)      // narrow: collisions only inflate
    assert(est(4096) === exact)   // wide: collision-free → exact
  }

  test("cmsJoinSize raises on a shape mismatch, never a silent number") {
    val a = items.toDF("k")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val exDepth = intercept[Exception] {
      sketches.cmsJoinSize(
        sketches.cmsBuild(a, "k", depth = 4, width = 64),
        sketches.cmsBuild(a, "k", depth = 8, width = 64))
        .collect()
    }
    assert(msgs(exDepth).exists(_.contains("shape mismatch")),
      exDepth.toString)
    // width mismatch too — undetectable from the cells, caught by the
    // literal stamps
    val exWidth = intercept[Exception] {
      sketches.cmsJoinSize(
        sketches.cmsBuild(a, "k", depth = 4, width = 64),
        sketches.cmsBuild(a, "k", depth = 4, width = 128))
        .collect()
    }
    assert(msgs(exWidth).exists(_.contains("shape mismatch")),
      exWidth.toString)
  }

  test("cms sketches merge additively: shard-union equals whole-build") {
    val (a, b) = items.splitAt(900)
    val merged = sketches.cmsBuild(a.toDF("k"), "k", 4, 64)
      .unionAll(sketches.cmsBuild(b.toDF("k"), "k", 4, 64))
      .groupBy("seed", "bucket").agg(sum("c").as("c"))
    val whole = sketches.cmsBuild(items.toDF("k"), "k", 4, 64)
    val diff = merged.join(whole, Seq("seed", "bucket"), "full_outer")
      .filter(merged("c") =!= whole("c") ||
        merged("c").isNull || whole("c").isNull)
    assert(diff.count() === 0)
  }

  test("serialize/deserialize round-trips the sketch exactly") {
    val built = sketches.cmsBuild(items.toDF("k"), "k", 4, 64)
    // rename before the join: `back` derives from `built`, and Spark's
    // self-join ambiguity check rejects same-lineage column refs
    val back = sketches.cmsDeserialize(
      sketches.cmsSerialize(built, 4, 64), 4, 64)
      .select(col("seed"), col("bucket"), col("c").as("c2"))
    val diff = back.join(built, Seq("seed", "bucket"), "full_outer")
      .filter(col("c2") =!= col("c") ||
        col("c2").isNull || col("c").isNull)
    assert(diff.count() === 0)
    // the payload is one row of depth·width·8 bytes
    val row = sketches.cmsSerialize(built, 4, 64).collect()
    assert(row.length === 1)
    assert(row.head.getAs[Array[Byte]]("payload").length === 4 * 64 * 8)
  }

  test("deserialize guards the stored shape stamps") {
    val ser = sketches.cmsSerialize(
      sketches.cmsBuild(items.toDF("k"), "k", 4, 64), 4, 64)
    val ex = intercept[Exception] {
      sketches.cmsDeserialize(ser, 4, 128).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(_.contains("shape mismatch")), ex.toString)
  }

  test("cmsMergeCells over deserialized at-rest shards equals whole-build") {
    val (a, b) = items.splitAt(900)
    def atRest(rows: Seq[Long]) = sketches.cmsDeserialize(
      sketches.cmsSerialize(
        sketches.cmsBuild(rows.toDF("k"), "k", 4, 64), 4, 64), 4, 64)
    val merged = sketches.cmsMergeCells(atRest(a), atRest(b))
    val whole = sketches.cmsBuild(items.toDF("k"), "k", 4, 64)
    val diff = merged.join(whole, Seq("seed", "bucket"), "full_outer")
      .filter(merged("c") =!= whole("c") ||
        merged("c").isNull || whole("c").isNull)
    assert(diff.count() === 0)
    // merged cells still carry the shape stamps for cmsJoinSize's guard
    assert(merged.columns.contains("__depth") &&
      merged.columns.contains("__width"))
  }
}
