package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Sequence packing: the distributed two-pass prefix sum must equal the
  * naive single-partition global window, and the manifest must conserve
  * documents and tokens. */
class PackingSpec extends SparkSpec {

  private def docsWithTokens = {
    val d = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    d.select(col("doc_id"),
      Text.bpeishTokenCount(col("text")).cast("long").as("n_tokens"))
  }

  test("distributed prefix sum equals the global-window reference") {
    val docs = docsWithTokens
    // force 8 real range partitions — AQE would coalesce 500 docs to 1,
    // making the offset join vacuous
    val got = Packing
      .packAssignments(docs, "doc_id", "n_tokens", 2048, numPartitions = 8)
      .select("doc_id", "cum_before", "seq_id")

    // reference: the formulation that does NOT scale (single-partition
    // global window) but is trivially correct
    val wAll = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(wAll), lit(0L)))
      .withColumn("seq_id", expr("cum_before div 2048"))
      .select("doc_id", "cum_before", "seq_id")

    assert(got.collect().toSet === want.collect().toSet)
  }

  test("prefix sum is computed across multiple range partitions") {
    // the equality above is only meaningful if the distributed path
    // actually splits the data: pinned range partitioning must yield
    // several non-empty partitions over the 500 docs
    val parted = docsWithTokens.repartitionByRange(8, col("doc_id"))
    val nonEmpty = parted.rdd
      .mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0))
      .sum()
    assert(nonEmpty >= 4)
  }

  test("manifest conserves documents and tokens") {
    val docs = docsWithTokens
    val manifest = Packing.packManifest(docs, "doc_id", "n_tokens", 2048)
      .collect()
    val totalDocs = docs.count()
    val totalTokens = docs.agg(sum("n_tokens")).head().getLong(0)
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    assert(manifest.map(_.getAs[Long]("fill_tokens")).sum === totalTokens)
    // doc spans of consecutive windows don't overlap
    val spans = manifest
      .map(r => (r.getAs[Long]("seq_id"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, _, lastA), (_, firstB, _)) => assert(lastA < firstB)
      case _ =>
    }
  }

  test("every window except possibly the last is filled past maxLen - maxDoc") {
    // a window closes only when the running total crosses its boundary,
    // so any non-final window must hold at least maxLen - (largest doc)
    // tokens — the fill guarantee of concat-then-chunk packing
    val docs = docsWithTokens
    val maxDoc = docs.agg(max("n_tokens")).head().getLong(0)
    val manifest = Packing.packManifest(docs, "doc_id", "n_tokens", 2048)
      .collect().sortBy(_.getAs[Long]("seq_id"))
    manifest.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("fill_tokens") > 2048 - maxDoc,
        s"underfilled window ${r.getAs[Long]("seq_id")}")
    }
  }

  test("chunkWindows: complete coverage, bounded overlap, no subset tails") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // lengths that hit every boundary case around width=8, stride=6:
    // shorter than a window, exact window, one past, exact stride grid,
    // and a tail shorter than the overlap (must be dropped)
    val docs = Seq(3, 8, 9, 14, 20, 21).zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(_.toString)) }
      .toDF("doc_id", "toks")
    val chunks = Packing.chunkWindows(docs, "doc_id", "toks", 8, 6)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))

    val byDoc = chunks.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.collect().foreach { row =>
      val (id, n) = (row.getLong(0), row.getSeq[String](1).length)
      val cs = byDoc(id)
      // every token is covered: union of [start, start+len-1] == [1, n]
      val covered = cs.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered === (1 to n).toSet, s"doc $id coverage")
      // no chunk is a subset of its predecessor
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 + b._4 > a._3 + a._4,
          s"doc $id chunk ${b._2} adds nothing")
        case _ =>
      }
      // all but the last chunk are full width
      cs.dropRight(1).foreach(c => assert(c._4 === 8))
    }
  }
}
