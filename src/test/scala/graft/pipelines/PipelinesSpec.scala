package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E2/E3 pipeline invariants on the sf0.001 testdata (SURVEY.md §3). */
class PipelinesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("E2: ids unique, flags consistent, exhibition rows dropped") {
    val out = Pipelines.e2SeasonPipeline(spark, dir).cache()
    val n = out.count()
    assert(n > 0)
    assert(out.select("gameId").distinct().count() === n)
    // isRegular=1 iff before the season cutoff
    val bad = out.filter(
      (col("isRegular") === 1) =!=
        (col("gameDate") < concat(col("seasonStartYear"), lit("-07-01"))
          .cast("timestamp"))).count()
    assert(bad === 0)
    // the anomalous season keeps only post-cutoff rows (F6)
    assert(out.filter(col("seasonStartYear") === 1998 &&
      col("gameDate") <= "1998-02-01").count() === 0)
    out.unpersist()
  }

  test("E3: seq dense per game, period monotone, fill never null") {
    val out = Pipelines.e3DetailPipeline(spark, dir).cache()
    assert(out.count() > 0)
    // seq is 1..n per game
    val seqCheck = out.groupBy("game_id")
      .agg(count(lit(1)).as("n"), max(col("seq")).as("mx"),
        min(col("seq")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(seqCheck.count() === 0)
    assert(out.filter(col("away_points").isNull).count() === 0)
    // period counters never decrease along seq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("game_id").orderBy("seq")
    val dec = out.withColumn("prev", lag(col("period"), 1).over(w))
      .filter(col("prev").isNotNull && col("period") < col("prev"))
    assert(dec.count() === 0)
    out.unpersist()
  }

  test("entry() returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("corpusPrep: splits partition the kept docs, counts consistent") {
    val out = Pipelines.corpusPrep(spark, dir).collect()
    assert(out.nonEmpty)
    val bySplit = out.groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val total = out.map(_.getAs[Long]("n_docs")).sum
    // quality gate + dedup only ever drop rows
    val raw = graft.Tables.t(spark, dir, "documents").count()
    assert(total > 0 && total <= raw)
    // train must dominate at the 90/5/5 bucket split
    val trainN = bySplit.get("train").map(_.map(_.getAs[Long]("n_docs")).sum)
    assert(trainN.exists(n => n > total / 2))
  }
}
