package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.text.Text

/** In-flight pipeline QA via `observe()`: row counters and quality
  * tallies ride along with the action instead of re-scanning — at 100 TB
  * a separate `count()` per stage doubles the I/O, an observation is
  * free. */
class ObserveSpec extends SparkSpec {

  test("observe() reports stage row counts without extra jobs") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")

    val atScan = Observation("scan")
    val atGate = Observation("gate")
    val gated = docs
      .observe(atScan, count(lit(1)).as("rows_in"))
      .withColumn("q", Text.qualityScore(col("text")))
      .filter(col("q.n_tokens") >= 20)
      .observe(atGate, count(lit(1)).as("rows_kept"),
        sum(col("n_chars")).as("chars_kept"))

    val kept = gated.count()

    val rowsIn = atScan.get("rows_in").asInstanceOf[Long]
    val rowsKept = atGate.get("rows_kept").asInstanceOf[Long]
    assert(rowsIn === docs.count())
    assert(rowsKept === kept)
    assert(rowsKept <= rowsIn)
    assert(atGate.get("chars_kept").asInstanceOf[Long] > 0L)
  }
}
