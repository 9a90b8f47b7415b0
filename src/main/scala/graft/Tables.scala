package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Catalog of the driver-provided testdata tables (TESTDATA.md).
  *
  * The reference engine's data model is "a flat table per entity, parquet at
  * rest in a lake layout" (SURVEY.md §1; reference
  * `data_ingestion/dags/scrape_data_to_gcs.py:34-39,196-320`). Here every
  * entity is a parquet file under one scale-factor directory; schemas are
  * carried by parquet (declared, not inferred) so Catalyst gets exact types
  * and the vectorized reader + column pruning work out of the box.
  *
  * Scale note: `spark.read.parquet` on a directory of files produces one task
  * per row-group/128MB split — at 100 TB this is the same call, just more
  * splits; nothing here is driver-bound.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one entity table from a scale-factor dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with a usable TimestampType `ts`.
    *
    * The testdata's events.parquet stores `ts` as parquet TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see Verify/Bench) so the
    * column arrives as nanosecond longs, converted here to microsecond
    * timestamps via integer division (`div` keeps it exact — a double
    * roundtrip would lose precision above 2^53).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}
