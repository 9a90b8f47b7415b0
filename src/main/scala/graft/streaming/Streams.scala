package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming parity — SURVEY.md §2.9.
  *
  * The reference's incremental surface is Airflow `@yearly` catchup
  * backfills (one run per season, ≤3 concurrent —
  * `scrape_data_to_gcs.py:268-277`). The Spark-native equivalent is a file
  * stream + `Trigger.AvailableNow`: process everything currently present,
  * in bounded batches, then stop — exactly "catch up, then exit", but with
  * watermarked event-time semantics instead of filename conventions.
  *
  * Determinism: the windowed aggregate sums through `decimal(18,2)` so the
  * result is independent of batch slicing and partial-agg order — the
  * streaming result hash-matches the batch oracle.
  */
object Streams {

  /** Daily tumbling-window aggregate over the `events` stream: count +
    * exact value sum per (day, event_type), watermarked 1 day. */
  def dailyEventAgg(spark: SparkSession, dir: String,
                    checkpoint: String): DataFrame = {
    // ts arrives as nanosecond longs (see Tables.events); convert exactly.
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      // the file-stream source wants a directory; select just the events
      // table out of the scale-factor dir
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    val agg = stream
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value_dec"))
      .select(col("win.start").as("day"), col("event_type"), col("cnt"),
        col("sum_value_dec").cast("double").as("sum_value"))

    val sinkName = "graft_stream_" + math.abs(checkpoint.hashCode)
    val q = agg.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }
}
