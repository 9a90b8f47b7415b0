package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** SURVEY.md §5 item 5: streaming result ≡ batch result on the events
  * table (Trigger.AvailableNow catchup parity). */
class StreamsSpec extends SparkSpec {

  test("streamed daily agg equals batch daily agg") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_spec").toString

    val streamed = Streams.dailyEventAgg(spark, dir, ckpt)
      .select(to_date(col("day")).as("day"), col("event_type"),
        col("cnt"), col("sum_value"))

    val batch = Tables.events(spark, dir)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))

    assert(streamed.collect().toSet === batch.collect().toSet)
  }

  test("streamed dedup emits exactly the batch-distinct key set") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_dd_spec").toString

    val streamed = Streams.dedupStream(spark, dir, ckpt).collect()
    val batch = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct().collect()

    assert(streamed.length === batch.length, "each key emitted once")
    assert(streamed.toSet === batch.toSet)
  }

  test("stream-static enrichment equals the batch join") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_en_spec").toString

    val streamed = Streams.enrichStream(spark, dir, ckpt).collect()
    val batch = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        pmod(col("user_id"), lit(25)).as("nk"))
      .join(spark.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_name")),
        col("nk") === col("n_nationkey"))
      .select(col("event_id"), col("event_type"), col("n_name"))
      .collect()

    assert(streamed.length === batch.length)
    assert(streamed.toSet === batch.toSet)
  }
}
