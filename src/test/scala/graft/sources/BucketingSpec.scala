package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = pre-shuffled-at-rest: two tables bucketed on the join key
  * join with ZERO exchanges — the co-located-join strategy for repeated
  * large joins at 100 TB (SURVEY.md "partitioning & shuffle"). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle exchange") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val left = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 2).as("v1"))
    val right = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 3).as("v2"))

    left.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$wh/tbl_bucket_l").saveAsTable("tbl_bucket_l")
    right.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$wh/tbl_bucket_r").saveAsTable("tbl_bucket_r")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("tbl_bucket_l")
        .join(spark.table("tbl_bucket_r"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS tbl_bucket_l")
      spark.sql("DROP TABLE IF EXISTS tbl_bucket_r")
    }
  }
}
