package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = pre-shuffled-at-rest: two tables bucketed on the join key
  * join with ZERO exchanges — the co-located-join strategy for repeated
  * large joins at 100 TB (SURVEY.md "partitioning & shuffle"). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle exchange") {
    val left = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 2).as("v1"))
    val right = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 3).as("v2"))

    val lb = StagedSources.bucketedTable(spark, left, "tbl_bucket_l", "k", 4)
    val rb = StagedSources.bucketedTable(spark, right, "tbl_bucket_r", "k", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the SMJ path so the assertion is about bucketing, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = lb.join(rb, "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS tbl_bucket_l")
      spark.sql("DROP TABLE IF EXISTS tbl_bucket_r")
    }
  }
}
