package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Every registered graft_* expression must survive CODEGEN_ONLY
  * evaluation: Spark's default factory mode silently falls back to the
  * interpreted path when generated code fails to compile (a WARN-level
  * CompileException nobody reads), which is how the TriProducts
  * static-forwarder bug ran every moment pass 4-5× slow for a full
  * round. With `spark.sql.codegen.factoryMode=CODEGEN_ONLY` a broken
  * doGenCode throws instead of degrading — this suite turns the
  * invisible regression into a red test. */
class CodegenOnlySpec extends SparkSpec {
  import spark.implicits._

  private def withCodegenOnly[T](f: => T): T = {
    val key = "spark.sql.codegen.factoryMode"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try f
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("all scalar graft_* expressions compile under CODEGEN_ONLY") {
    withCodegenOnly {
      val doc = Seq((1L, "alpha beta gamma delta epsilon zeta"))
        .toDF("id", "text")
      val toks = split(col("text"), " ")
      val emb = array((0 until 8).map(i => lit(i.toFloat)): _*)
      val exprs = Seq(
        call_function("graft_dot", emb, emb),
        call_function("graft_rolling_hash", col("text")),
        call_function("graft_shingles", toks, lit(3)),
        call_function("graft_shingle_spans", toks, lit(2)),
        call_function("graft_minhash",
          call_function("graft_shingles", toks, lit(3)), lit(4)),
        call_function("graft_simhash", toks, lit(16)),
        call_function("graft_min_md5",
          call_function("graft_shingles", toks, lit(3))),
        call_function("graft_overlap",
          array(lit(1L), lit(2L)), array(lit(2L), lit(3L))),
        call_function("graft_lsh_buckets", emb, lit(2), lit(3)),
        call_function("graft_zorder", lit(3L), lit(5L), lit(16)),
        call_function("graft_tri_products", emb),
        call_function("graft_nfc", col("text")),
        call_function("graft_deflate_len", col("text")),
        call_function("graft_jaro_winkler", col("text"), lit("alpha")))
      val row = doc.select(exprs.zipWithIndex.map { case (e, i) =>
        e.as(s"e$i")
      }: _*).collect()
      assert(row.length === 1 && (0 until exprs.length).forall(i =>
        row.head.get(i) != null))
    }
  }

  test("graft aggregate expressions compile under CODEGEN_ONLY") {
    withCodegenOnly {
      val ids = spark.range(100).select(xxhash64(col("id")).as("h"))
      val bf = ids
        .agg(call_function("graft_bloom_agg", col("h"), lit(100L),
          lit(2048L)).as("bf"))
        .head().getAs[Array[Byte]]("bf")
      assert(bf != null && bf.nonEmpty)
      val hits = ids
        .select(call_function("graft_might_contain", lit(bf), col("h"))
          .as("hit"))
        .agg(sum(when(col("hit"), 1L).otherwise(0L))).as[Long].head()
      assert(hits === 100L)
    }
  }
}
