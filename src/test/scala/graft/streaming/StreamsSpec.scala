package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** SURVEY.md §5 item 5: streaming result ≡ batch result on the events
  * table (Trigger.AvailableNow catchup parity). */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

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

  test("streamed OHLC candles equal the batch ohlcBars result") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_ohlc_spec").toString
    val streamed = Streams.ohlcStream(spark, dir, ckpt)
      .select(col("event_type"), col("bar_start"), col("open"),
        col("high"), col("low"), col("close"), col("n_ticks"),
        col("volume").cast("double"))
      .collect().toSet
    val batch = graft.ops.timeseries.ohlcBars(
        Tables.events(spark, dir), "event_type", "ts", "value",
        "event_id", barSeconds = 86400L)
      .select(col("event_type"), col("bar_start"), col("open"),
        col("high"), col("low"), col("close"), col("n_ticks"),
        col("volume").cast("double"))
      .collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("temporal enrich stream equals the batch at-event-time join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_scd2_spec").toString
    val dim = spark.range(150L * 5).select(
      (col("id") % 150).as("user_id"),
      (col("id") / 150).cast("int").as("k"))
      .select(col("user_id"),
        expr("timestamp(date_add(date '2024-01-01', k * 7))")
          .as("valid_from"),
        expr("timestamp(date_add(date '2024-01-01', (k + 1) * 7))")
          .as("valid_to"),
        ((col("user_id") + col("k")) % 3).cast("int").as("tier"))
    val streamed = Streams.temporalEnrichStream(spark, dir, ckpt, dim,
        "user_id", "valid_from", "valid_to")
      .select(col("event_id"), col("tier"))
      .as[(Long, Int)].collect().toSet
    val batch = Tables.events(spark, dir)
      .join(dim, Seq("user_id"))
      .filter(col("ts") >= col("valid_from") &&
        col("ts") < col("valid_to"))
      .select(col("event_id"), col("tier"))
      .as[(Long, Int)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // at-event-time semantics: every event matches exactly ONE version
    assert(streamed.size === streamed.map(_._1).size)
  }

  test("streaming cms cells equal the batch sketch (shard-merge)") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_cms_spec").toString
    val streamed = Streams.cmsStream(spark, dir, ckpt, "user_id",
        depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    val batch = graft.ops.sketches.cmsBuild(
        Tables.events(spark, dir), "user_id", depth = 4, width = 64)
      .select("seed", "bucket", "c")
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streamed markov transitions equal the batch operator") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_mk_spec").toString
    val streamed = Streams.markovStream(spark, dir, ckpt)
      .as[(String, String, Long, Long)].collect().toSet
    val batch = graft.ops.timeseries.transitionMatrix(
        Tables.events(spark, dir), "user_id", "ts", "event_type",
        "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("markov state carries the cross-batch boundary step") {
    // one user, two time-ordered files: the a→b step exists ONLY as a
    // batch-boundary handoff through fMGWS state
    val tmp = Files.createTempDirectory("graft_mk_slices").toString
    def file(i: Int, rows: Seq[(Long, Long, Long, String)]): Unit = {
      val staging = Files.createTempDirectory(s"graft_mk_st_$i").toString
      rows.toDF("event_id", "epoch", "user_id", "event_type")
        .select(col("event_id"), col("epoch").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/ev_$i.parquet"))
    }
    file(0, Seq((1L, 1700000000L, 7L, "a")))
    file(1, Seq((2L, 1700000100L, 7L, "b"), (3L, 1700000200L, 7L, "b")))
    val ckpt = Files.createTempDirectory("graft_ckpt_mk_sl").toString
    val got = Streams.markovStream(spark, tmp, ckpt, glob = "*.parquet")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("a", "b", 1L, 1000000L), ("b", "b", 1L, 1000000L)))
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

  test("RocksDB state store: dedup result identical to the HDFS-map store") {
    // the 100 TB-state provider must be a pure swap — same keys out,
    // state format is a checkpoint property, not a semantics one
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_rdb_spec").toString
    val streamed = Streams.dedupStream(spark, dir, ckpt, rocksDb = true)
      .collect()
    val batch = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct().collect()
    assert(streamed.toSet === batch.toSet)
  }

  test("multi-batch slicing: 3 micro-batches produce the single-batch result") {
    // split the events table into 3 time-ordered files; with
    // maxFilesPerTrigger=1 AvailableNow runs 3 micro-batches, so
    // watermark advance + state handoff across batches is actually
    // exercised (a single file hides it). Time-ordering keeps every row
    // inside the 1-day watermark, as a season-ordered catchup would.
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_slices").toString
    val raw = spark.read.parquet(s"$dir/events.parquet").orderBy("ts")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_stage_$i").toString
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/ev_$i.parquet"))
    }

    // stateful path: windowed aggregation across the 3 batches
    val ckptAgg = Files.createTempDirectory("graft_ckpt_sl_agg").toString
    val slicedAgg = Streams.dailyEventAgg(spark, tmp, ckptAgg, "*.parquet")
      .select(to_date(col("day")).as("day"), col("event_type"),
        col("cnt"), col("sum_value")).collect()
    val batchAgg = Tables.events(spark, dir)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value")).collect()
    assert(slicedAgg.toSet === batchAgg.toSet)

    // stateless path: broadcast enrichment across the 3 batches
    val ckptEn = Files.createTempDirectory("graft_ckpt_sl_en").toString
    val slicedEn = Streams.enrichStream(spark, tmp, ckptEn,
      "*.parquet", dimDir = dir).collect()
    assert(slicedEn.length === n)
  }

  test("streaming LSH dedup: 3 sliced batches equal the batch incremental pass") {
    // arrivals split across 3 files → 3 foreachBatch probes of the same
    // static banded index; decisions depend only on each doc's shingles
    // vs the index, so the union of per-batch decisions must equal the
    // single batch incrementalNearDups run folded to keep/drop rows
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_lsh_slices").toString
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_lsh_st_$i").toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/docs_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_lsh_sl").toString
    val out = Files.createTempDirectory("graft_lsh_out").toString + "/dec"
    val sliced = Streams.lshDedupStream(spark, tmp, ckpt, out,
      numPerms = 8, numBands = 4, threshold = 0.8, glob = "*.parquet")
      .collect()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val arrivals = docs.filter(col("doc_id") % 17 === 0)
    val dups = graft.dedup.Dedup.incrementalNearDups(arrivals,
      docs.filter(col("doc_id") % 17 =!= 0), "doc_id", "text",
      numPerms = 8, numBands = 4, threshold = 0.8)
      .groupBy(col("new_id").as("doc_id"))
      .agg(count(lit(1)).as("n_dups"))
    val batch = arrivals.select(col("doc_id"))
      .join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_dups").isNull.as("keep"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
      .collect()
    assert(sliced.length === batch.length, "one decision per arrival")
    assert(sliced.toSet === batch.toSet)
    assert(batch.exists(r => !r.getBoolean(1)),
      "fixture must contain at least one dropped near-dup")
  }

  test("cc maintain stream: 3 sliced batches converge to from-scratch CC") {
    // the growing index makes cross-batch pairs discoverable, so the
    // final labels snapshot must equal connectedComponents over the
    // WHOLE corpus regardless of slicing — the property lshDedupStream
    // explicitly does not have
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_ccm_slices").toString
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_ccm_st_$i").toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/docs_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_ccm_sl").toString
    val store = Files.createTempDirectory("graft_ccm_store").toString
    val sliced = Streams.ccMaintainStream(spark, tmp, ckpt, store,
        numPerms = 8, numBands = 4, threshold = 0.8, glob = "*.parquet")
      .as[(Long, Long, Boolean)].collect().toSet

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scratch = graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8),
        "doc_a", "doc_b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(sliced === scratch)
    // the property only bites if some cluster actually straddles the
    // corpus/arrival split
    assert(scratch.exists { case (id, comp, _) =>
      (id % 17 == 0) != (comp % 17 == 0) },
      "fixture must contain a cluster straddling the split")
  }

  test("ann maintain stream: 3 sliced batches converge to the one-shot " +
    "batch assignment") {
    // frozen-quantizer assignment is slicing-invariant by design: the
    // merged view after 3 micro-batches must equal corpus assignment ∪
    // one-shot assignToCells over all arrivals — and the growing
    // assignment log must survive forced compaction (maxStoreFiles = 2
    // over 3 batches fires it)
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_annm_slices").toString
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .orderBy("vec_id")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_annm_st_$i").toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/emb_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_annm_sl").toString
    val store = Files.createTempDirectory("graft_annm_store").toString
    val sliced = graft.streaming.Streams.annMaintainStream(spark, tmp,
        ckpt, store, glob = "*.parquet", maxStoreFiles = 2)
      .as[(Long, Int)].collect().toSet
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 9 =!= 0)
    val arrivals = emb.filter(col("vec_id") % 9 === 0)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    val oneShot = corpus
      .select(col("vec_id"), col("label").as("cell"))
      .unionByName(graft.similarity.Similarity.assignToCells(arrivals,
        corpus, corpus.select(col("vec_id"), col("label").as("cell"))))
      .as[(Long, Int)].collect().toSet
    assert(sliced === oneShot)
    assert(sliced.exists { case (id, _) => id >= 200000L },
      "fixture must stream at least one arrival")
    // forced compaction kept the growing assignment log bounded
    val nParts = new java.io.File(s"$store/assignment_delta")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nParts <= 3, s"assignment log fragmented: $nParts")
  }

  test("ann maintain stream: seedFrom refuses a populated store " +
    "instead of nesting the snapshot inside it") {
    // FileUtil.copy into an existing directory nests source under
    // destination (assignment/assignment) — a silent layout
    // corruption. The restore path must fail loudly before any
    // stream state is created.
    val dir = "/root/testdata/sf0.001"
    val store = Files.createTempDirectory("graft_annm_populated")
      .toString
    Files.createDirectories(
      java.nio.file.Paths.get(s"$store/assignment"))
    val ckpt = Files.createTempDirectory("graft_ckpt_annm_pop").toString
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Streams.annMaintainStream(spark, dir, ckpt,
        store, seedFrom = Some("/nonexistent/snapshot"))
    }
    assert(e.getMessage.contains("already"),
      s"wrong failure: ${e.getMessage}")
  }

  test("ingest trio stream: seed-snapshot restore ≡ inline seed build") {
    // the round-12 startup optimization: the trio restores its three
    // seed stores (CC sets/buckets/labels, SA probe store, IVF
    // assignment/centroids) from shared prebuilt snapshots by file
    // copy instead of re-deriving them per run. Restored or built, the
    // drained view and every at-rest artifact must be IDENTICAL — the
    // seeds are the same deterministic computation over the same
    // corpus slice.
    val dir = "/root/testdata/sf0.001"
    import graft.{ExtensionQueries => EQ}
    def run(seeded: Boolean): (Set[(Long, Long, Long, Long, Int)],
        Set[(Long, Long)]) = {
      val ckpt = Files.createTempDirectory("graft_ckpt_trio_sd").toString
      val store = Files.createTempDirectory("graft_trio_sd").toString
      val out = graft.streaming.Streams.ingestTrioStream(spark, dir,
          ckpt, store, numPerms = 8, numBands = 4, threshold = 0.8,
          minLen = 5,
          ccSeedFrom = if (seeded) Some(EQ.ccStreamSeedDir(spark, dir))
            else None,
          saSeedFrom = if (seeded) Some(EQ.saStreamSeedDir(spark, dir))
            else None,
          annSeedFrom = if (seeded) Some(EQ.annTrioSeedDir(spark, dir))
            else None)
        .as[(Long, Long, Long, Long, Int)].collect().toSet
      val labels = spark.read
        .parquet(new java.io.File(s"$store/cc/labels").listFiles()
          .filter(_.getName.startsWith("v_")).head.toString)
        .as[(Long, Long)].collect().toSet
      (out, labels)
    }
    val (seededOut, seededLabels) = run(seeded = true)
    val (inlineOut, inlineLabels) = run(seeded = false)
    assert(seededOut === inlineOut)
    assert(seededLabels === inlineLabels)
    assert(seededOut.nonEmpty)
  }

  test("ingest trio stream: 3 sliced batches — all three at-rest " +
    "artifacts converge to their from-scratch batch computations") {
    // the batch-boundary consistency pin: ONE sliced arrivals stream
    // drives all three indexes, and after it drains, EACH artifact
    // (CC labels, SA dup report, IVF assignment) must equal its
    // independent from-scratch batch truth — simultaneously, out of
    // the same store
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_trio_slices").toString
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_trio_st_$i")
        .toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/docs_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_trio_sl").toString
    val store = Files.createTempDirectory("graft_trio_store").toString
    val sliced = graft.streaming.Streams.ingestTrioStream(spark, tmp,
        ckpt, store, numPerms = 8, numBands = 4, threshold = 0.8,
        minLen = 5, glob = "*.parquet",
        embPath = Some(s"$dir/embeddings.parquet"), maxStoreFiles = 2)
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    // from-scratch truths, each computed independently
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ccTruth = graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text",
          numPerms = 8, numBands = 4, threshold = 0.8),
        "doc_a", "doc_b")
      .select(col("doc_id"), col("comp"))
      .as[(Long, Long)].collect().toMap
    val saTruth = graft.text.SuffixArray.dupPositions(docs, "doc_id",
        "text", minLen = 5)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val corpus = emb.filter(col("vec_id") % 17 =!= 0)
    val annTruth = corpus.select(col("vec_id"), col("label").as("cell"))
      .unionByName(graft.similarity.Similarity.assignToCells(
        emb.filter(col("vec_id") % 17 === 0), corpus,
        corpus.select(col("vec_id"), col("label").as("cell"))))
      .as[(Long, Int)].collect().toMap
    val expected = saTruth.map { case (id, (np, nd)) =>
      (id, ccTruth.getOrElse(id, id), np, nd, annTruth(id)) }.toSet
    assert(sliced === expected)
    assert(sliced.size === n)
    // the consistency claim only bites if arrivals actually exercise
    // each index: a cross-split CC cluster, an arrival-side dup, and
    // at least one arrival assigned to some corpus-trained cell
    assert(expected.exists { case (id, comp, _, _, _) =>
      id % 17 == 0 && comp != id },
      "fixture must cluster an arrival with the corpus")
    assert(expected.exists { case (id, _, _, nd, _) =>
      id % 17 == 0 && nd > 0 },
      "fixture must contain an arrival-side duplicated doc")
    assert(expected.exists { case (id, _, _, _, _) => id % 17 == 0 })
    // the store keeps the single-stream layouts: every at-rest
    // consumer of the singles reads a trio store unchanged
    Seq("cc/sets", "cc/buckets", "sa/gram_positions", "sa/gram_stats",
      "ann/assignment", "ann/centroids", "ann/assignment_delta")
      .foreach(sub => assert(new java.io.File(s"$store/$sub").exists(),
        s"missing trio store artifact $sub"))
    // LIFECYCLE INTEGRATION: the trio's ann/ store is a first-class
    // rebuild input — retrain folds the stream's delta log into a
    // fresh snapshot whose assignment covers corpus ∪ arrivals, and
    // consumers of the swapped snapshot see the retrained centroids
    val allVecs = emb.select(col("vec_id"), col("embedding"))
    val (rebuilt, meanD2, _) = graft.similarity.Similarity
      .rebuildIvfStore(allVecs, s"$store/ann", maxMeanD2 = 0.0)
    assert(rebuilt && meanD2 > 0)
    assert(!new java.io.File(s"$store/ann/assignment_delta").exists(),
      "rebuild must retire the trio stream's delta log")
    val swapped = spark.read.parquet(s"$store/ann/assignment")
    assert(swapped.count() === n,
      "swapped snapshot must cover corpus + streamed arrivals")
    val expectedAfter = graft.similarity.Similarity.assignToStoredCells(
        allVecs, spark.read.parquet(s"$store/ann/centroids"))
      .as[(Long, Int)].collect().toSet
    assert(swapped.as[(Long, Int)].collect().toSet === expectedAfter,
      "swapped assignment must be the argmin against the swapped " +
        "centroids — what any stream consumer restores from")
  }

  test("sa maintain stream: 3 sliced batches converge to from-scratch " +
    "dup report") {
    // the growing gram log makes cross-batch duplicates discoverable,
    // so the final report must equal dupPositions over the WHOLE
    // corpus regardless of slicing — and must survive forced
    // compaction (maxStoreFiles = 2 over 3 batches fires it)
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_sam_slices").toString
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_sam_st_$i").toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/docs_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_sam_sl").toString
    val store = Files.createTempDirectory("graft_sam_store").toString
    val sliced = Streams.saMaintainStream(spark, tmp, ckpt, store,
        minLen = 5, glob = "*.parquet", maxStoreFiles = 2)
      .as[(Long, Long, Long)].collect().toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scratch = graft.text.SuffixArray.dupPositions(docs, "doc_id",
        "text", minLen = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(sliced === scratch)
    // the property only bites if some duplicate straddles the
    // corpus/arrival split
    assert(scratch.exists { case (id, _, nd) => id % 17 == 0 && nd > 0 },
      "fixture must contain an arrival-side duplicated doc")
    // forced compaction kept the growing stores bounded
    def nParts(sub: String): Int = new java.io.File(s"$store/$sub")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nParts("gram_positions") <= 3,
      s"membership log fragmented: ${nParts("gram_positions")}")
    assert(nParts("gram_stats") <= 3,
      s"stats log fragmented: ${nParts("gram_stats")}")
  }

  test("cc maintain stream: store stays compacted + metrics per batch") {
    // the state-tiering contract: the index grows by append per batch
    // (inherent — dedup against all history), but the store must not
    // fragment without bound. 6 batches with maxStoreFiles=2 force
    // compaction to fire repeatedly; labels must STILL equal the
    // from-scratch CC (compaction only rewrites files, never data).
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_ccm_cpt").toString
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 6 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_ccm_cst_$i").toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/docs_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_ccm_cpt").toString
    val store = Files.createTempDirectory("graft_ccm_cpt_store").toString
    val got = Streams.ccMaintainStream(spark, tmp, ckpt, store,
        numPerms = 8, numBands = 4, threshold = 0.8, glob = "*.parquet",
        maxStoreFiles = 2)
      .as[(Long, Long, Boolean)].collect().toSet
    val scratch = graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.minhashLshPairs(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id",
          "text", numPerms = 8, numBands = 4, threshold = 0.8),
        "doc_a", "doc_b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === scratch)
    // bounded store: compaction keeps each index dir at or under the
    // cap plus one compaction width — never one file pair per batch
    def nParts(sub: String): Int = new java.io.File(s"$store/$sub")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nParts("sets") <= 3, s"sets fragmented: ${nParts("sets")}")
    assert(nParts("buckets") <= 3,
      s"buckets fragmented: ${nParts("buckets")}")
    assert(nParts("metrics") <= 3,
      s"metrics table fragmented: ${nParts("metrics")}")
    // one metrics row per arrival batch, counts monotone-ish sane
    val metrics = spark.read.parquet(s"$store/metrics")
    val mRows = metrics
      .select("batch_id", "n_probe_pairs", "n_buckets_files")
      .as[(Long, Long, Long)].collect()
    assert(mRows.length >= chunks.length - 1,
      s"metrics rows: ${mRows.length} for ${chunks.length} slices")
    assert(mRows.forall(_._3 <= 3), "metrics recorded a fragmented store")
  }

  test("ohlc update mode: same bars as complete mode, state evicted") {
    val dir = "/root/testdata/sf0.001"
    // complete-mode reference
    val ckptC = Files.createTempDirectory("graft_ckpt_oc").toString
    val complete = Streams.ohlcStream(spark, dir, ckptC,
        valueExpr = (col("value").cast("decimal(18,2)") * 100)
          .cast("long"))
      .collect().toSet
    // update-mode + snapshot-chain upsert
    val ckptU = Files.createTempDirectory("graft_ckpt_ou").toString
    val tbl = Files.createTempDirectory("graft_ohlc_tbl_t").toString
    val update = Streams.ohlcStreamUpdate(spark, dir, ckptU, tbl,
        valueExpr = (col("value").cast("decimal(18,2)") * 100)
          .cast("long"))
      .select("event_type", "bar_start", "open", "high", "low",
        "close", "n_ticks", "volume")
      .collect().toSet
    assert(update === complete)
  }

  test("ohlc update mode evicts closed bars from state across batches") {
    // 4 time-ordered files spanning distinct days: with
    // maxFilesPerTrigger=1 the watermark advances per batch, so bars
    // more than 1 day behind the max seen event time age OUT of the
    // state store — final state must hold fewer rows than total bars
    val tmp = Files.createTempDirectory("graft_ohlc_days").toString
    val days = 8
    (0 until 4).foreach { i =>
      val staging = Files.createTempDirectory(s"graft_ohlc_st_$i").toString
      spark.range(i * 20, i * 20 + 20)
        .select(col("id").as("event_id"),
          (col("id") % 3).as("user_id"),
          // type decorrelated from the day (id DIV 2, not id % 2 —
          // correlated keys would collapse the bar grid)
          expr("concat('t', CAST((id DIV 2) % 2 AS STRING))")
            .as("event_type"),
          // 2 distinct days per file, monotone across files
          timestamp_seconds(lit(1704067200L) +
            (col("id") % 2 + lit(i * 2)) * 86400 + col("id")).as("ts"),
          (col("id") * 1.5).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/ev_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_oev").toString
    val tbl = Files.createTempDirectory("graft_ohlc_tbl_ev").toString
    val (table, stateRows) = Streams.ohlcStreamUpdateStats(spark, tmp,
      ckpt, tbl, glob = "*.parquet")
    val totalBars = table.count()
    // all 8 days × 2 types of bars reached the table ...
    assert(totalBars === days * 2L)
    // ... but the state store holds only the un-evicted tail
    assert(stateRows > 0L && stateRows < totalBars,
      s"state $stateRows vs bars $totalBars — eviction did not happen")
  }

  test("foreachBatch upsert across 3 micro-batches equals the batch table") {
    // 3 time-ordered slices → 3 foreachBatch merges into the versioned
    // table; the final snapshot must equal the batch latest-per-user
    // result, proving the stream → CDC-upsert loop end to end
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_cdc_slices").toString
    val raw = spark.read.parquet(s"$dir/events.parquet").orderBy("ts")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_cdc_stage_$i").toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/ev_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_up_spec").toString
    val tbl = Files.createTempDirectory("graft_cdc_tbl_spec").toString
    // the upsert keeps the file's raw ts; compare as epoch micros so
    // the assertion is independent of the file's timestamp encoding
    val tsUs = unix_micros(col("ts").cast("timestamp")).as("ts_us")
    val got = Streams.upsertStreamToTable(spark, tmp, ckpt, tbl,
      keys = Seq("user_id"), versionCol = "ts", glob = "*.parquet")
      .select(col("user_id"), tsUs, col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc)
    val want = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), tsUs, col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === want)
    // superseded snapshots are retired: exactly one version remains
    val versions = new java.io.File(tbl).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v_"))
    assert(versions.length === 1)

    // crash-replay: delete the LAST commit marker so the restart
    // redelivers the final batch with the same batchId while its
    // v_<id> snapshot already exists — the replay must neither read
    // the dir it overwrites nor delete the fresh snapshot
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete())
    // the local FS keeps a .crc sibling per file; a stale one would
    // fail the re-commit's rename (a local-FS test artifact — HDFS/
    // object stores have no such sibling)
    val crc = new java.io.File(s"$ckpt/commits",
      s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    // fresh session: the original session's StreamingQueryManager still
    // holds this checkpoint's registration (a real crash-restart is a
    // new driver process)
    val replayed = Streams.upsertStreamToTable(spark.newSession(), tmp,
      ckpt, tbl, keys = Seq("user_id"), versionCol = "ts",
      glob = "*.parquet")
      .select(col("user_id"), tsUs, col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(replayed === want, "crash-replay must reproduce the table")
    val versionsAfter = new java.io.File(tbl).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v_"))
    assert(versionsAfter.length === 1)
  }

  private def batchIntervalJoin(dir: String) = {
    // Tables.events already converts nanos-as-long ts to timestamp
    val ev = Tables.events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("left_id"), col("user_id"),
        col("ts").as("left_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("right_id"),
        col("user_id").as("r_user_id"), col("ts").as("right_ts"),
        col("value"))
    c.join(p, col("user_id") === col("r_user_id") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr("interval 6 hours"))
      .select(col("left_id"), col("right_id"), col("user_id"),
        expr("unix_micros(left_ts)").as("left_us"),
        expr("unix_micros(right_ts)").as("right_us"), col("value"))
  }

  test("stream-stream interval join equals the batch interval join") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_sj_spec").toString
    val streamed = Streams
      .intervalJoinStreams(spark, dir, ckpt, "click", "purchase", 6)
      .collect()
    val batch = batchIntervalJoin(dir).collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSet === batch.toSet)
  }

  test("left-outer stream-stream join equals the batch left join") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_sjo_spec").toString
    val streamed = Streams
      .intervalJoinStreamsOuter(spark, dir, ckpt, "click", "purchase", 6)
      .collect()
    // batch twin: same sides/condition as batchIntervalJoin, leftOuter
    val ev = graft.Tables.events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("left_id"), col("user_id"),
        col("ts").as("left_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("right_id"),
        col("user_id").as("r_user_id"), col("ts").as("right_ts"),
        col("value"))
    val batch = c.join(p, col("user_id") === col("r_user_id") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr("interval 6 hours"),
        "leftOuter")
      .select(col("left_id"), col("right_id"), col("user_id"),
        expr("unix_micros(left_ts)").as("left_us"),
        expr("unix_micros(right_ts)").as("right_us"), col("value"))
      .collect()
    assert(streamed.toSet === batch.toSet)
    // the outer rows are really there: unmatched clicks null-padded,
    // including clicks inside the final watermark+window horizon
    assert(streamed.count(_.isNullAt(1)) > 0)
    assert(streamed.length > streamed.count(!_.isNullAt(1)))
  }

  test("full-outer stream-stream join equals the batch full join") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_sjf_spec").toString
    val streamed = Streams
      .intervalJoinStreamsOuter(spark, dir, ckpt, "click", "purchase", 6,
        joinType = "fullOuter")
      .collect()
    val ev = graft.Tables.events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("left_id"), col("user_id"),
        col("ts").as("left_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("right_id"),
        col("user_id").as("r_user_id"), col("ts").as("right_ts"),
        col("value"))
    val batch = c.join(p, col("user_id") === col("r_user_id") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr("interval 6 hours"),
        "fullOuter")
      .select(col("left_id"), col("right_id"), col("user_id"),
        expr("unix_micros(left_ts)").as("left_us"),
        expr("unix_micros(right_ts)").as("right_us"), col("value"))
      .collect()
    assert(streamed.toSet === batch.toSet)
    // both null-padded populations are present: clicks without a
    // purchase AND purchases without a click
    assert(streamed.count(_.isNullAt(1)) > 0)
    assert(streamed.count(_.isNullAt(0)) > 0)
  }

  test("stream-stream join across 3 micro-batches buffers state correctly") {
    // time-ordered slices: a click in batch i can only match a purchase
    // in batch i or i+1, so the join's left-side state must survive the
    // batch boundary — the property a single file never exercises
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_sj_slices").toString
    val raw = spark.read.parquet(s"$dir/events.parquet").orderBy("ts")
    val n = raw.count()
    val chunks = raw.collect().grouped((n / 3 + 1).toInt).toSeq
    val schema = raw.schema
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val staging = Files.createTempDirectory(s"graft_sj_stage_$i").toString
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/ev_$i.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_sj_sl").toString
    val sliced = Streams.intervalJoinStreams(spark, tmp, ckpt,
      "click", "purchase", 6, glob = "*.parquet").collect()
    val batch = batchIntervalJoin(dir).collect()
    assert(sliced.toSet === batch.toSet)
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

  test("streaming top-k heavy hitters equals the batch rank") {
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("graft_ckpt_topk_spec").toString
    val streamed = Streams.topKStream(spark, dir, ckpt, k = 3)
      .select(to_date(col("day")).as("day"), col("event_type"),
        col("user_id"), col("cnt"))
      .collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day"), col("event_type"))
      .orderBy(col("cnt").desc, col("user_id"))
    val batch = Tables.events(spark, dir)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
        col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect()
    assert(streamed.length === batch.length)
    assert(streamed.toSet === batch.toSet)
  }
}
