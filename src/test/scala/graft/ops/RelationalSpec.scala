package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin ≡ plain inner join (one hot key)") {
    // 10k fact rows, 90% on one hot key — the salting target
    val fact = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(lit(42L)).as("k"), col("id").as("payload"))
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

    val plain = fact.join(dim, "k")
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted
    val salted = relational.saltedJoin(fact, dim, "k", numSalts = 8)
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted
    assert(salted === plain)
  }

  test("unionAll aligns by name and fills missing with null") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, 3.5)).toDF("id", "score")
    val u = relational.unionAll(Seq(a, b))
    assert(u.columns.toSet === Set("id", "name", "score"))
    assert(u.count() === 2)
    assert(u.filter(col("score").isNull && col("id") === 1).count() === 1)
  }

  test("P6: duplicate flattened header names disambiguate positionally") {
    // the reference flattens a 2-level header into duplicate names, then
    // renames positionally: G,W,G,W -> G_reg,W_reg,G_playoff,W_playoff
    val flat = Seq((82, 60, 16, 12)).toDF("G", "W", "G", "W")
    val fixed = relational.renameAll(flat,
      Seq("G_reg", "W_reg", "G_playoff", "W_playoff"))
    assert(fixed.columns.toSeq ===
      Seq("G_reg", "W_reg", "G_playoff", "W_playoff"))
    assert(fixed.select("G_playoff").as[Int].head() === 16)
  }

  test("A3: lastRow probes the team-totals row without a global sort") {
    val df = Seq((1, "M. Jordan", "40:00"), (2, "S. Pippen", "38:00"),
      (3, "Team Totals", "240:00")).toDF("seq", "player", "mp")
    val last = relational.lastRow(df, col("seq"))
    assert(last.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    assert(last.select("player", "mp").as[(String, String)].head() ===
      (("Team Totals", "240:00")))
  }

  test("upsertLatest: updates supersede base rows, new keys insert") {
    val base = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1))
      .toDF("k", "v", "version")
    val updates = Seq((2L, "B", 2), (4L, "d", 2)).toDF("k", "v", "version")
    val got = relational.upsertLatest(base, updates, Seq("k"), "version")
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("topK plans as TakeOrderedAndProject (no global sort)") {
    val df = relational.topK(
      spark.range(1000).select(col("id"), (col("id") % 13).as("v")),
      5, col("v").desc, col("id").asc)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    assert(df.count() === 5)
  }

  test("incrementalAgg: merged summary ≡ recompute, schema stable") {
    val rows = (0L until 1000L).map(i => (s"k${i % 7}", i))
      .toDF("k", "v")
    def summary(df: org.apache.spark.sql.DataFrame) = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("s"))
    val base = summary(rows.filter(col("v") % 3 =!= 0))
    val delta = summary(rows.filter(col("v") % 3 === 0))
    val merged = relational.incrementalAgg(base, delta, Seq("k"))
    // stable = same names and TYPES (sum() relaxes count()'s
    // non-nullability — irrelevant to a maintained table's schema)
    assert(merged.schema.map(f => (f.name, f.dataType)) ===
      base.schema.map(f => (f.name, f.dataType)),
      "summary schema must be stable")
    val expect = summary(rows).collect().map(r => r.getString(0) -> r).toMap
    merged.collect().foreach { r =>
      val e = expect(r.getString(0))
      assert(r.getLong(1) === e.getLong(1))
      assert(r.getDecimal(2) === e.getDecimal(2))
    }
    // idempotent shape: merging an empty delta changes nothing
    val again = relational.incrementalAgg(merged, merged.limit(0), Seq("k"))
    assert(again.collect().toSet === merged.collect().toSet)
    // associative: ((a ⊎ b) ⊎ c) ≡ (a ⊎ (b ⊎ c)) — the property that
    // lets a maintained rollup absorb deltas in any batch grouping
    val s1 = summary(rows.filter(col("v") % 3 === 1))
    val s2 = summary(rows.filter(col("v") % 3 === 2))
    val s0 = summary(rows.filter(col("v") % 3 === 0))
    val left = relational.incrementalAgg(
      relational.incrementalAgg(s0, s1, Seq("k")), s2, Seq("k"))
    val right = relational.incrementalAgg(s0,
      relational.incrementalAgg(s1, s2, Seq("k")), Seq("k"))
    assert(left.collect().toSet === right.collect().toSet)
  }

  test("datasetFingerprint: layout-independent, change-sensitive") {
    val rows = (0L until 5000L).map(i => (i, s"v$i")).toDF("id", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      relational.datasetFingerprint(df, Seq("id", "v"))
        .as[(Long, String)].head()
    val base = fp(rows)
    assert(base._1 === 5000L)
    // any partitioning / ordering gives the identical stamp
    assert(fp(rows.repartition(17)) === base)
    assert(fp(rows.orderBy(col("v").desc)) === base)
    // one changed row moves it; a dropped row moves it
    val changed = rows.withColumn("v",
      when(col("id") === 4321L, lit("X")).otherwise(col("v")))
    assert(fp(changed)._2 !== base._2)
    assert(fp(rows.filter(col("id") =!= 0L))._2 !== base._2)
  }

  test("datasetFingerprint distinguishes WHICH column is null") {
    // concat_ws alone would hash (a,NULL,b) and (a,b,NULL) identically;
    // the NUL sentinel must keep them apart, and null vs empty-string
    // must differ too
    def fp(rows: Seq[(String, String, String)]) =
      relational.datasetFingerprint(
        rows.toDF("a", "b", "c"), Seq("a", "b", "c"))
        .as[(Long, String)].head()._2
    assert(fp(Seq(("a", null, "b"))) !== fp(Seq(("a", "b", null))))
    assert(fp(Seq(("a", null, "b"))) !== fp(Seq(("a", "", "b"))))
  }

  test("incrementalAgg fails loudly when a merged measure overflows") {
    // decimal(3,0) summaries: 600 + 600 = 1200 does not fit back. Under
    // ANSI (the session default) the narrowing cast itself throws; under
    // non-ANSI the cast yields null and the raise_error guard fires —
    // either way the merge must NEVER silently null the cell
    val base = Seq(("k1", BigDecimal(600))).toDF("k", "s")
      .select(col("k"), col("s").cast("decimal(3,0)").as("s"))
    val delta = Seq(("k1", BigDecimal(600))).toDF("k", "s")
      .select(col("k"), col("s").cast("decimal(3,0)").as("s"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    val ex = intercept[Exception] {
      relational.incrementalAgg(base, delta, Seq("k")).collect()
    }
    assert(msgs(ex).exists(m => m != null &&
      (m.contains("overflows") || m.contains("cannot be represented"))),
      s"expected a loud overflow failure, got: $ex")
    // and the guard path itself, with ANSI off
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ex2 = intercept[Exception] {
        relational.incrementalAgg(base, delta, Seq("k")).collect()
      }
      assert(msgs(ex2).exists(m => m != null && m.contains("overflows")),
        s"expected the raise_error guard, got: $ex2")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("HLL sketches: union of per-part sketches ≈ exact distinct") {
    val rows = spark.range(50000).select((col("id") % 9973).as("u"),
      (col("id") % 4).as("part"))
    val parts = rows.groupBy("part")
      .agg(expr("hll_sketch_agg(u)").as("sk"))
    val est = parts.agg(expr("hll_sketch_estimate(hll_union_agg(sk))")
      .as("est")).head().getLong(0)
    assert(math.abs(est - 9973.0) / 9973.0 < 0.05,
      s"HLL estimate $est vs exact 9973")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; " +
    "null transitions are changes") {
    val prev = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]),
      (4L, Some("d"))).toDF("k", "v")
    val next = Seq((1L, Some("a")), (2L, Some("B")), (3L, Some("c")),
      (5L, Some("e"))).toDF("k", "v")
    val got = relational.snapshotDiff(prev, next, Seq("k"), Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("kAnonymity masks quasi-identifier groups below k") {
    val df = Seq(
      // group (10, "A"): 3 rows — survives k=3
      (1L, 10, "A"), (2L, 10, "A"), (3L, 10, "A"),
      // group (10, "B"): 2 rows — suppressed at k=3
      (4L, 10, "B"), (5L, 10, "B"),
      // group (20, "A"): 1 row — suppressed
      (6L, 20, "A")).toDF("id", "zip", "seg")
    val got = relational.kAnonymity(df, Seq("zip", "seg"), 3)
      .select("id", "zip", "seg", "suppressed", "grp_n")
      .as[(Long, String, String, Boolean, Long)].collect()
      .sortBy(_._1)
    assert(got.take(3).forall(r => r._2 == "10" && r._3 == "A" &&
      !r._4 && r._5 == 3L))
    assert(got.drop(3).forall(r => r._2 == "*" && r._3 == "*" && r._4))
    // non-quasi payload survives untouched, all rows kept
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("kAnonymity groups null quasi values together") {
    val df = Seq((1L, Option.empty[Int]), (2L, None), (3L, None),
      (4L, Some(7))).toDF("id", "zip")
    val got = relational.kAnonymity(df, Seq("zip"), 3)
      .select("id", "suppressed", "grp_n")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1)
    // the three null-zip rows form one group of 3 (not suppressed);
    // the lone zip=7 row is
    assert(got.map(r => (r._2, r._3)).toSeq ===
      Seq((false, 3L), (false, 3L), (false, 3L), (true, 1L)))
  }

  test("lDiversity masks homogeneous sensitive groups") {
    val df = Seq(
      // zip 10: three members, two distinct diagnoses — passes l=2
      (1L, 10, "flu"), (2L, 10, "flu"), (3L, 10, "cold"),
      // zip 20: k-anonymous at k=2 but HOMOGENEOUS — fails l=2
      (4L, 20, "hiv"), (5L, 20, "hiv")).toDF("id", "zip", "diag")
    val got = relational.lDiversity(df, Seq("zip"), "diag", 2)
      .select("id", "zip", "diag", "at_risk", "sens_diversity")
      .as[(Long, Int, String, Boolean, Long)].collect().sortBy(_._1)
    assert(got.take(3).forall(r => !r._4 && r._5 == 2L))
    assert(got.take(3).map(_._3).toSeq === Seq("flu", "flu", "cold"))
    // the leaking group: sensitive masked, quasi column left visible
    assert(got.drop(3).forall(r =>
      r._2 == 20 && r._3 == "*" && r._4 && r._5 == 1L))
  }

  test("lDiversity counts a null sensitive value as one value") {
    val df = Seq((1L, 10, Option("a")), (2L, 10, None), (3L, 10, None))
      .toDF("id", "zip", "diag")
    val got = relational.lDiversity(df, Seq("zip"), "diag", 2)
      .select("sens_diversity").as[Long].collect()
    assert(got.toSeq === Seq(2L, 2L, 2L))
  }

  test("tCloseness matches the hand-computed variational distance") {
    // global mix: a 4/8, b 3/8, c 1/8 → qm = 500000, 375000, 125000
    val rows = Seq(
      (10, "a"), (10, "a"), (10, "a"), (10, "b"),          // skewed grp
      (20, "a"), (20, "b"), (20, "b"), (20, "c"))          // balanced
    val df = rows.toDF("zip", "seg")
    val got = relational.tCloseness(df, Seq("zip"), "seg",
        tMicro = 200000L)
      .orderBy("zip")
      .select("zip", "n_group", "t_micro", "releasable")
      .as[(Int, Long, Long, Boolean)].collect().toSeq
    // grp 10: p = (750000, 250000, 0); Σ|p−q| = 250000+125000+125000
    //   → t = 250000 (not releasable at 0.2)
    // grp 20: p = (250000, 500000, 250000); Σ = 250000+125000+125000
    //   → t = 250000 — same distance, symmetric check
    assert(got === Seq((10, 4L, 250000L, false),
      (20, 4L, 250000L, false)))
  }

  test("tCloseness: identical-mix groups score zero and release") {
    val rows = for (z <- Seq(1, 2); s <- Seq("a", "a", "b"))
      yield (z, s)
    val got = relational.tCloseness(rows.toDF("zip", "seg"),
        Seq("zip"), "seg", tMicro = 0L)
      .select("t_micro", "releasable")
      .as[(Long, Boolean)].collect().toSeq
    assert(got === Seq((0L, true), (0L, true)))
  }
}
