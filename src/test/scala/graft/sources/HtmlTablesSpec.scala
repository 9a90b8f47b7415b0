package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S1/P6 literal semantics: markup → rows, 2-level header flatten,
  * colspan alignment, entity handling — against hand-checked fixtures
  * (the reference's pd.read_html cases transcribed). */
class HtmlTablesSpec extends SparkSpec {
  import spark.implicits._

  private val messyPage =
    """<html><body>
      |<p>preamble &amp; noise <table-like>not a table</p>
      |<TABLE class="stats" id="t0">
      |  <thead>
      |    <tr><th colspan="2">Team</th><th>W</th></tr>
      |    <tr><th>City</th><th>Name</th><th>2024</th></tr>
      |  </thead>
      |  <tbody>
      |    <tr><td> Boston </td><td><a href="/bos">Celtics &amp; Co</a></td><td>64</td></tr>
      |    <tr class="alt"><td>L.A.</td>
      |        <td><b>Lakers</b> <i>(west)</i></td><td>47</td></tr>
      |  </tbody>
      |</TABLE>
      |<table><tr><td>solo</td></tr></table>
      |</body></html>""".stripMargin

  test("table: 2-level colspan header flattens, tags strip, entities decode") {
    val pages = Seq((1L, messyPage)).toDF("page", "html")
    val got = HtmlTables.table(pages, "page", "html", headerRows = 2)
      .orderBy("table_idx", "row_idx", "col_idx")
      .as[(Long, Int, Int, Int, String, String)].collect().toSeq
    val t0 = Seq(
      (1L, 0, 0, 0, "Team_City", "Boston"),
      (1L, 0, 0, 1, "Team_Name", "Celtics & Co"),
      (1L, 0, 0, 2, "W_2024", "64"),
      (1L, 0, 1, 0, "Team_City", "L.A."),
      (1L, 0, 1, 1, "Team_Name", "Lakers (west)"),
      (1L, 0, 1, 2, "W_2024", "47"))
    assert(got.filter(_._2 == 0) === t0)
    // second table has no header rows left after headerRows=2 eats its
    // only row — zero data rows, present in tableRows but not here
    assert(got.filter(_._2 == 1).isEmpty)
  }

  test("tableRows: raw structural form, second table intact") {
    val pages = Seq((1L, messyPage)).toDF("page", "html")
    val got = HtmlTables.tableRows(pages, "page", "html")
      .orderBy("table_idx", "row_idx")
      .as[(Long, Int, Int, Seq[String])].collect().toSeq
    assert(got.size === 5)
    // colspan expands the group header to align with the field header
    assert(got.head._4 === Seq("Team", "Team", "W"))
    assert(got.last === ((1L, 1, 0, Seq("solo"))))
  }

  test("headerless mode names columns c0..cN") {
    val pages = Seq((1L, "<table><tr><td>a</td><td>b</td></tr></table>"))
      .toDF("page", "html")
    val got = HtmlTables.table(pages, "page", "html", headerRows = 0)
      .orderBy("col_idx")
      .select("col_name", "value").as[(String, String)].collect().toSeq
    assert(got === Seq(("c0", "a"), ("c1", "b")))
  }

  test("escape/unescape round-trips hostile strings") {
    val hostile = Seq("a&b", "<tr>", "x\"y'z", "already &amp; escaped",
      "plain")
    val df = hostile.toDF("s")
      .select(col("s"),
        HtmlTables.unescapeEntities(HtmlTables.escapeEntities(col("s")))
          .as("rt"))
    assert(df.filter(col("s") =!= col("rt")).count() === 0)
  }

  test("render → parse → pivot round-trips a typed table") {
    val src = Seq((0L, 1L, "ALGERIA"), (0L, 2L, "ARG & CO"),
      (1L, 3L, "BRAZIL<tag>")).toDF("page", "k", "name")
    val pages = src
      .select(col("page"), struct(col("k"), col("name")).as("r"))
      .groupBy("page").agg(array_sort(collect_list(col("r"))).as("rs"))
      .select(col("page"),
        HtmlTables.renderPage(Seq(
          Seq("grp" -> 2, "geo" -> 1),
          Seq("key" -> 1, "name" -> 1, "region" -> 1)))(
          transform(col("rs"), r => array(
            r.getField("k").cast("string"), r.getField("name"),
            col("page").cast("string")))).as("html"))
    val got = HtmlTables.pivot(
        HtmlTables.table(pages, "page", "html", headerRows = 2),
        Seq("grp_key", "grp_name", "geo_region"))
      .select(col("geo_region").cast("long").as("page"),
        col("grp_key").cast("long").as("k"), col("grp_name").as("name"))
    assert(got.as[(Long, Long, String)].collect().toSet ===
      src.as[(Long, Long, String)].collect().toSet)
  }

  test("parse is scan-local: no shuffle in the physical plan") {
    val pages = Seq((1L, messyPage)).toDF("page", "html")
    val plan = HtmlTables.table(pages, "page", "html", headerRows = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }
}
