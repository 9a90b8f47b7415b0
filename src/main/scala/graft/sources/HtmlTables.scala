package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML `<table>` markup → typed rows — SURVEY §2.1 S1's literal
  * semantics (reference `pd.io.html.read_html`: `playerInfo.py:8`,
  * `coaches.py:49`, `games.py:23`, `boxScores.py:43`) and §2.2 P6's
  * multi-level header flatten (`coaches.py:50-53`, `boxScores.py:47-51`).
  *
  * Everything here is codegen'd scalar expressions over the page string
  * (`regexp_extract_all` + higher-order array functions + `posexplode`):
  * each page parses independently inside its scan task, so a staged
  * corpus of 10⁹ pages fans out with ZERO shuffle — the parse is free
  * parallelism, unlike the reference's driver-side pandas loop. Typing
  * stays downstream (the F4 null-after-cast idiom) exactly where the
  * reference runs `astype` after `read_html`.
  *
  * Parse dialect (the subset the reference's pages exercise):
  *  - `<table>…</table>`, `<tr>…</tr>`, `<td>/<th>` cells, any casing,
  *    attributes allowed, whitespace/newlines anywhere (`(?s)` dotall);
  *  - nested inline tags inside a cell are stripped (`<a>`, `<b>`, …);
  *  - `colspan="n"` repeats the cell value n times — that is how a
  *    2-level header like coaches' (group row over field row) aligns
  *    column-wise before flattening;
  *  - the 5 named entities pandas' parser resolves in practice
  *    (`&amp; &lt; &gt; &quot; &#39; &nbsp;`) are unescaped, `&amp;`
  *    LAST so double-escaped text survives;
  *  - cell whitespace is collapsed and trimmed.
  *
  * Not a general HTML5 parser (no unclosed-tag recovery, no nested
  * tables — the outer table's extract stops at the FIRST `</table>`);
  * the reference's sources are machine-generated stat tables where this
  * dialect is exact.
  */
object HtmlTables {

  /** Resolve the entity subset above; `&amp;` last. */
  def unescapeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** Escape for rendering (inverse of [[unescapeEntities]], `&` first). */
  def escapeEntities(c: Column): Column = {
    val steps = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
      "\"" -> "&quot;", "'" -> "&#39;")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  private val tablePat = "(?si)<table[^>]*>(.*?)</table>"
  private val rowPat = "(?si)<tr[^>]*>(.*?)</tr>"
  // full cell tag (group 0): the attrs and the content are re-extracted
  // per cell because regexp_extract_all returns a single group
  private val cellPat = "(?si)<t[dh][^>]*>.*?</t[dh]>"

  /** One cell tag string → its colspan-expanded text values. */
  private def cellValues(tag: Column): Column = {
    val raw = regexp_extract(tag, "(?si)<t[dh][^>]*>(.*)</t[dh]>", 1)
    val text = unescapeEntities(
      trim(regexp_replace(regexp_replace(raw, "<[^>]*>", " "),
        "\\s+", " ")))
    val span = coalesce(
      nullif(regexp_extract(tag, "(?i)colspan\\s*=\\s*[\"']?([0-9]+)", 1),
        lit("")).cast("int"),
      lit(1))
    array_repeat(text, span)
  }

  /** Row html → array of cell texts (colspan expanded). */
  private def rowCells(rowHtml: Column): Column =
    flatten(transform(
      regexp_extract_all(rowHtml, lit(cellPat), lit(0)),
      cellValues(_)))

  /** Every table's every row, structurally: one output row per
    * `<tr>`, cells as an array — the raw form when the caller wants
    * custom header handling.
    *
    * @return (page, table_idx, row_idx, cells array<string>) — indexes
    *         0-based in document order
    */
  def tableRows(pages: DataFrame, pageCol: String,
                htmlCol: String): DataFrame =
    pages
      .select(col(pageCol).as("page"),
        posexplode(regexp_extract_all(col(htmlCol), lit(tablePat),
          lit(1))))
      .withColumnsRenamed(Map("pos" -> "table_idx", "col" -> "tbl"))
      .select(col("page"), col("table_idx"),
        posexplode(regexp_extract_all(col("tbl"), lit(rowPat), lit(1))))
      .withColumnsRenamed(Map("pos" -> "row_idx", "col" -> "row_html"))
      .select(col("page"), col("table_idx"), col("row_idx"),
        rowCells(col("row_html")).as("cells"))

  /** The `read_html` analog: parse every `<table>` on every page into
    * LONG-FORM typed-ready rows, flattening the first `headerRows`
    * `<tr>`s into column names level-joined with `_` (the pandas
    * MultiIndex flatten the reference applies at `coaches.py:50-53`).
    * Long form because Spark schemas are static while pages' column
    * sets aren't; [[pivot]] reshapes to fixed columns when the caller
    * knows them.
    *
    * Header/data alignment, colspan expansion, name flattening and the
    * data fan-out all happen inside ONE projection over the page string
    * — no join between a header frame and a data frame, so the operator
    * stays shuffle-free at any page count.
    *
    * @param headerRows number of leading `<tr>`s forming the (possibly
    *   multi-level) header; 0 = headerless, names are `c0, c1, …`
    * @return (page, table_idx, row_idx, col_idx, col_name, value) —
    *         row_idx 0-based over DATA rows only
    */
  def table(pages: DataFrame, pageCol: String, htmlCol: String,
            headerRows: Int): DataFrame = {
    require(headerRows >= 0, s"headerRows must be >= 0: $headerRows")
    val rows = pages
      .select(col(pageCol).as("page"),
        posexplode(regexp_extract_all(col(htmlCol), lit(tablePat),
          lit(1))))
      .withColumnsRenamed(Map("pos" -> "table_idx", "col" -> "tbl"))
      .withColumn("rows",
        transform(regexp_extract_all(col("tbl"), lit(rowPat), lit(1)),
          rowCells(_)))
    val hdr = slice(col("rows"), 1, headerRows)
    val nCols = greatest(coalesce(
      array_max(transform(col("rows"), size(_))), lit(0)), lit(0))
    // column i's name: its cell in each header level, joined with "_";
    // a level shorter than the widest row contributes nothing for the
    // missing tail (ragged headers)
    val names =
      if (headerRows == 0)
        transform(sequence(lit(0), nCols - 1),
          i => concat(lit("c"), i.cast("string")))
      else
        transform(sequence(lit(0), nCols - 1), i =>
          array_join(filter(transform(hdr,
            lvl => element_at(lvl, i + 1)), _.isNotNull), "_"))
    rows
      .withColumn("names", names)
      .withColumn("data", slice(col("rows"), lit(headerRows + 1),
        greatest(size(col("rows")) - headerRows, lit(0))))
      .select(col("page"), col("table_idx"), col("names"),
        posexplode(col("data")))
      .withColumnsRenamed(Map("pos" -> "row_idx", "col" -> "cells"))
      .select(col("page"), col("table_idx"), col("row_idx"),
        col("names"), posexplode(col("cells")))
      .withColumnsRenamed(Map("pos" -> "col_idx", "col" -> "value"))
      .select(col("page"), col("table_idx"), col("row_idx"),
        col("col_idx"),
        element_at(col("names"), col("col_idx") + 1).as("col_name"),
        col("value"))
  }

  /** Reshape [[table]]'s long form back to fixed columns: one row per
    * (page, table_idx, row_idx), one column per requested name. A plain
    * conditional aggregation (never Spark's `pivot`, whose distinct-
    * values job scans the input twice), map-side combined, output
    * bounded by the data row count. */
  def pivot(long: DataFrame, colNames: Seq[String]): DataFrame = {
    require(colNames.nonEmpty, "colNames must be non-empty")
    long.groupBy(col("page"), col("table_idx"), col("row_idx"))
      .agg(
        max(when(col("col_name") === colNames.head, col("value")))
          .as(colNames.head),
        colNames.tail.map(n =>
          max(when(col("col_name") === n, col("value"))).as(n)): _*)
  }

  /** Fixture/sink helper: render (page, sorted rows of cell arrays)
    * into `<table>` markup with the given header levels — the inverse
    * used by round-trip oracles and golden tests. Scan-local string
    * building; values are entity-escaped. */
  def renderPage(header: Seq[Seq[(String, Int)]]): Column => Column = {
    val thead = header.map { lvl =>
      lvl.map { case (name, span) =>
        if (span == 1) s"<th>$name</th>"
        else s"""<th colspan="$span">$name</th>"""
      }.mkString("<tr>", "", "</tr>")
    }.mkString("<thead>", "", "</thead>")
    (rows: Column) =>
      concat(lit(s"<html><body><table>$thead<tbody>"),
        array_join(transform(rows, r =>
          concat(lit("<tr>"),
            array_join(transform(r, v =>
              concat(lit("<td> "), escapeEntities(v), lit(" </td>"))),
              ""),
            lit("</tr>"))), ""),
        lit("</tbody></table></body></html>"))
  }
}
