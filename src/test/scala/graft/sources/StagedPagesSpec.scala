package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StagedPagesSpec extends SparkSpec {
  import spark.implicits._

  private def writePages(): String = {
    val dir = Files.createTempDirectory("graft_pages")
    Seq("a" -> Seq("row1", "row2"), "b" -> Seq("row3"),
      "c" -> Seq("row4", "row5", "row6")).foreach { case (p, lines) =>
      Files.write(dir.resolve(s"page_$p.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir.toString
  }

  test("staged-pages: one partition per page, lines preserved") {
    val dir = writePages()
    val df = spark.read.format("staged-pages")
      .option("path", dir).load()
    assert(df.rdd.getNumPartitions === 3) // page fan-out = partitions
    assert(df.count() === 6)
    val byPage = df.groupBy("page").count()
      .as[(String, Long)].collect().toMap
    assert(byPage === Map("page_a.txt" -> 2L, "page_b.txt" -> 1L,
      "page_c.txt" -> 3L))
  }

  test("staged-pages: column pruning reaches the scan") {
    val dir = writePages()
    val df = spark.read.format("staged-pages")
      .option("path", dir).load()
      .select("line")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("cols=line"), scan)
    assert(df.as[String].collect().sorted ===
      Array("row1", "row2", "row3", "row4", "row5", "row6"))
  }

  test("staged-pages composes with the anchor-extract pattern (S3)") {
    val dir = Files.createTempDirectory("graft_html")
    Files.write(dir.resolve("p1.html"),
      """<a href="/coaches/jacksph01c.html">Phil</a>
        |<a href="/players/jordami01.html">MJ</a>
        |<a href="/coaches/rilepa01c.html">Pat</a>""".stripMargin
        .getBytes("UTF-8"))
    val hrefs = spark.read.format("staged-pages")
      .option("path", dir.toString).load()
      .select(explode(regexp_extract_all(col("line"),
        lit("href=\"(/coaches/[^\"]+\\.html)\""), lit(1))).as("href"))
      .as[String].collect().sorted
    assert(hrefs === Array("/coaches/jacksph01c.html",
      "/coaches/rilepa01c.html"))
  }
}
