package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source modeling the reference's paged HTML scans
  * (SURVEY.md §2.1 S1/S2: one HTTP page per letter/season/month, results
  * unioned). A "site" here is a directory of page files; the source
  * exposes them as ONE table with schema (page, line) and exactly one
  * input partition per page — the Spark-native shape of the reference's
  * sequential fetch loop, where the planner owns the fan-out
  * (`playerInfo.py:6-9`, `games.py:19-27`).
  *
  * Usage: `spark.read.format("staged-pages").option("path", dir).load()`.
  *
  * Kept deliberately minimal (batch read, column pruning via
  * ScanBuilder): enough to show the V2 seams — TableProvider → Table →
  * ScanBuilder → Batch → PartitionReaderFactory — without inventing
  * capability the engine doesn't need (parquet remains the at-rest
  * format everywhere else).
  */
class StagedPagesSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "staged-pages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StagedPagesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new StagedPagesTable(properties.get("path"))
}

object StagedPagesSource {
  val schema: StructType = StructType(Seq(
    StructField("page", StringType, nullable = false),
    StructField("line", StringType, nullable = true)))
}

class StagedPagesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"staged_pages($path)"
  override def schema(): StructType = StagedPagesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new StagedPagesScanBuilder(path)
}

class StagedPagesScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {

  private var required: StructType = StagedPagesSource.schema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Page-name predicates prune whole PAGES at planning time — the
    * DSV2 analog of parquet partition pruning: a query over one letter
    * page plans ONE input partition instead of listing-and-filtering
    * all of them. Every filter is also returned as residual, so Spark
    * re-applies it post-scan — pruning is purely a partition-
    * elimination optimization and can never change results. */
  override def pushFilters(filters: Array[sources.Filter])
  : Array[sources.Filter] = {
    pushed = filters.filter(StagedPagesScan.pageEvaluable)
    filters
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = new StagedPagesScan(path, required, pushed)
}

case class PagePartition(file: String) extends InputPartition

object StagedPagesScan {
  import org.apache.spark.sql.sources._

  /** Which filters the scan can evaluate against a page NAME alone. */
  private[sources] def pageEvaluable(f: Filter): Boolean = f match {
    case EqualTo("page", _: String) => true
    case In("page", _) => true
    case StringStartsWith("page", _) => true
    case StringEndsWith("page", _) => true
    case StringContains("page", _) => true
    case Not(EqualTo("page", _: String)) => true
    case _ => false
  }

  private[sources] def keepPage(pushed: Array[Filter], name: String)
  : Boolean = pushed.forall {
    case EqualTo("page", v: String) => name == v
    case In("page", vs) => vs.exists {
      case v: String => name == v
      case _ => false
    }
    case StringStartsWith("page", p: String) => name.startsWith(p)
    case StringEndsWith("page", s: String) => name.endsWith(s)
    case StringContains("page", s: String) => name.contains(s)
    case Not(EqualTo("page", v: String)) => name != v
    case _ => true
  }
}

class StagedPagesScan(path: String, required: StructType,
                      pushed: Array[sources.Filter] = Array.empty)
  extends Scan with Batch
  with SupportsRuntimeFiltering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StagedPages path=$path cols=${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  /** RUNTIME page pruning — the DSV2 analog of dynamic partition
    * pruning: when this table joins a dimension whose selective filter
    * only resolves at execution (Catalyst's PartitionPruning plants a
    * DynamicPruningSubquery on `page`), the subquery's surviving keys
    * arrive here as an IN filter BEFORE partitions are planned, and
    * non-matching pages are never opened. At the reference's real
    * shape — thousands of season/letter pages joined to a handful of
    * selected seasons — this is the difference between fetching one
    * page and fetching the site. Runtime filters can only REMOVE
    * partitions (Spark re-applies the join itself), so correctness
    * never depends on them. */
  private var runtime: Array[sources.Filter] = Array.empty

  override def filterAttributes()
  : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("page"))

  override def filter(filters: Array[sources.Filter]): Unit =
    runtime = filters.filter(StagedPagesScan.pageEvaluable)

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val pages = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .filter(f => StagedPagesScan.keepPage(pushed ++ runtime, f.getName))
      .map(_.getAbsolutePath).sorted
    pages.map(PagePartition.apply: String => InputPartition)
  }

  // pagesRead surfaces in the SQL UI / executedPlan metrics, so tests
  // (and operators) can assert how many pages the scan ACTUALLY opened
  // — planning-time and runtime pruning are otherwise invisible once
  // AQE wraps the scan
  override def supportedCustomMetrics()
  : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PagesReadMetric)

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required.fieldNames)
}

class PagesReadMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "pagesRead"
  override def description(): String = "pages read"
}

object PageReaderFactory {
  /** Pages opened in THIS JVM since start — the local-mode diagnostic
    * behind the pruning specs (the `pagesRead` CustomMetric is the
    * cluster-facing copy in the SQL UI; a driver-side test cannot
    * reliably reach the executed AQE stage's accumulators). Monotonic;
    * tests diff before/after. */
  val pagesOpened = new java.util.concurrent.atomic.AtomicLong(0L)
}

class PageReaderFactory(cols: Array[String])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
  : PartitionReader[InternalRow] = {
    PageReaderFactory.pagesOpened.incrementAndGet()
    val file = partition.asInstanceOf[PagePartition].file
    new PartitionReader[InternalRow] {
      private val pageName = new java.io.File(file).getName
      // read eagerly and close immediately: a PartitionReader that holds
      // the handle until close() leaks one descriptor per page on
      // long-running executors
      private val lines = {
        val src = scala.io.Source.fromFile(file, "UTF-8")
        try src.getLines().toArray finally src.close()
      }
      private var i = -1

      override def next(): Boolean = { i += 1; i < lines.length }

      override def get(): InternalRow = {
        val values = cols.map {
          case "page" => UTF8String.fromString(pageName)
          case "line" => UTF8String.fromString(lines(i))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(new org.apache.spark.sql.connector.metric.CustomTaskMetric {
          override def name(): String = "pagesRead"
          override def value(): Long = 1L
        })

      override def close(): Unit = ()
    }
  }
}
