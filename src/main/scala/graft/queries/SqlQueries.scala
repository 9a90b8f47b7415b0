package graft

import graft.Staging._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.graph.{Graph, Walks}
import graft.multimodal.Multimodal
import graft.ops.{analytics, asof, baskets, expectations, exprs, qsketch, rangejoin, sketches, sweepline, timeseries, windows}
import graft.similarity.{LabelEval, Similarity}
import graft.sources.{HtmlTables, Layout, StagedSources}
import graft.streaming.Streams
import graft.text.{Bpe, Importance, Packing, SuffixArray, Text}

/** the TPC-H-shaped SQL front door — the Sql slice of the
  * extension surface, split out of [[ExtensionQueries]] (round 12)
  * with zero behavior change: entries are verbatim; shared artifact
  * helpers and oracle CTE fragments stay package-private in
  * [[ExtensionQueries]]. Composed back in [[ExtensionQueries.queries]]
  * / [[ExtensionQueries.oracleSql]]. */
private[graft] object SqlQueries {
  import Tables.t
  import ExtensionQueries._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RECURSIVE CTE through the spark.sql front door (Spark 4 WITH
    // RECURSIVE, delta semantics — probed): the org-chart rollup shape
    // over the decimal-digit hierarchy (parent = key DIV 10, roots
    // < 10; key 0's self-edge excluded or the recursion never
    // exhausts). Per root: subtree size, max depth, exact subtree
    // balance in cents. The oracle runs DuckDB's recursive CTE over
    // the same hierarchy — two engines' recursion agreeing row for row.
    "q_sql_recursive" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_rv")
      s.sql("""
        WITH RECURSIVE anc(root, node, depth, bal) AS (
          SELECT c_custkey, c_custkey, 0,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
          FROM customer_rv WHERE c_custkey < 10
          UNION ALL
          SELECT a.root, c.c_custkey, a.depth + 1,
                 CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
          FROM anc a JOIN customer_rv c
            ON c.c_custkey DIV 10 = a.node AND c.c_custkey >= 10
        )
        SELECT root, COUNT(*) AS n_nodes,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               SUM(bal) AS subtree_cents
        FROM anc GROUP BY root ORDER BY root""")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // DuckDB's recursive CTE over the same digit hierarchy — two
    // engines' WITH RECURSIVE agreeing row for row (// is DuckDB's
    // truncating integer division, Spark's DIV)
    "q_sql_recursive" ->
      """WITH RECURSIVE anc(root, node, depth, bal) AS (
           SELECT c_custkey, c_custkey, 0,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM customer WHERE c_custkey < 10
           UNION ALL
           SELECT a.root, c.c_custkey, a.depth + 1,
                  CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           FROM anc a JOIN customer c
             ON c.c_custkey // 10 = a.node AND c.c_custkey >= 10
         )
         SELECT root, COUNT(*)::BIGINT AS n_nodes,
                CAST(MAX(depth) AS BIGINT) AS max_depth,
                SUM(bal)::BIGINT AS subtree_cents
         FROM anc GROUP BY root ORDER BY root""",
  )
}
