package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, UnaryNode, Window => LWindow}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Shared plan guards that must see EVERY query an operator executes —
  * a final-plan assertion misses eagerly staged subtrees (stage() hides
  * them behind an ExistingRDD), which is exactly where a straggler
  * window can hide. A QueryExecutionListener records each executed
  * plan inside `work`; the bus is drained before asserting. */
object PlanGuards {

  /** Every node of a physical plan, AQE-aware: `executedPlan` of an
    * AQE query is an `AdaptiveSparkPlanExec` whose `children` is EMPTY
    * — a naive `p.children` traversal sees one node and any guard
    * written over it passes VACUOUSLY (the round-11 near-miss, fixed
    * inline twice in SimilaritySpec; this is the shared form). Unwraps
    * the adaptive root to its current physical plan (initial plan
    * pre-execution, final plan after) and descends into subqueries.
    *
    * `minNodes` is a mandatory vacuousness pin: seeing fewer nodes
    * than the guard author knows the real tree must contain fails
    * loudly instead of green-lighting nothing. */
  def physicalNodes(plan: org.apache.spark.sql.execution.SparkPlan,
                    minNodes: Int = 4)
  : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    def all(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => a +: all(a.executedPlan)
      // materialized AQE stages (Shuffle/Broadcast/ResultQueryStage)
      // are LEAF nodes wrapping their stage plan — same trap as the
      // adaptive root, hit on POST-execution traversals
      case s: org.apache.spark.sql.execution.adaptive
        .QueryStageExec => s +: all(s.plan)
      case _ =>
        p +: (p.children.flatMap(all) ++ p.subqueries.flatMap(all))
    }
    val nodes = all(plan)
    require(nodes.length >= minNodes,
      s"plan traversal saw only ${nodes.length} node(s) (< $minNodes)" +
        s" — vacuous guard? root: ${plan.nodeName}")
    nodes
  }

  /** Is this window's DIRECT input (walking through unary
    * project/filter/window nodes only) an aggregate keyed by the
    * physical partition id? That is the offset-lift idiom's bounded
    * per-(partition, group) counts frame — ≤ #partitions rows per
    * group by construction — and the ONLY legitimate place a window
    * partitioned solely by the group column may appear. Any broader
    * exemption (e.g. "some Aggregate anywhere below") would wave
    * through a per-doc aggregate that is still corpus-sized.
    *
    * "Keyed by the partition id" is checked by DEFINITION, not by
    * name: the grouping attribute must carry the
    * [[graft.ops.windows.PartitionIdMetaKey]] metadata marker written
    * at the one place the engine aliases `spark_partition_id()`
    * (attribute metadata survives checkpoints and self-join
    * re-instancing, which both re-mint exprIds). A name match alone
    * would wave through production code that groups a corpus-sized
    * frame by its own column merely NAMED __pid — the exact blindspot
    * class this guard exists to close. */
  private def overPartitionBoundedAgg(p: LogicalPlan): Boolean =
    p match {
      case a: Aggregate =>
        a.groupingExpressions.exists(_.references.exists(r =>
          r.metadata.contains(graft.ops.windows.PartitionIdMetaKey)))
      case u: UnaryNode => overPartitionBoundedAgg(u.child)
      case _ => false
    }

  /** Runs `work` and returns every window partitioned SOLELY by
    * `colName` over non-partition-bounded data that executed during it
    * — the dominant-group straggler shape (one task buffers the
    * biggest group). */
  def sourceOnlyWindows(spark: SparkSession, colName: String)(
      work: => Unit): Seq[String] = {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.optimizedPlan.foreach {
          case w: LWindow
            if w.partitionSpec.size == 1 &&
              w.partitionSpec.head.references.toSeq.map(_.name) ==
                Seq(colName) &&
              !overPartitionBoundedAgg(w.child) =>
            seen.add(w.simpleString(300))
          case _ => ()
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    // flush events from whatever executed BEFORE the guard: listener-
    // bus delivery is async, so a backed-up bus would otherwise hand
    // this listener plans from outside `work` (observed: a heavy
    // preceding test leaked its windows into the next guard block)
    org.apache.spark.grafttest.ListenerDrain.drain(spark.sparkContext)
    spark.listenerManager.register(listener)
    try {
      work
      org.apache.spark.grafttest.ListenerDrain.drain(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    seen.asScala.toSeq
  }
}
