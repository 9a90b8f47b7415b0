package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Shared plan guards that must see EVERY query an operator executes —
  * a final-plan assertion misses eagerly staged subtrees (stage() hides
  * them behind an ExistingRDD), which is exactly where a straggler
  * window can hide. A QueryExecutionListener records each executed
  * plan inside `work`; the bus is drained before asserting. */
object PlanGuards {

  /** Runs `work` and returns every window partitioned SOLELY by
    * `colName` over a NON-aggregated child that executed during it —
    * the dominant-group straggler shape (one task buffers the biggest
    * group). Windows above an Aggregate are exempt: the offset-lift
    * idiom itself runs a per-group window over the bounded
    * (partition, group) counts frame, which is ≤ #partitions rows per
    * group by construction. */
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
              !w.child.exists {
                case _: Aggregate => true
                case _ => false
              } =>
            seen.add(w.simpleString(300))
          case _ => ()
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      work
      org.apache.spark.grafttest.ListenerDrain.drain(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    seen.asScala.toSeq
  }
}
