package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark] SparkContext.listenerBus`:
  * QueryExecutionListener events are dispatched asynchronously, so a spec
  * that records executed plans must drain the bus before asserting —
  * otherwise the listener race makes plan guards flaky. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
