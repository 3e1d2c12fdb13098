package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus drain: per-query metric
  * attribution (graft.tools.QueryMetricsListener) reads task metrics off
  * the ASYNC listener bus, so a measurement taken right after a query's
  * `collect()` races the bus unless the caller drains it first — exactly
  * why Spark's own test harness calls `waitUntilEmpty` between jobs.
  * Nothing but the visibility bridge lives here. */
object ListenerBusBridge {
  /** Block until every queued listener event has been delivered (or the
    * timeout passes — TimeoutException propagates, loud by design). */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
