/*
 * Lives under org.apache.spark.* because SparkContext.listenerBus is
 * private[spark] (same placement rationale as the Catalyst extensions).
 */
package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Flush the asynchronous listener bus so per-query scheduler counters
  * (graft.BenchExtra) read complete, correctly-attributed totals — listener
  * events are delivered on a separate thread, so without the drain a short
  * query's final stage events can land after the next rep's reset. */
object ListenerBusSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
