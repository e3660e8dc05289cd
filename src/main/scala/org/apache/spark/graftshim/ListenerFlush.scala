package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Deterministic listener drain for metric collection: Spark's listener bus
  * is asynchronous, so task-metric aggregates read right after an action can
  * miss the tail of the run's events. `waitUntilEmpty` is `private[spark]` —
  * this shim re-exports just that one call (no other internals touched) so
  * the bench harness can flush the bus between a query's action and its
  * counter snapshot. Used only by measurement tooling, never by operators.
  */
object ListenerFlush {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
