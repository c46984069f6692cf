package org.apache.spark

/** Scala-private accessor used by graft.Bench: drain the async listener
  * bus between queries so task-metric deltas attribute to the query that
  * produced them (events are posted asynchronously; without the drain a
  * query's last tasks could land in the next query's window).
  * `waitUntilEmpty` is `private[spark]` — this same-package shim is the
  * standard way to reach it from library code; nothing in Spark is
  * modified or overridden.
  */
object GraftListenerBusAccess {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
