package org.apache.spark

/** `LiveListenerBus.waitUntilEmpty()` is `private[spark]`; graft.Bench
  * needs it so per-query metric snapshots see every task-end event of
  * the query that just finished (the listener bus is async — without a
  * drain, the tail of query N's metrics lands in query N+1's window).
  * This glue re-exposes exactly that one call. */
object GraftBenchGlue {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
