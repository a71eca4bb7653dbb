package org.apache.spark

/** `private[spark]` access the bench harness needs: quiescing the
  * listener bus so per-query shuffle accounting attributes task metrics
  * to the right query. Bench-only; the engine itself never uses it. */
object GraftCoreShim {
  /** Block until all queued listener events are dispatched (or timeout). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
