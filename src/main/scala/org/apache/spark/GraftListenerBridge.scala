package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`; the bench needs to
  * drain it so per-query spill counters read complete task metrics.
  * Same minimal-bridge pattern as sql.GraftExpressionBridge.
  */
object GraftListenerBridge {
  /** Drain the listener bus; returns false (instead of throwing) when
    * the bus fails to settle within the timeout — the caller's spill
    * number may then be undercounted, which must not crash a bench
    * after all queries already ran. */
  def flushListeners(sc: SparkContext, timeoutMillis: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
