package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`; the bench needs to
  * drain it so per-query spill counters read complete task metrics.
  * Same minimal-bridge pattern as sql.GraftExpressionBridge.
  */
object GraftListenerBridge {
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
