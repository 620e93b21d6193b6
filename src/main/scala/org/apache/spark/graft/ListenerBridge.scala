package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus quiesce — dev profiling tools
  * need to drain async listener events between measured queries so
  * per-query job/stage counters don't bleed across boundaries.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
