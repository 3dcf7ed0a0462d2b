package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only shim over the private[spark] listener bus: job-count
  * assertions must drain in-flight listener events before reading their
  * counters, and `waitUntilEmpty` is the only non-racy way to do that.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
