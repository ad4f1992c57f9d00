package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Core-side shim (same rationale as sql.graft.Bridge): the listener bus
  * drain used by Spark's own test harnesses is private[spark]; the
  * measurement harness needs it to read complete task metrics after an
  * action. */
object SparkBridge {
  def waitForListenerBus(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
