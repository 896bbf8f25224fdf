package org.apache.spark

/** Test-only accessor for the private[spark] listener bus, so specs can
  * deterministically drain async listener events before asserting on
  * job counts (the same trick Spark's own test suites use). */
object GraftTestBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
