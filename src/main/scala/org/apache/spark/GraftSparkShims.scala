package org.apache.spark

/** One `private[spark]` touch point for the DEV TOOLS only (the library
  * itself never uses it): the listener bus posts job/stage events
  * asynchronously, so a measurement tool that reads listener-fed
  * counters right after an action returns can miss the tail events and
  * under-count the jobs it exists to attribute (JobCountProbe's whole
  * purpose). `waitUntilEmpty` drains the bus deterministically.
  */
object GraftSparkShims {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
