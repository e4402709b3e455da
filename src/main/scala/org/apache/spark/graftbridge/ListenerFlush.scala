package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Drain the async listener bus so a metric snapshot taken right
  * after a query has seen every stage-completed event of that query
  * (without this, a query's tail I/O/spill events can be attributed
  * to the NEXT query's window — r13 ADVICE). `LiveListenerBus` is
  * `private[spark]`, hence this one-line bridge in the spark package
  * — the same shim pattern Spark's own TestUtils callers use. */
object ListenerFlush {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
