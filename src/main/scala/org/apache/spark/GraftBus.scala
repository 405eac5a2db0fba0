package org.apache.spark

/** Driver-side drain of the shared listener bus — `listenerBus` is
  * `private[spark]`, so the bench/battery/test callers that need an exact
  * post-action listener read (per-query metric attribution, segment-law
  * flag deltas) reach it through this shim instead of a fixed
  * `Thread.sleep`, which under a loaded host delivers events late and
  * made the segment-law end-to-end pin flaky (ADVICE r15). SQL execution
  * listeners (`ExecutionListenerBus`) ride the same bus, so one drain
  * covers both task metrics and QueryExecutionListener delivery. */
object GraftBus {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
