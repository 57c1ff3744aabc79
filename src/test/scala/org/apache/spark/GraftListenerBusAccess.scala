package org.apache.spark

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`, and
 * draining it is the only deterministic way to assert a job COUNT (the
 * listener bus delivers `onJobStart` asynchronously — a sleep-free
 * assertion would race the event delivery). Lives in the
 * `org.apache.spark` package for visibility only; nothing else leaks. */
object GraftListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
