package org.apache.spark

/** Bench-side access to the listener-bus flush (`private[spark]`).
  *
  * graft.Bench attributes per-query shuffle-byte / peak-memory deltas
  * by snapshotting listener-fed counters around each timed run; task-
  * end events are delivered asynchronously, so the bus must be drained
  * before a snapshot is read or a query's tail tasks would bleed into
  * the next entry's delta. `waitUntilEmpty` is the hook Spark's own
  * test utilities use for exactly this.
  */
object GraftSparkAccess {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
