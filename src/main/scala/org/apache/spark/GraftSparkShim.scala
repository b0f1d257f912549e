package org.apache.spark

/** Bridge into `private[spark] SparkContext.listenerBus` — the harness
  * mains attribute per-query shuffle-byte deltas via a SparkListener,
  * and listener delivery is async: reading the counter after a fixed
  * sleep mis-attributes one query's task metrics to the next whenever
  * the bus lags past the sleep (it does under load). `waitUntilEmpty`
  * is the engine's own drain primitive; it is `private[spark]`, so this
  * one-method accessor lives in this package purely for scope — the
  * same pattern as [[org.apache.spark.sql.GraftShim]]. */
object GraftSparkShim {
  /** Block until every queued listener event is dispatched, or
    * `timeoutMs` passes (then a TimeoutException propagates — callers
    * treat that as "drained as far as it will go"). */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  /** Distinct broadcast ids with at least one live block in the block
    * manager — the ground truth for "is this broadcast's data actually
    * resident". `BlockManagerMaster` is `private[spark]`; the broadcast
    * lifecycle spec asserts against this, not against our own tracking
    * queue, so a destroy that silently stopped reaching the block
    * manager would still fail the spec. */
  def liveBroadcastIds(sc: SparkContext): Set[Long] =
    sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[storage.BroadcastBlockId],
        askStorageEndpoints = true)
      .collect { case storage.BroadcastBlockId(id, _) => id }.toSet
}
