package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

/** S9 — K/V point-lookup enrichment (reference: test/RedisTest.java —
  * sync/async/pipelined Redis GETs used as a side-input store).
  *
  * Two Spark-native forms:
  *  1. broadcast-join a snapshot of the store (preferred when the store
  *     fits memory or can be dumped — what `enrich_wide_row` does with
  *     the dimension tables); zero per-record RPC.
  *  2. THIS: mapPartitions with one client per partition — the shape for
  *     a store that can't be snapshotted. The client is created once per
  *     partition (not per record — the pitfall the reference's
  *     connection-pool tutorial is about), lookups can batch/pipeline,
  *     and the partition count bounds concurrent connections at scale.
  */
object Lookup {

  /** Minimal client surface: open once per partition, get many, close. */
  trait KvClient[V] extends AutoCloseable {
    def get(key: String): Option[V]
  }

  /** Enrich a dataset via per-partition point lookups.
    * @param clientFactory executed on the EXECUTOR once per partition */
  def enrich[T, V, R: Encoder](ds: Dataset[T], clientFactory: () => KvClient[V])(
      key: T => String)(combine: (T, Option[V]) => R): Dataset[R] =
    ds.mapPartitions { rows =>
      val client = clientFactory()
      // close exactly once when the TASK completes — also covers partial
      // consumption (limit/early exit/failure), which a close-on-drain
      // iterator would leak
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      rows.map(t => combine(t, client.get(key(t))))
    }
}
