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

    /** Batched lookup — ONE store round-trip for many keys. Override
      * with the store's pipelined/multi-get form (the reference's Redis
      * tutorial is substantially about this: pipelined GETs / MGET,
      * test/RedisTest.java:138-162,213-257 — per-key round-trips are the
      * latency killer of lookup enrichment). The default degrades to
      * per-key gets so point-lookup-only clients still work; results
      * align positionally with `keys`. */
    def getAll(keys: Seq[String]): Seq[Option[V]] = keys.map(get)
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

  /** Pipelined enrichment: like [[enrich]], but keys go to the store in
    * chunks of `batchSize` through [[KvClient.getAll]] — round-trips per
    * partition drop from O(rows) to O(rows / batchSize). The `grouped`
    * iterator is lazy, so only one chunk of rows is buffered at a time
    * (constant memory regardless of partition size), and the task-
    * completion close covers partial consumption exactly as in
    * [[enrich]]. */
  def enrichBatched[T, V, R: Encoder](ds: Dataset[T], clientFactory: () => KvClient[V],
      batchSize: Int = 128)(key: T => String)(combine: (T, Option[V]) => R): Dataset[R] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    ds.mapPartitions { rows =>
      val client = clientFactory()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      rows.grouped(batchSize).flatMap { chunk =>
        val values = client.getAll(chunk.map(key))
        require(values.length == chunk.length,
          s"getAll returned ${values.length} values for ${chunk.length} keys")
        chunk.iterator.zip(values.iterator).map { case (t, v) => combine(t, v) }
      }
    }
  }
}
