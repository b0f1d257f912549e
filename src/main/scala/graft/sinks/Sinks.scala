package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sink surface — K1–K4/K6 (reference: main/HelloWorldFlink.java:143-250).
  *
  * Kafka and Elasticsearch are interface-level here (no brokers in the
  * build container): the Kafka writers produce the exact
  * `writeStream.format("kafka")` configuration the reference's producer
  * used, and the ES sink isolates the BULK BATCHING machinery (the part
  * with engine semantics) behind a transport function so tests can run it
  * against an in-memory transport. Index administration (K6 — the
  * reference's exists/delete/create + mapping template,
  * main/HelloWorldFlink.java:62-117) is catalog DDL, not an operator:
  * docs/K6-es-index-admin.md gives the mapping ≈ schema translation.
  * Spark's kafka sink is at-least-once;
  * the reference's EXACTLY_ONCE txn producer maps to idempotent-by-docId
  * upserts downstream (SURVEY §7.4(3)) — which is what the ES sink does.
  */
object Sinks {

  /** K1: console sink (reference print(), HelloWorldFlinkTest.java:46). */
  def console[T](ds: Dataset[T]): DataStreamWriter[T] =
    ds.writeStream.format("console").outputMode("append")

  /** K2 wire projection: key = keyCol string, value = JSON of the full
    * row — the exact (key, value) pair the reference's producer ships
    * (reference: main/HelloWorldFlink.java:143-162). Split out from the
    * writer so the producer format is testable broker-free: this is the
    * inverse of KafkaJson.decode, and the spec round-trips the two. */
  def kafkaPayload(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** K2 writer options as a canonical map (mirrors the S8 reader
    * builders). Progress rides the checkpoint; delivery is
    * at-least-once — the exactly-once delta vs the reference's txn
    * producer is closed downstream by idempotent upserts (K3). */
  def kafkaOptions(brokers: String, topic: String,
                   checkpoint: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> brokers, "topic" -> topic,
      "checkpointLocation" -> checkpoint)

  /** K2: Kafka producer sink = wire projection + options. */
  def kafkaJson(df: DataFrame, brokers: String, topic: String,
                keyCol: String, checkpoint: String): DataStreamWriter[Row] =
    kafkaPayload(df, keyCol)
      .writeStream.format("kafka")
      .options(kafkaOptions(brokers, topic, checkpoint))

  /** K3 streaming leg: ES-upsert sink for a streaming Dataset — each
    * micro-batch rides [[EsBulkSink.write]] (executor-side per-partition
    * bulks under the retry policy), mirroring the reference's DAG tail
    * where the enriched waybill stream lands in an index
    * (main/HelloWorldFlink.java:203-250). foreachBatch is the Spark
    * shape for a sink with its own client machinery: Spark replays a
    * failed micro-batch (at-least-once), and docAsUpsert keying makes
    * the replay idempotent — the same exactly-once-by-idempotence
    * closure the Kafka writer documents. */
  def esStream[T](ds: Dataset[T], sink: EsBulkSink,
                  checkpoint: String): DataStreamWriter[T] =
    ds.writeStream
      .foreachBatch((batch: Dataset[T], _: Long) => sink.write(batch.toDF()))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** One ES-style upsert action (docAsUpsert keyed by id,
    * reference: main/HelloWorldFlink.java:212-222). */
  final case class Upsert(index: String, id: String, docJson: String)

  /** Marker for a queue-full rejection from the sink backend — the
    * engine-agnostic stand-in for EsRejectedExecutionException (the one
    * failure the reference's RetryRejectedExecutionFailureHandler singles
    * out, main/HelloWorldFlink.java:229). */
  final class RejectedExecutionFailure(msg: String) extends RuntimeException(msg)

  /** K3 failure policy: retrying decorator over a bulk transport
    * (reference: main/HelloWorldFlink.java:227-234 — BulkProcessor
    * backoff CONSTANT 3 s × 5 retries, plus
    * RetryRejectedExecutionFailureHandler).
    *
    * Two failure classes, mirroring the reference:
    *  - REJECTION (queue-full; [[isRejection]]): retried with constant
    *    backoff WITHOUT consuming the retry budget — the reference
    *    handler re-queues rejected actions unconditionally, so sustained
    *    rejection backpressures the writing task rather than dropping
    *    data. A batch caller blocks; that is the semantics, not a bug.
    *  - any other failure: retried up to [[maxRetries]] times with the
    *    same constant backoff, then the bulk and the last error are
    *    routed to [[onGiveUp]] (default: rethrow, failing the task so
    *    Spark's task retry takes over — at-least-once, made effectively
    *    idempotent by docAsUpsert keying).
    *
    * Runs on executors (composed under [[EsBulkSink.write]]), so every
    * field must be serializable; `sleeper` is injectable so specs assert
    * the backoff schedule without real 3 s waits. */
  final class RetryingTransport(
      underlying: Seq[Upsert] => Unit,
      maxRetries: Int = 5,
      backoffMillis: Long = 3000L,
      isRejection: Throwable => Boolean = RetryingTransport.defaultIsRejection,
      onGiveUp: (Seq[Upsert], Throwable) => Unit = (_, e) => throw e,
      sleeper: Long => Unit = Thread.sleep)
    extends (Seq[Upsert] => Unit) with Serializable {
    def apply(bulk: Seq[Upsert]): Unit = {
      var failures = 0 // budget-consuming (non-rejection) failures so far
      while (true) {
        try { underlying(bulk); return }
        catch {
          case e: Throwable if isRejection(e) =>
            sleeper(backoffMillis) // re-queue, budget untouched
          // NonFatal only: a dying JVM (OutOfMemoryError, LinkageError) or
          // an interrupt must fail the task NOW, not after 6×backoff of
          // sleeps that mask the real failure from Spark's task reaper
          case scala.util.control.NonFatal(e) =>
            failures += 1
            if (failures > maxRetries) { onGiveUp(bulk, e); return }
            sleeper(backoffMillis)
        }
      }
    }
  }

  object RetryingTransport {
    /** JDK RejectedExecutionException or the local marker. */
    val defaultIsRejection: Throwable => Boolean = e =>
      e.isInstanceOf[java.util.concurrent.RejectedExecutionException] ||
        e.isInstanceOf[RejectedExecutionFailure]
  }

  /** K3/K6: bulk-upsert sink core. Groups a micro-batch into bulks of
    * ≤ `bulkActions` (reference flush: 100 actions / 5 MB / 30 s,
    * main/HelloWorldFlink.java:227-234) and hands each bulk to
    * `transport` (the HTTP _bulk call in production; an in-memory list in
    * tests). The companion [[EsBulkSink.apply]] composes the reference's
    * retry/backoff policy ([[RetryingTransport]]) in by default.
    * Used via foreachBatch → effectively-once by idempotent docId. */
  final class EsBulkSink(index: String, idCol: String, bulkActions: Int,
                         transport: Seq[Upsert] => Unit) extends Serializable {
    /** Default path: executor-side per-partition bulks — each partition
      * builds and ships its own ≤ `bulkActions` bulks where the data
      * lives (the 100 TB shape: no driver collect, per-partition
      * BulkProcessor just like the reference's per-sink-instance one).
      * `transport` runs on executors, so it must be serializable and
      * must not capture driver-only state. */
    def write(batch: DataFrame): Unit = {
      val idx = index; val n = bulkActions; val t = transport
      batch
        .select(col(idCol).cast("string").as("id"),
          to_json(struct(batch.columns.toIndexedSeq.map(col): _*)).as("doc"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.map(r => Upsert(idx, r.getString(0), r.getString(1)))
            .grouped(n).foreach(t)
        }
    }

    /** Driver-side helper for METADATA-SIZED batches only (debug dumps,
      * tiny dimension flushes): collects the micro-batch to the driver,
      * so it must never sit on the scale path — use [[write]] there. */
    def writeSmallBatchOnDriver(batch: DataFrame): Unit = {
      val idx = index
      val actions = batch
        .select(col(idCol).cast("string").as("id"),
          to_json(struct(batch.columns.toIndexedSeq.map(col): _*)).as("doc"))
        .collect()
        .map(r => Upsert(idx, r.getString(0), r.getString(1)))
      actions.grouped(bulkActions).foreach(g => transport(g.toSeq))
    }
  }

  object EsBulkSink {
    /** Production entry: the raw transport wrapped in the reference's
      * failure policy ([[RetryingTransport]]) by default — a user gets
      * bulk batching AND retry/backoff, exactly what the reference's
      * BulkProcessor composes (main/HelloWorldFlink.java:227-234). Use
      * `new EsBulkSink(...)` directly only to supply a transport that
      * already handles its own failures. */
    def apply(index: String, idCol: String, bulkActions: Int,
              transport: Seq[Upsert] => Unit): EsBulkSink =
      new EsBulkSink(index, idCol, bulkActions, new RetryingTransport(transport))
  }

  /** K4: no-op lifecycle ForeachWriter (reference:
    * main/HelloWorldFlink.java:236-248 RichSinkFunction demo). */
  final class LifecycleWriter extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(value: Row): Unit = ()
    override def close(errorOrNull: Throwable): Unit = ()
  }
}
