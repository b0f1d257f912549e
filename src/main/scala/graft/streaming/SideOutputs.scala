package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming side outputs (T6/J8; reference:
  * test/HelloWorldFlinkTest.java:355-377 OutputTag main/side split;
  * test/StateTest.java:460-527 side output from a stateful op).
  *
  * Spark has no OutputTag channel; the streaming equivalent is a
  * foreachBatch fan-out: ONE upstream pass per micro-batch (the batch is
  * cached), each predicate routing to its own sink. Exactly-once per
  * sink follows from the (batchId, idempotent-write) contract the
  * reference's ES upsert sink relies on too. */
object SideOutputs {

  /** Route each micro-batch to multiple sinks by predicate.
    * @param routes (predicateSql, sinkFn) pairs; rows can match many */
  def fanOut(df: DataFrame, routes: Seq[(String, DataFrame => Unit)]): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val cached = batch.cache()
      try routes.foreach { case (pred, sink) => sink(cached.filter(pred)) }
      finally { cached.unpersist(); () }
    }

  def start(df: DataFrame, routes: Seq[(String, DataFrame => Unit)]): StreamingQuery =
    fanOut(df, routes).start()
}
