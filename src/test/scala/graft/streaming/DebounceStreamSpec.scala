package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming debounce state machine fed the ordered sf0.001 events
  * across micro-batches must keep exactly the rows the batch operator
  * keeps. */
class DebounceStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val GapUs = 21600000000L // mirror EventAnalytics.DebounceUs

  test("streaming session-head suppression == batch window-lag form") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = graft.Tables.events(s, dir)
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"),
        graft.ops.Prims.epochUs(col("ts")).as("tsUs"), col("value"))
      .as[DebounceState.Ev]
      .collect().sortBy(e => (e.tsUs, e.eventId))

    val input = MemoryStream[DebounceState.Ev]
    val q = DebounceState(input.toDS(), GapUs)
      .writeStream.format("memory").queryName("deb_cf")
      .outputMode("append").start()
    val streaming = try {
      evs.grouped(97).foreach { chunk =>
        input.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      s.table("deb_cf").as[DebounceState.Ev].collect().map(_.eventId).toSet
    } finally q.stop()

    val batch = graft.ops.EventAnalytics.debounce(s, dir)
      .select("event_id").as[Long].collect().toSet

    assert(batch.nonEmpty && batch.size < evs.length,
      "fixture premise: suppression is discriminative")
    assert(streaming == batch,
      s"forms diverged: streaming=${streaming.size} batch=${batch.size} " +
        s"diff=${((streaming diff batch) ++ (batch diff streaming)).take(10)}")
  }
}
