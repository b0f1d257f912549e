package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming sessionizer fed the ordered sf0.001 events across
  * micro-batches must emit exactly the batch operator's sessions,
  * except each user's final session (open at end-of-input by
  * definition — nothing can prove it complete). */
class SessionizeStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val GapUs = 28800000000L // mirror EventAnalytics.SessionGapUs

  test("streaming closed sessions == batch sessionize minus each user's last") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = graft.Tables.events(s, dir)
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        graft.ops.Prims.epochUs(col("ts")).as("tsUs"), col("value"))
      .as[SessionizeState.Ev]
      .collect().sortBy(e => (e.tsUs, e.eventId))

    val input = MemoryStream[SessionizeState.Ev]
    val q = SessionizeState(input.toDS(), GapUs)
      .writeStream.format("memory").queryName("sess_cf")
      .outputMode("append").start()
    val streaming = try {
      evs.grouped(97).foreach { chunk =>
        input.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      s.table("sess_cf").as[SessionizeState.SessionRow].collect()
        .map(r => (r.userId, r.sessionIdx, r.nEvents, r.startUs, r.endUs,
          r.durationUs, r.sumValue)).toSet
    } finally q.stop()

    val batch = graft.ops.EventAnalytics.sessionize(s, dir)
    val lastIdx = batch.groupBy("user_id").agg(max("session_idx").as("mx"))
    val closed = batch.join(lastIdx, "user_id")
      .filter(col("session_idx") < col("mx"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"), col("duration_us"), col("sum_value"))
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSet

    assert(closed.nonEmpty, "fixture premise: users have multiple sessions")
    assert(streaming == closed,
      s"forms diverged: streaming=${streaming.size} batch-closed=${closed.size} " +
        s"diff=${((streaming diff closed) ++ (closed diff streaming)).take(5)}")
  }
}
