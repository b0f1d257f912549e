package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink-exact event-time session windows (gap merge) as a live
  * Structured Streaming operator — the streaming deployment of
  * `FlinkWindows.session` (W8; reference: test/WindowTest.java:205-261,
  * EventTimeSessionWindows.withGap + merge walkthrough).
  *
  * Kept alongside Spark's native `session_window` aggregation for the
  * semantics the native form doesn't expose: the session buffer is in
  * GroupState, so the handler can do per-session custom logic at fire
  * time (the reference's motivating use case — one DB write per
  * session, :215-216) and sessions merge with TimeWindow.intersects
  * semantics (touching windows merge). Fires when the watermark passes
  * sessionEnd-1; an EventTimeTimeout timer covers keys with no further
  * arrivals. State per key = open sessions within the gap horizon.
  */
object SessionWindowState {

  final case class Ev(key: String, value: Long, ts: java.sql.Timestamp)
  final case class SessOut(key: String, sessionStart: Long, sessionEnd: Long,
                           sum: Long, count: Long)
  final case class Buf(sessions: Vector[(Long, Long, Long, Long)]) // (start, end, sum, count)

  def session(ds: Dataset[Ev], gapMs: Long): Dataset[SessOut] = {
    implicit val o = Encoders.product[SessOut]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.STRING

    def handle(key: String, events: Iterator[Ev], state: GroupState[Buf]): Iterator[SessOut] = {
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MinValue }
      var sessions = state.getOption.map(_.sessions).getOrElse(Vector.empty)
      val out = Vector.newBuilder[SessOut]

      events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        val ts = e.ts.getTime
        var s = (ts, ts + gapMs, e.value, 1L)
        // merge every intersecting session (start <= other.end && other.start <= end)
        val (overlap, rest) = sessions.partition(o => s._1 <= o._2 && o._1 <= s._2)
        overlap.foreach { o =>
          s = (math.min(s._1, o._1), math.max(s._2, o._2), s._3 + o._3, s._4 + o._4)
        }
        sessions = rest :+ s
      }
      // fire sessions the watermark has closed
      val (fired, open) = sessions.partition(_._2 - 1 <= wm)
      fired.sortBy(_._1).foreach { case (st, en, sum, n) =>
        out += SessOut(key, st, en, sum, n)
      }
      sessions = open
      if (sessions.isEmpty) state.remove()
      else {
        state.update(Buf(sessions))
        // fire condition is end - 1 <= wm and Spark's timeout fires only
        // when wm STRICTLY exceeds the armed timestamp → arm at end - 2
        // so quiet keys fire at exactly wm = end - 1 (the Flink point)
        state.setTimeoutTimestamp(math.max(sessions.map(_._2).min - 2, wm + 1))
      }
      out.result().iterator
    }

    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
