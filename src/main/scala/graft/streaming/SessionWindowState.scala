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
  * session, :215-216), sessions merge with TimeWindow.intersects
  * semantics (touching windows merge), and `allowedLatenessMs` re-fires
  * a fired-but-retained session when a late-but-allowed event merges in
  * (W9 for merging windows — the same re-fire contract as
  * [[EventWindowState]]). Fires when the watermark passes sessionEnd-1;
  * an EventTimeTimeout timer covers keys with no further arrivals.
  *
  * Lateness rules follow Flink's WindowOperator for merging windows:
  * the test runs on the POST-merge window (mergeWindows first, then
  * isWindowLate) — an event whose own gap window is past the horizon is
  * KEPT when it merges into a still-retained session; an event beyond
  * `end - 1 + allowedLateness` of its merged window is dropped (Flink's
  * default no-side-output path). Fired sessions are retained until the
  * watermark passes `end - 1 + allowedLateness`, so state per key =
  * sessions within the lateness horizon.
  *
  * Streaming delta (same as [[EventWindowState]]): the ENGINE drops
  * rows behind the query watermark before they reach this operator, so
  * deep-late merges are only observable live when the upstream delay
  * folds in the lateness (SURVEY §7.4). The per-key transition itself
  * is [[advance]] — a pure function, so its Flink-exact behavior at
  * arbitrary watermark points is testable without the engine filter.
  */
object SessionWindowState extends Serializable {

  final case class Ev(key: String, value: Long, ts: java.sql.Timestamp)
  final case class SessOut(key: String, sessionStart: Long, sessionEnd: Long,
                           sum: Long, count: Long)
  /** session tuple: (start, end, sum, count, pendingSinceLastFire) */
  final case class Buf(sessions: Vector[(Long, Long, Long, Long, Boolean)])

  /** One watermark-step of the per-key session machine: merge the new
    * `events` (pre-sorted by ts) into `sessions`, apply the post-merge
    * lateness rule, fire/re-fire everything `wm` has closed, purge past
    * the lateness horizon. Returns (emitted rows, retained sessions). */
  private[streaming] def advance(
      key: String, sessions0: Vector[(Long, Long, Long, Long, Boolean)],
      events: Seq[(Long, Long)], wm: Long, gapMs: Long, allowedLatenessMs: Long)
    : (Vector[SessOut], Vector[(Long, Long, Long, Long, Boolean)]) = {
    var sessions = sessions0
    val out = Vector.newBuilder[SessOut]
    events.foreach { case (ts, value) =>
      var s = (ts, ts + gapMs, value, 1L, true)
      // read-only overlap scan first: the lateness test needs the
      // POST-merge end, and a dropped event must leave every retained
      // session untouched
      val overlap = sessions.filter(o => s._1 <= o._2 && o._1 <= s._2)
      val mergedEnd = (s._2 +: overlap.map(_._2)).max
      if (mergedEnd - 1 + allowedLatenessMs <= wm) {
        // beyond watermark + lateness of the merged window → dropped
        // (reachable only when nothing overlaps: a retained session's
        // end already satisfies end - 1 + lateness > wm)
      } else {
        overlap.foreach { o =>
          s = (math.min(s._1, o._1), math.max(s._2, o._2), s._3 + o._3, s._4 + o._4, true)
        }
        if (s._2 - 1 <= wm) {
          // late-but-allowed merge into a session whose firing point has
          // passed → immediate re-fire with updated contents (if the
          // merge extended the session past the watermark it instead
          // goes back to waiting for the new fire point)
          out += SessOut(key, s._1, s._2, s._3, s._4)
          s = s.copy(_5 = false)
        }
        sessions = sessions.filterNot(overlap.contains) :+ s
      }
    }
    // fire sessions the watermark has closed and that hold unfired data
    sessions.filter(s => s._2 - 1 <= wm && s._5).sortBy(_._1)
      .foreach { case (st, en, sum, n, _) => out += SessOut(key, st, en, sum, n) }
    sessions = sessions.map(s => if (s._2 - 1 <= wm) s.copy(_5 = false) else s)
    // purge past the lateness horizon; with lateness 0 a fired session
    // leaves state in the same batch it fired, as before
    (out.result(), sessions.filter(_._2 - 1 + allowedLatenessMs > wm))
  }

  def session(ds: Dataset[Ev], gapMs: Long,
              allowedLatenessMs: Long = 0L): Dataset[SessOut] = {
    implicit val o = Encoders.product[SessOut]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.STRING

    def handle(key: String, events: Iterator[Ev], state: GroupState[Buf]): Iterator[SessOut] = {
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MinValue }
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
        .map(e => (e.ts.getTime, e.value))
      val (out, sessions) = advance(key,
        state.getOption.map(_.sessions).getOrElse(Vector.empty),
        sorted, wm, gapMs, allowedLatenessMs)
      if (sessions.isEmpty) state.remove()
      else {
        state.update(Buf(sessions))
        // arm at the earliest actionable moment: fire point end-1 for
        // pending sessions, purge point end-1+lateness for fired ones —
        // minus one because Spark's EventTimeTimeout fires only when the
        // watermark STRICTLY exceeds the armed timestamp (see the
        // EventWindowState note for the wm == end-2 residual)
        val nextAction = sessions.map { case (_, en, _, _, pending) =>
          if (pending) en - 2 else en - 2 + allowedLatenessMs
        }.min
        state.setTimeoutTimestamp(math.max(nextAction, wm + 1))
      }
      out.iterator
    }

    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
