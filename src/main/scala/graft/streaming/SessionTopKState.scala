package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session-windowed streaming heavy hitters — the last cell of the
  * window-kind × sketch-aggregate matrix: the reference's session-merge
  * walkthrough (test/WindowTest.java:205-242 — EventTimeSessionWindows
  * `withGap`, where a bridging event MERGES two open sessions) composed
  * with the SpaceSaving aggregate of [[TopKState]] / the tumbling
  * [[WindowedTopKState]].
  *
  * Semantics: per key, an event at `ts` opens (or extends) a session
  * reaching to `ts + gap`; any open sessions its reach overlaps are
  * fused into one — and their sketch TABLES merge too, via
  * [[TopKState.merge]] (counter union + deterministic truncation, the
  * Mergeable Summaries bound), so the fused session's top-k accounts
  * for every event of both parents within the same Capacity-counter
  * budget. When the watermark passes a session's end (last event + gap)
  * it fires its top-[[TopKState.EmitK]] ONCE (Append mode) and purges —
  * Flink's no-lateness default; beyond-watermark events are dropped by
  * the engine's upstream filter since the watermark rides `ts` itself.
  *
  * State bound: ≤ [[TopKState.Capacity]] counters per OPEN session;
  * merging strictly reduces session count, and open sessions per key
  * are bounded by the watermark horizon / gap (disjoint open sessions
  * are ≥ gap apart). Determinism: per-batch fold order is (ts, item)-
  * sorted, overlap scans run in session-start order, and merge/eviction
  * ties break on (count, err, item) — replays reproduce tables
  * bit-for-bit, which [[CheckpointRestartSpec]] relies on. */
object SessionTopKState {

  final case class In(key: String, item: String, ts: java.sql.Timestamp)
  /** One open session: [start, lastTs + gap) with its sketch table. */
  final case class Sess(start: Long, lastTs: Long, tab: TopKState.Tab)
  final case class Buf(sessions: List[Sess])
  final case class Out(key: String, sessionStart: Long, sessionEnd: Long,
                       rank: Long, item: String, count: Long, err: Long, n: Long)

  def handle(gapMs: Long)(key: String, events: Iterator[In],
      state: GroupState[Buf]): Iterator[Out] = {
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MinValue }
    var sessions = state.getOption.map(_.sessions).getOrElse(Nil)

    events.toSeq.sortBy(e => (e.ts.getTime, e.item)).foreach { e =>
      val tsMs = e.ts.getTime
      // the event's reach is [tsMs, tsMs + gap); an open session
      // [s.start, s.lastTs + gap) overlapping it fuses with it
      val (overlap, disjoint) = sessions.partition(s =>
        tsMs < s.lastTs + gapMs && s.start < tsMs + gapMs)
      val fusedTab = overlap.sortBy(_.start).map(_.tab)
        .reduceOption(TopKState.merge)
        .getOrElse(TopKState.Tab(Nil, 0L, 0L))
      val fused = Sess(
        (tsMs :: overlap.map(_.start)).min,
        (tsMs :: overlap.map(_.lastTs)).max,
        TopKState.add(fusedTab, e.item))
      sessions = fused :: disjoint
    }

    def endOf(s: Sess) = s.lastTs + gapMs
    val (closed, open) = sessions.partition(s => endOf(s) - 1 <= wm)
    val out = closed.sortBy(_.start).flatMap { s =>
      TopKState.top(s.tab).zipWithIndex.map { case (c, i) =>
        Out(key, s.start, endOf(s), i + 1L, c.item, c.count, c.err, s.tab.n)
      }
    }

    if (open.isEmpty) state.remove()
    else {
      state.update(Buf(open))
      // fire condition is end - 1 <= wm; EventTimeTimeout fires when wm
      // STRICTLY exceeds the armed ts — arm one below, clamped above wm
      state.setTimeoutTimestamp(math.max(open.map(endOf).min - 2, wm + 1))
    }
    out.iterator
  }

  /** Event-time session-window top-k (Append mode). Input must carry
    * `withWatermark("ts", ...)` upstream. */
  def apply(ds: Dataset[In], gapMs: Long): Dataset[Out] = {
    implicit val o = Encoders.product[Out]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle(gapMs))
  }

  val outputMode: OutputMode = OutputMode.Append()
}
