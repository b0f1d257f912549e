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

  // ——— allowedLateness on MERGED session windows ———————————————————————

  /** Input for [[lateCarrier]]: watermark rides the separate `wmTs`
    * carrier column (as in [[WindowedTopKState.InW]]) so late `ts`
    * values reach the operator instead of being filtered upstream. */
  final case class InL(key: String, item: String,
                       ts: java.sql.Timestamp, wmTs: java.sql.Timestamp)
  /** `fired` = this session's current extent has been emitted; any fold
    * resets it, because a touched session has a new result to emit. */
  final case class SessL(start: Long, lastTs: Long, tab: TopKState.Tab,
                         fired: Boolean)
  final case class BufL(sessions: List[SessL])
  final case class OutL(key: String, kind: String, sessionStart: Long,
                        sessionEnd: Long, rank: Long, item: String,
                        count: Long, err: Long, n: Long)

  /** The genuinely hard cell of the lateness matrix — allowedLateness on
    * MERGING windows (the reference's session-merge walkthrough,
    * test/WindowTest.java:205-242, composed with
    * test/EventTimeTest.java:241-327's fire/re-fire/side-output rules):
    * a fired session is RETAINED for `allowedLatenessMs` past its end,
    * and an allowed-late event can extend it, or BRIDGE two fired
    * sessions into one — fusing their sketch tables via
    * [[TopKState.merge]] — and the fused session re-fires under its
    * merged coordinates.
    *
    * Rules (Update mode):
    *   - fire: watermark passes an unfired session's end → emit top-k,
    *     retain the session `fired` until end + lateness passes.
    *   - allowed-late fold: an event overlapping any RETAINED session
    *     (fired or open) fuses with all sessions its reach bridges;
    *     folding resets `fired`, so a fused session whose (possibly
    *     extended) end is already past the watermark re-fires ONCE in
    *     the post-fold pass with the merged table — several late events
    *     for one session in a batch emit one row-set (the
    *     [[WindowedTopKState.handleLate]] batching discipline). A fused
    *     session extended BEYOND the watermark fires later at its new
    *     end; its result supersedes the parents' under the fused
    *     coordinates, exactly as a Flink merged window's does.
    *   - beyond lateness: an event whose own window [ts, ts+gap)
    *     overlaps nothing retained and ends more than `lateness` below
    *     the watermark emits as a kind='late' side-output row. (Overlap
    *     RESCUES an event — merging extends the window, Flink's
    *     isWindowLate-after-merge rule — so only the no-overlap case
    *     can be too late.)
    *
    * State bound: ≤ Capacity counters per RETAINED session; fired
    * sessions linger `allowedLatenessMs` past end, so the open-session
    * bound of [[handle]] gains a +lateness/gap term — still
    * horizon-bounded, never data-bounded. */
  def handleLate(gapMs: Long, latenessMs: Long)(key: String,
      events: Iterator[InL], state: GroupState[BufL]): Iterator[OutL] = {
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MinValue }
    var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
    def endOf(start: Long, lastTs: Long) = lastTs + gapMs
    val out = Vector.newBuilder[OutL]

    events.toSeq.sortBy(e => (e.ts.getTime, e.item)).foreach { e =>
      val tsMs = e.ts.getTime
      val (overlap, disjoint) = sessions.partition(s =>
        tsMs < s.lastTs + gapMs && s.start < tsMs + gapMs)
      if (overlap.isEmpty && tsMs + gapMs - 1 + latenessMs <= wm) {
        // its own window is already past end+lateness and nothing
        // retained can rescue it by merging → side output
        out += OutL(key, "late", tsMs, tsMs + gapMs, 0L, e.item, 1L, 0L, 0L)
      } else {
        val fusedTab = overlap.sortBy(_.start).map(_.tab)
          .reduceOption(TopKState.merge)
          .getOrElse(TopKState.Tab(Nil, 0L, 0L))
        val fused = SessL(
          (tsMs :: overlap.map(_.start)).min,
          (tsMs :: overlap.map(_.lastTs)).max,
          TopKState.add(fusedTab, e.item),
          fired = false) // touched ⇒ new content to emit at its fire point
        sessions = fused :: disjoint
      }
    }

    // fire pass: every ended-and-unfired session emits exactly once —
    // first fires and late re-fires ride the same emission
    val (ended, open) = sessions.partition(s => endOf(s.start, s.lastTs) - 1 <= wm)
    ended.filter(!_.fired).sortBy(_.start).foreach { s =>
      TopKState.top(s.tab).zipWithIndex.foreach { case (c, i) =>
        out += OutL(key, "fire", s.start, endOf(s.start, s.lastTs),
          i + 1L, c.item, c.count, c.err, s.tab.n)
      }
    }
    // retain fired sessions through their lateness horizon, then purge
    val retained = ended.map(_.copy(fired = true))
      .filter(s => endOf(s.start, s.lastTs) - 1 + latenessMs > wm) ::: open

    if (retained.isEmpty) state.remove()
    else {
      state.update(BufL(retained))
      // next action per session: unfired → its fire point (end-1), fired
      // → its purge point (end-1+lateness); arm one below, above wm
      val nextAction = retained.map { s =>
        val end1 = endOf(s.start, s.lastTs) - 1
        if (s.fired) end1 + latenessMs else end1
      }.min
      state.setTimeoutTimestamp(math.max(nextAction - 1, wm + 1))
    }
    out.result().iterator
  }

  /** Event-time session top-k with allowedLateness (Update mode). Input
    * must carry `withWatermark("wmTs", ...)` upstream. */
  def lateCarrier(ds: Dataset[InL], gapMs: Long,
                  allowedLatenessMs: Long): Dataset[OutL] = {
    implicit val o = Encoders.product[OutL]
    implicit val b = Encoders.product[BufL]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(handleLate(gapMs, allowedLatenessMs))
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
