package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-window streaming heavy hitters: [[TopKState]]'s SpaceSaving
  * counters composed with event-time tumbling-window boundaries — the
  * Flink keyed-window + incremental-aggregate shape the reference
  * builds by hand (test/WindowTest.java:262-293 aggregates inside a
  * keyed event-time window; here the aggregate is a frequency sketch
  * and the window result is its top-k).
  *
  * Semantics: each (key, window) owns one SpaceSaving table (hard
  * bound: [[TopKState.Capacity]] counters). Events fold into their
  * window's table as they arrive (incremental, never buffered — the
  * AggregateFunction posture, not the ProcessWindowFunction one); when
  * the query watermark passes a window's end the window emits its
  * top-[[TopKState.EmitK]] rows ONCE (Append mode) and purges. A quiet
  * key fires through an armed EventTimeTimeout exactly like
  * [[EventWindowState]] (timer one below the fire point). In [[apply]],
  * events whose window already fired are DISCARDED — Flink's default
  * no-lateness window behavior; [[lateCarrier]] is the allowedLateness
  * composition with [[EventWindowState]]'s lifecycle (re-fire on
  * allowed-late arrivals, kind='late' side-output rows beyond it).
  *
  * State bound: ≤ Capacity counters per live (key, window), and live
  * windows per key are bounded by the out-of-orderness horizon /
  * window size — never by the stream or the item space. Determinism:
  * per-batch fold order is (ts, item)-sorted and eviction ties break
  * on (count, item), so replays reproduce tables bit-for-bit. */
object WindowedTopKState {

  final case class In(key: String, item: String, ts: java.sql.Timestamp)
  final case class WTab(windows: Map[Long, TopKState.Tab])
  final case class Out(key: String, windowStart: Long, rank: Long,
                       item: String, count: Long, err: Long, n: Long)

  def handle(sizeMs: Long)(key: String, events: Iterator[In],
      state: GroupState[WTab]): Iterator[Out] = {
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MinValue }
    var wtab = state.getOption.getOrElse(WTab(Map.empty))
    def maxTs(start: Long) = start + sizeMs - 1

    events.toSeq.sortBy(e => (e.ts.getTime, e.item)).foreach { e =>
      val tsMs = e.ts.getTime
      val start = tsMs - Math.floorMod(tsMs, sizeMs)
      if (maxTs(start) > wm) { // window still open; else discard
        val tab = wtab.windows.getOrElse(start, TopKState.Tab(Nil, 0L, 0L))
        wtab = WTab(wtab.windows + (start -> TopKState.add(tab, e.item)))
      }
    }

    val (closed, open) = wtab.windows.partition { case (start, _) => maxTs(start) <= wm }
    val out = closed.toSeq.sortBy(_._1).iterator.flatMap { case (start, tab) =>
      TopKState.top(tab).zipWithIndex.map { case (c, i) =>
        Out(key, start, i + 1L, c.item, c.count, c.err, tab.n)
      }
    }.toVector

    if (open.isEmpty) state.remove()
    else {
      state.update(WTab(open))
      // same arming discipline as EventWindowState.windowCore: Spark
      // fires EventTimeTimeout only when wm STRICTLY exceeds the armed
      // ts, and the fire condition is maxTs <= wm — arm one below
      state.setTimeoutTimestamp(math.max(open.keys.map(maxTs).min - 1, wm + 1))
    }
    out.iterator
  }

  /** [[In]] plus the watermark CARRIER column ([[EventWindowState.EvW]]'s
    * contract): `withWatermark` rides `wmTs` so late-by-event-time rows
    * REACH the operator and can re-fire or fan out, instead of being
    * dropped by the engine's upstream filter. */
  final case class InW(key: String, item: String, ts: java.sql.Timestamp,
                       wmTs: java.sql.Timestamp)
  /** Tagged output: kind='fire' (a window's top-k — possibly RE-fired
    * with updated counts after an allowed-late arrival) or kind='late'
    * (beyond watermark + lateness — the side-output row echoing the
    * event: rank 0, count 1). */
  final case class OutL(key: String, kind: String, windowStart: Long,
                        rank: Long, item: String, count: Long, err: Long, n: Long)
  /** per-window: (sketch table, pendingSinceLastFire) */
  final case class WTabL(windows: Map[Long, (TopKState.Tab, Boolean)])

  /** The allowedLateness composition the reference implies
    * (test/EventTimeTest.java:241-327 fire/re-fire/side-output rules
    * over test/WindowTest.java:262-293's incremental window aggregate):
    * [[EventWindowState]]'s window lifecycle with a SpaceSaving table as
    * the window payload. Fire emits the window's top-[[TopKState.EmitK]]
    * when the watermark passes the window end; an allowed-late event
    * folds in and RE-fires the updated top-k immediately (Update mode —
    * downstream replaces the window's rows); an event past
    * watermark + lateness on its window emits as a kind='late' row for a
    * SideOutputs.fanOut two-sink split. State bound unchanged: ≤
    * Capacity counters per live (key, window); windows now live
    * `allowedLatenessMs` longer before purge. */
  def lateCarrier(ds: Dataset[InW], sizeMs: Long,
                  allowedLatenessMs: Long): Dataset[OutL] = {
    implicit val o = Encoders.product[OutL]
    implicit val t = Encoders.product[WTabL]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(handleLate(sizeMs, allowedLatenessMs))
  }

  def handleLate(sizeMs: Long, latenessMs: Long)(key: String,
      events: Iterator[InW], state: GroupState[WTabL]): Iterator[OutL] = {
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MinValue }
    var buf = state.getOption.getOrElse(WTabL(Map.empty))
    val out = Vector.newBuilder[OutL]
    def maxTs(start: Long) = start + sizeMs - 1
    def fire(start: Long, tab: TopKState.Tab): Unit =
      TopKState.top(tab).zipWithIndex.foreach { case (c, i) =>
        out += OutL(key, "fire", start, i + 1L, c.item, c.count, c.err, tab.n)
      }

    val refire = scala.collection.mutable.SortedSet[Long]()
    events.toSeq.sortBy(e => (e.ts.getTime, e.item)).foreach { e =>
      val tsMs = e.ts.getTime
      val start = tsMs - Math.floorMod(tsMs, sizeMs)
      if (maxTs(start) + latenessMs <= wm) { // beyond lateness → side output
        out += OutL(key, "late", start, 0L, e.item, 1L, 0L, 0L)
      } else {
        val (tab0, _) = buf.windows.getOrElse(start, (TopKState.Tab(Nil, 0L, 0L), true))
        val tab = TopKState.add(tab0, e.item)
        if (maxTs(start) <= wm) { // allowed-late arrival → re-fire after the fold
          refire += start
          buf = WTabL(buf.windows + (start -> (tab, false)))
        } else buf = WTabL(buf.windows + (start -> (tab, true)))
      }
    }
    // ONE re-fire per touched already-fired window, with the post-fold
    // table: several allowed-late events for one window in a single batch
    // emit a single row-set (not one per event), so append-style
    // consumers of the Update stream never see same-batch duplicates of
    // a (key, windowStart, rank) coordinate.
    refire.foreach(start => fire(start, buf.windows(start)._1))
    // fire everything the watermark has passed, purge beyond lateness
    buf.windows.toSeq.sortBy(_._1).foreach { case (start, (tab, pending)) =>
      if (maxTs(start) <= wm && pending) {
        fire(start, tab)
        buf = WTabL(buf.windows + (start -> (tab, false)))
      }
    }
    buf = WTabL(buf.windows.filter { case (start, _) => maxTs(start) + latenessMs > wm })
    if (buf.windows.isEmpty) state.remove()
    else {
      state.update(buf)
      // same arming discipline as EventWindowState.windowCore: one below
      // the next fire/purge point, clamped strictly above the watermark
      val nextAction = buf.windows.map { case (st, (_, pending)) =>
        if (pending) maxTs(st) - 1 else maxTs(st) + latenessMs - 1
      }.min
      state.setTimeoutTimestamp(math.max(nextAction, wm + 1))
    }
    out.result().iterator
  }

  /** Event-time tumbling per-window top-k (Append mode). Input must
    * carry `withWatermark("ts", ...)` upstream. */
  def apply(ds: Dataset[In], sizeMs: Long): Dataset[Out] = {
    implicit val o = Encoders.product[Out]
    implicit val t = Encoders.product[WTab]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle(sizeMs))
  }

  val outputMode: OutputMode = OutputMode.Append()
}
