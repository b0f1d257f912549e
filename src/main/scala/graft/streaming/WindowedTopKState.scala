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
  * [[EventWindowState]] (timer one below the fire point). Events whose
  * window already fired are DISCARDED — Flink's default no-lateness
  * window behavior; the allowedLateness/side-output machinery is
  * [[EventWindowState]]'s surface, deliberately not duplicated here.
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
