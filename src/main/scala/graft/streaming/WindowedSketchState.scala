package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-window streaming cardinality: [[SketchState]]'s HyperLogLog
  * registers composed with event-time tumbling-window boundaries — the
  * "distinct users per hour per key" staple, under the same contract as
  * [[WindowedTopKState]]: each (key, window) owns one fixed-size
  * register array, items fold incrementally (never buffered), the
  * window emits its estimate ONCE when the query watermark passes its
  * end (Append mode), then purges; quiet keys fire via the armed
  * EventTimeTimeout; post-fire arrivals are discarded (no-lateness
  * Flink default — the lateness machinery is [[EventWindowState]]'s).
  *
  * State bound: 2^P bytes per live (key, window); live windows per key
  * are bounded by the out-of-orderness horizon / window size — never by
  * the stream or the item space. The register array is pointwise-max
  * mergeable, so replays and cross-partition unions commute — fold
  * order cannot change the emitted estimate (stronger determinism than
  * the top-k machine needs its sorted fold for). */
object WindowedSketchState {

  final case class In(key: String, item: Long, ts: java.sql.Timestamp)
  final case class WRegs(windows: Map[Long, Array[Byte]])
  final case class Out(key: String, windowStart: Long, estimate: Long)

  def handle(sizeMs: Long)(key: String, events: Iterator[In],
      state: GroupState[WRegs]): Iterator[Out] = {
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MinValue }
    var w = state.getOption.getOrElse(WRegs(Map.empty))
    def maxTs(start: Long) = start + sizeMs - 1

    events.foreach { e =>
      val tsMs = e.ts.getTime
      val start = tsMs - Math.floorMod(tsMs, sizeMs)
      if (maxTs(start) > wm) { // window still open; else discard
        val regs = w.windows.getOrElse(start, SketchState.emptyRegs())
        w = WRegs(w.windows + (start -> SketchState.add(regs.clone(), e.item)))
      }
    }

    val (closed, open) = w.windows.partition { case (start, _) => maxTs(start) <= wm }
    val out = closed.toSeq.sortBy(_._1).map { case (start, regs) =>
      Out(key, start, SketchState.estimate(regs))
    }

    if (open.isEmpty) state.remove()
    else {
      state.update(WRegs(open))
      // one-below arming, same discipline as EventWindowState.windowCore
      state.setTimeoutTimestamp(math.max(open.keys.map(maxTs).min - 1, wm + 1))
    }
    out.iterator
  }

  /** Event-time tumbling per-window cardinality (Append mode). Input
    * must carry `withWatermark("ts", ...)` upstream. */
  def apply(ds: Dataset[In], sizeMs: Long): Dataset[Out] = {
    implicit val o = Encoders.product[Out]
    implicit val r = Encoders.product[WRegs]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle(sizeMs))
  }

  val outputMode: OutputMode = OutputMode.Append()
}
