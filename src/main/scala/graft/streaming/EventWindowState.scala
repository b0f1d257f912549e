package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink-faithful event-time tumbling windows WITH allowedLateness and
  * late side output, as a real Structured Streaming operator — the
  * streaming deployment of the FlinkWindows semantics (W7/W9/W10;
  * fire/drop rules per reference test/EventTimeTest.java:166-178).
  *
  * Spark's native `window()` aggregation cannot re-fire for allowed-late
  * rows or route dropped-late rows; this operator can, because it holds
  * the window buffers itself in GroupState and reads the query's
  * event-time watermark via `state.getCurrentWatermarkMs()` (the input
  * must carry `withWatermark` upstream). An EventTimeTimeout is armed at
  * the earliest pending window end so windows fire when the watermark
  * passes even if the key receives no further data.
  *
  * Output rows are tagged: kind='fire' (window result, possibly re-fired
  * with updated contents — Flink's allowedLateness re-fire) or
  * kind='late' (beyond watermark + lateness — the side output). State per
  * key is bounded by windows inside the lateness horizon.
  *
  * Late-side-output delta (W10), two deployments:
  *   - [[tumbling]] (watermark on `ts` itself): Spark's engine drops
  *     beyond-watermark rows before they reach this operator, so set the
  *     upstream watermark delay to outOfOrderBound + allowedLateness
  *     (the SURVEY §7.4 fold) — the engine's drop boundary then
  *     coincides with Flink's and dropped-late rows are observable via
  *     the numRowsDroppedByWatermark metric (a count, not rows).
  *   - [[tumblingCarrier]] (watermark on a source-controlled carrier
  *     column): late rows REACH the operator and emerge as kind='late'
  *     rows, so a foreachBatch fan-out (SideOutputs.fanOut) reproduces
  *     the reference's sideOutputLateData main+late two-sink pipeline
  *     end-to-end (LateFanoutSpec replays the full
  *     test/EventTimeTest.java:329-428 trace).
  * In BATCH runs (no engine filter) the kind='late' path emits the side
  * output exactly like the FlinkWindows trace engine.
  */
object EventWindowState {

  /** `ts` stays TimestampType end-to-end — the watermark tag follows the
    * event-time column, so projecting it to a long would strip the
    * watermark and break EventTimeTimeout. */
  final case class Ev(key: String, value: Long, ts: java.sql.Timestamp)

  /** [[Ev]] plus a watermark CARRIER column for [[tumblingCarrier]]:
    * `wmTs` (the withWatermark column) carries the watermark the source
    * has attested for this row — Flink's collectWithTimestamp +
    * emitWatermark contract, where the source controls the watermark
    * independently of (and possibly ahead of) event time — while the
    * operator windows on the real `ts`. */
  final case class EvW(key: String, value: Long, ts: java.sql.Timestamp,
                       wmTs: java.sql.Timestamp)
  final case class WinOut(key: String, kind: String, windowStart: Long,
                          sum: Long, count: Long, tsMs: Long)
  /** per-window-start: (sum, count, pendingSinceLastFire) */
  final case class Buf(windows: Map[Long, (Long, Long, Boolean)])

  def tumbling(ds: Dataset[Ev], sizeMs: Long, allowedLatenessMs: Long = 0L): Dataset[WinOut] = {
    implicit val o = Encoders.product[WinOut]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.STRING

    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        handleCore(sizeMs, allowedLatenessMs))
  }

  /** Event-time SLIDING windows as a live streaming operator — the
    * `flatMapGroupsWithState` deployment of `FlinkWindows.sliding`
    * (reference semantics: test/WindowTest.java:152-203 SlidingEventTime
    * assignment × test/EventTimeTest.java:166-178 fire/lateness rules).
    * An event at ts joins every pane with start in (ts − size, ts]
    * aligned to `slideMs`; fire / allowed-late-re-fire / purge are
    * applied PER PANE, and the lateness test is pane-aware: the event
    * reaches the late side output only when EVERY pane it belongs to has
    * passed watermark + lateness. Same carrier-watermark contract as
    * [[tumblingCarrier]] (watermark rides `wmTs`, windows ride `ts`), so
    * late-by-event-time rows reach the operator and emerge as
    * kind='late' ROWS for a SideOutputs.fanOut two-sink split.
    * State per key: one (sum, count, pending) per live pane — bounded by
    * (lateness horizon + size) / slide panes per active key. */
  def slidingCarrier(ds: Dataset[EvW], sizeMs: Long, slideMs: Long,
                     allowedLatenessMs: Long = 0L): Dataset[WinOut] = {
    require(sizeMs % slideMs == 0, "size must be a slide multiple")
    implicit val o = Encoders.product[WinOut]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.STRING
    val panes = (sizeMs / slideMs).toInt
    def assign(tsMs: Long): Seq[Long] = {
      val lastStart = tsMs - Math.floorMod(tsMs, slideMs)
      (0 until panes).map(i => lastStart - i * slideMs)
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, es: Iterator[EvW], st: GroupState[Buf]) =>
          windowCore(sizeMs, allowedLatenessMs, assign)(
            key, es.map(e => Ev(e.key, e.value, e.ts)), st)
      }
  }

  /** [[tumbling]] over a watermark-CARRIER stream: `withWatermark` rides
    * [[EvW]]'s `wmTs` (source-attested watermark, Flink's emitWatermark
    * contract) while windowing stays on the real `ts`. Because the
    * engine's beyond-watermark filter tests the CARRIER (inclusively:
    * carrier <= watermark drops) — and a source sets it strictly ahead
    * of the watermark for every row it wants delivered —
    * late-by-event-time rows actually REACH the operator and come out as
    * kind='late' ROWS (the sideOutputLateData stream), rather than being
    * counted into numRowsDroppedByWatermark upstream as with [[tumbling]]
    * under the folded-delay deployment (see the class note). */
  def tumblingCarrier(ds: Dataset[EvW], sizeMs: Long,
                      allowedLatenessMs: Long = 0L): Dataset[WinOut] = {
    implicit val o = Encoders.product[WinOut]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, es: Iterator[EvW], st: GroupState[Buf]) =>
          handleCore(sizeMs, allowedLatenessMs)(key, es.map(e => Ev(e.key, e.value, e.ts)), st)
      }
  }

  private def handleCore(sizeMs: Long, allowedLatenessMs: Long)(
      key: String, events: Iterator[Ev], state: GroupState[Buf]): Iterator[WinOut] =
    windowCore(sizeMs, allowedLatenessMs,
      tsMs => Seq(tsMs - Math.floorMod(tsMs, sizeMs)))(key, events, state)

  /** Shared fire / re-fire / purge / timer core, parameterized by the
    * window-ASSIGNMENT function (tumbling → one start; sliding →
    * size/slide starts). The lateness test is per assigned window: the
    * event goes to the side output only when every assigned window has
    * passed watermark + lateness (for tumbling's single window this is
    * exactly the W9 drop rule). */
  private def windowCore(sizeMs: Long, allowedLatenessMs: Long,
                         assign: Long => Seq[Long])(
      key: String, events: Iterator[Ev], state: GroupState[Buf]): Iterator[WinOut] = {
      // batch runs have no watermark (the getter throws): everything is
      // on-time and nothing fires until an explicit watermark exists
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MinValue }
      var buf = state.getOption.getOrElse(Buf(Map.empty))
      val out = Vector.newBuilder[WinOut]
      def maxTs(start: Long) = start + sizeMs - 1

      events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        val tsMs = e.ts.getTime
        val live = assign(tsMs).filter(start => maxTs(start) + allowedLatenessMs > wm)
        if (live.isEmpty) { // every assigned window passed → side output
          out += WinOut(key, "late", assign(tsMs).max, e.value, 1L, tsMs)
        } else live.sorted.foreach { start =>
          val (s0, c0, _) = buf.windows.getOrElse(start, (0L, 0L, true))
          val merged = (s0 + e.value, c0 + 1, true)
          buf = Buf(buf.windows + (start -> merged))
          if (maxTs(start) <= wm) { // allowed-late arrival → immediate re-fire
            out += WinOut(key, "fire", start, merged._1, merged._2, maxTs(start))
            buf = Buf(buf.windows + (start -> (merged._1, merged._2, false)))
          }
        }
      }
      // fire everything the watermark has passed, purge beyond lateness
      buf.windows.toSeq.sortBy(_._1).foreach { case (start, (s0, c0, pending)) =>
        if (maxTs(start) <= wm && pending) {
          out += WinOut(key, "fire", start, s0, c0, maxTs(start))
          buf = Buf(buf.windows + (start -> (s0, c0, false)))
        }
      }
      buf = Buf(buf.windows.filter { case (start, _) => maxTs(start) + allowedLatenessMs > wm })
      if (buf.windows.isEmpty) state.remove()
      else {
        state.update(buf)
        // arm a timer at the earliest ACTIONABLE moment. Spark fires an
        // EventTimeTimeout only when the watermark STRICTLY exceeds the
        // armed timestamp, and the fire/purge conditions are
        // maxTs <= wm / maxTs + lateness <= wm — so arm one ms BELOW the
        // Flink action point: the timeout then fires at exactly the first
        // watermark that satisfies the condition, not one step later.
        val nextAction = buf.windows.map { case (st, (_, _, pending)) =>
          if (pending) maxTs(st) - 1 else maxTs(st) + allowedLatenessMs - 1
        }.min
        // Residual of Spark's contract (timeout timestamp must be > current
        // watermark): when wm == maxTs - 1 the clamp arms at maxTs, and the
        // strict-exceed rule then fires at wm == maxTs + 1 — one step past
        // the Flink point for a key that sees no further events. The -1
        // arming above is exact in every other case; do not assume it is
        // exact here. (Same pattern in SessionWindowState.)
        state.setTimeoutTimestamp(math.max(nextAction, wm + 1))
      }
      out.result().iterator
  }
}
