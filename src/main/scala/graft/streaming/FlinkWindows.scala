package graft.streaming

import scala.collection.mutable

/** Flink-exact event-time window semantics (reference:
  * test/EventTimeTest.java:166-178 — drop iff windowEnd + allowedLateness
  * <= watermark, fire iff windowEnd <= watermark, where "windowEnd" is the
  * window's max timestamp, end-1; allowed-late arrivals RE-FIRE the window
  * with its full contents; session windows merge on overlap,
  * test/WindowTest.java:205-242).
  *
  * This is the semantic core of W7/W9/W10/W8: a deterministic single-key-
  * partition state machine. In Structured Streaming it runs inside
  * `flatMapGroupsWithState` (one instance per key, exactly Flink's keyed
  * window operator); here it is a pure engine so the reference's
  * hand-traced golden tables are directly assertable. Spark's native
  * `withWatermark + window` covers the common fast path (W7/W11) with
  * whole-stage codegen; this engine exists for the semantics Spark lacks:
  * per-record watermarks, allowedLateness re-fires, and late side output.
  *
  * State size per key is bounded by windows-within-lateness-horizon; at
  * 100 TB the key space shards across executors like any keyed state.
  */
object FlinkWindows {

  /** Input event: watermarkAfter < 0 means "no watermark emitted". */
  final case class Event[K](key: K, value: Int, ts: Long, watermarkAfter: Long)

  /** Fired window result (sum-aggregate form, what the traces assert). */
  final case class Fired[K](key: K, windowStart: Long, windowEnd: Long, sum: Int, count: Int)

  final case class Result[K](fired: Vector[Fired[K]], late: Vector[Event[K]])

  /** Tumbling event-time windows of `sizeMs` with `allowedLatenessMs`;
    * late-beyond-allowed events go to `Result.late` (the side output).
    * `finalFire` = emit a Long.MaxValue watermark at end of input (Flink's
    * end-of-bounded-stream behavior). */
  def tumbling[K](events: Seq[Event[K]], sizeMs: Long,
                  allowedLatenessMs: Long = 0L,
                  finalFire: Boolean = true): Result[K] = {
    // (key, windowStart) -> (values, pendingSinceLastFire)
    val windows = mutable.LinkedHashMap[(K, Long), (mutable.ArrayBuffer[Int], Boolean)]()
    var watermark = Long.MinValue
    val fired = Vector.newBuilder[Fired[K]]
    val late = Vector.newBuilder[Event[K]]

    def maxTs(start: Long): Long = start + sizeMs - 1

    def fireEligible(wm: Long): Unit = {
      // fire in (key-independent) window-start order for determinism
      val eligible = windows.toSeq
        .filter { case ((_, start), (_, pending)) => maxTs(start) <= wm && pending }
        .sortBy { case ((_, start), _) => start }
      eligible.foreach { case ((k, start), (buf, _)) =>
        fired += Fired(k, start, start + sizeMs, buf.sum, buf.size)
        windows((k, start)) = (buf, false)
      }
      // purge windows past the lateness horizon
      windows.filterInPlace { case ((_, start), _) => maxTs(start) + allowedLatenessMs > wm }
    }

    events.foreach { e =>
      val start = e.ts - Math.floorMod(e.ts, sizeMs)
      if (maxTs(start) + allowedLatenessMs <= watermark) {
        late += e // dropped: beyond watermark + allowed lateness
      } else {
        val (buf, _) = windows.getOrElseUpdate((e.key, start), (mutable.ArrayBuffer[Int](), true))
        buf += e.value
        windows((e.key, start)) = (buf, true)
        // allowed-late arrival into an already-passed window → immediate re-fire
        if (maxTs(start) <= watermark) {
          fired += Fired(e.key, start, start + sizeMs, buf.sum, buf.size)
          windows((e.key, start)) = (buf, false)
        }
      }
      if (e.watermarkAfter >= 0 && e.watermarkAfter > watermark) {
        watermark = e.watermarkAfter
        fireEligible(watermark)
      }
    }
    if (finalFire) fireEligible(Long.MaxValue)
    Result(fired.result(), late.result())
  }

  /** Event-time session windows with `gapMs` (merge-on-overlap, fire when
    * the watermark passes sessionEnd-1; reference trace
    * test/WindowTest.java:222-242). */
  def session[K](events: Seq[Event[K]], gapMs: Long,
                 finalFire: Boolean = true): Result[K] = {
    final case class Sess(var start: Long, var end: Long,
                          values: mutable.ArrayBuffer[Int])
    val sessions = mutable.LinkedHashMap[K, mutable.ArrayBuffer[Sess]]()
    var watermark = Long.MinValue
    val fired = Vector.newBuilder[Fired[K]]
    val late = Vector.newBuilder[Event[K]]

    def fireEligible(wm: Long): Unit = {
      val eligible = sessions.toSeq
        .flatMap { case (k, ss) => ss.filter(_.end - 1 <= wm).map(k -> _) }
        .sortBy { case (_, s) => s.start }
      eligible.foreach { case (k, s) =>
        fired += Fired(k, s.start, s.end, s.values.sum, s.values.size)
        sessions(k) -= s
      }
    }

    events.foreach { e =>
      // read-only lookup for the overlap test: a key whose events are all
      // late must NOT acquire a permanent empty entry (unbounded state
      // growth for late-only keys); the entry is created in the keep
      // branch below only
      val existing = sessions.get(e.key)
      val s = Sess(e.ts, e.ts + gapMs, mutable.ArrayBuffer(e.value))
      // merge every overlapping session (TimeWindow.intersects semantics)
      val overlapping = existing.fold(Seq.empty[Sess])(
        _.filter(o => s.start <= o.end && o.start <= s.end).toSeq)
      // Flink applies the lateness test to the POST-merge window
      // (WindowOperator: mergeWindows first, then isWindowLate on the
      // actual window): an event whose own gap window has passed the
      // watermark is KEPT when it merges into a still-open session.
      val mergedEnd = (s.end +: overlapping.map(_.end)).max
      if (mergedEnd - 1 <= watermark) late += e
      else {
        val ss = sessions.getOrElseUpdate(e.key, mutable.ArrayBuffer[Sess]())
        overlapping.foreach { o =>
          s.start = Math.min(s.start, o.start)
          s.end = Math.max(s.end, o.end)
          s.values ++= o.values
          ss -= o
        }
        ss += s
      }
      if (e.watermarkAfter >= 0 && e.watermarkAfter > watermark) {
        watermark = e.watermarkAfter
        fireEligible(watermark)
      }
    }
    if (finalFire) fireEligible(Long.MaxValue)
    Result(fired.result(), late.result())
  }

  /** Event-time SLIDING windows of `sizeMs` every `slideMs` with
    * `allowedLatenessMs` — Flink's `SlidingEventTimeWindows` assignment
    * (an event at ts joins every window with start in
    * (ts − size, ts] aligned to the slide; size/slide windows per
    * event), with the SAME fire / drop / allowed-late-re-fire /
    * side-output rules as [[tumbling]] applied per assigned window.
    * `sliding(size, size)` degenerates to `tumbling(size)` exactly —
    * FlinkWindowsSpec pins that identity. */
  def sliding[K](events: Seq[Event[K]], sizeMs: Long, slideMs: Long,
                 allowedLatenessMs: Long = 0L,
                 finalFire: Boolean = true): Result[K] = {
    require(sizeMs % slideMs == 0, "size must be a slide multiple")
    val windows = mutable.LinkedHashMap[(K, Long), (mutable.ArrayBuffer[Int], Boolean)]()
    var watermark = Long.MinValue
    val fired = Vector.newBuilder[Fired[K]]
    val late = Vector.newBuilder[Event[K]]

    def maxTs(start: Long): Long = start + sizeMs - 1
    def starts(ts: Long): Seq[Long] = {
      val lastStart = ts - Math.floorMod(ts, slideMs)
      (0 until (sizeMs / slideMs).toInt).map(i => lastStart - i * slideMs)
    }

    def fireEligible(wm: Long): Unit = {
      val eligible = windows.toSeq
        .filter { case ((_, start), (_, pending)) => maxTs(start) <= wm && pending }
        .sortBy { case ((_, start), _) => start }
      eligible.foreach { case ((k, start), (buf, _)) =>
        fired += Fired(k, start, start + sizeMs, buf.sum, buf.size)
        windows((k, start)) = (buf, false)
      }
      windows.filterInPlace { case ((_, start), _) => maxTs(start) + allowedLatenessMs > wm }
    }

    events.foreach { e =>
      val assigned = starts(e.ts)
      // Flink tests lateness per assigned window: the event reaches the
      // side output only if EVERY window it belongs to has passed
      // (an event late for its oldest pane but live in a newer one is
      // not late — the newest pane always ends after ts)
      val live = assigned.filter(start => maxTs(start) + allowedLatenessMs > watermark)
      if (live.isEmpty) late += e
      else live.sorted.foreach { start => // ascending start: re-fires order like fireEligible
        val (buf, _) = windows.getOrElseUpdate((e.key, start), (mutable.ArrayBuffer[Int](), true))
        buf += e.value
        windows((e.key, start)) = (buf, true)
        if (maxTs(start) <= watermark) {
          fired += Fired(e.key, start, start + sizeMs, buf.sum, buf.size)
          windows((e.key, start)) = (buf, false)
        }
      }
      if (e.watermarkAfter >= 0 && e.watermarkAfter > watermark) {
        watermark = e.watermarkAfter
        fireEligible(watermark)
      }
    }
    if (finalFire) fireEligible(Long.MaxValue)
    Result(fired.result(), late.result())
  }
}
