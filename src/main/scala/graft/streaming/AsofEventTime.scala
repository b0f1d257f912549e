package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** OUT-OF-ORDER-correct streaming as-of join: the event-time deployment
  * of [[AsofState]], closing that operator's documented ordering caveat
  * the way a Flink pipeline would (bounded disorder absorbed by the
  * watermark — reference's event-time machinery:
  * test/EventTimeTest.java:60-166; the buffering pattern here is the
  * house [[EventWindowState]] idiom).
  *
  * [[AsofState]] requires in-order arrival ACROSS micro-batches; this
  * operator instead BUFFERS every event in keyed state until the
  * query's watermark passes its timestamp, then processes ripe events
  * in (ts, id) order through the same latest-touch machine. With
  * disorder bounded by the upstream `withWatermark` delay, no event
  * older than the watermark can still arrive, so ripe processing is
  * final — the emitted attributions match the batch operator exactly,
  * whatever the arrival order. An EventTimeTimeout is armed at the
  * earliest buffered timestamp so ripe events flush when the watermark
  * advances even if the user's key sees no further traffic.
  *
  * State per user = the latest ripe touch (O(1), kept indefinitely — a
  * purchase attributes to a touch however old) + the events inside one
  * watermark horizon (bounded by per-user traffic × delay, the same
  * bound every watermarked stateful operator carries). */
object AsofEventTime {

  /** `ts` stays TimestampType — the watermark tag follows the
    * event-time column (same rule as [[EventWindowState.Ev]]). */
  final case class Ev(eventId: Long, userId: Long, eventType: String,
                      ts: java.sql.Timestamp, value: Double)
  /** Buffered form: epoch MICROS (the attribution's total order is
    * microsecond-exact; the watermark comparison alone is ms). */
  final case class PEv(eventId: Long, eventType: String, tsUs: Long, value: Double)
  final case class Buf(touch: Option[AsofState.Touch], pending: Seq[PEv])

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private[streaming] def handle(key: Long, events: Iterator[Ev],
      state: GroupState[Buf]): Iterator[AsofState.Attribution] = {
    // batch runs have no watermark (the getter throws): everything is
    // ripe immediately — the operator degrades to the batch semantics
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MaxValue }
    val buf0 = state.getOption.getOrElse(Buf(None, Vector.empty))
    val incoming = events.map(e => PEv(e.eventId, e.eventType, micros(e.ts), e.value))
    val (ripe, still) = (buf0.pending ++ incoming)
      .partition(e => e.tsUs / 1000 <= wm)
    var latest = buf0.touch
    val out = Vector.newBuilder[AsofState.Attribution]
    ripe.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      if (e.eventType == "purchase")
        out += AsofState.Attribution(e.eventId, key, e.tsUs, e.value,
          latest.map(_.id), latest.map(_.tpe), latest.map(_.tsUs),
          latest.map(t => e.tsUs - t.tsUs))
      else if (latest.forall(AsofState.before(_, e.tsUs, e.eventId)))
        latest = Some(AsofState.Touch(e.eventId, e.eventType, e.tsUs))
    }
    state.update(Buf(latest, still))
    if (still.nonEmpty) {
      // ripe condition is tsMs <= wm and Spark fires an EventTimeTimeout
      // only when the watermark STRICTLY exceeds the armed timestamp —
      // arm one ms below the earliest pending ts (clamped above the
      // current watermark, per Spark's contract), same arithmetic as
      // EventWindowState
      val next = still.map(_.tsUs / 1000).min - 1
      state.setTimeoutTimestamp(math.max(next, wm + 1))
    }
    out.result().iterator
  }

  /** `ds` must carry only view/click/purchase events and have
    * `withWatermark` applied to `ts` upstream with a delay covering the
    * stream's disorder bound. */
  def apply(ds: Dataset[Ev]): Dataset[AsofState.Attribution] = {
    implicit val o = Encoders.product[AsofState.Attribution]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.scalaLong
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
