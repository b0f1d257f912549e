package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP: the `pattern_match` three-clause sequence
  * (view → purchase within 1 h, vetoed by an intervening error) run
  * continuously per user with OUT-OF-ORDER tolerance — the Flink-CEP
  * deployment shape (`begin.notFollowedBy.followedBy.within` on a keyed
  * stream), built from the house watermark-buffering idiom
  * ([[AsofEventTime]]): events buffer in keyed state until the query
  * watermark passes them, then feed a sequential pattern machine in
  * (ts, event_id) order, so ripe processing is final and the emitted
  * matches equal the batch operator whatever the arrival order.
  *
  * The pattern machine is O(open anchors): a view opens an anchor; the
  * FIRST later purchase resolves every open anchor (emitting those
  * inside the horizon); an error vetoes every open anchor. Anchors
  * whose horizon the watermark has passed can never match a future
  * purchase and are dropped — with the pending buffer's watermark
  * bound, per-user state is O(traffic within one horizon), never
  * O(stream).
  *
  * Tie semantics: equal per-user timestamps resolve by event_id in the
  * sequence order while the batch veto compares raw timestamps, so the
  * two forms agree whenever per-user event times are unique (the
  * microsecond-timestamped fixture satisfies this; PatternStateSpec
  * asserts the premise before asserting equality). */
object PatternState {

  final case class Ev(eventId: Long, userId: Long, eventType: String,
                      ts: java.sql.Timestamp)
  final case class PEv(eventId: Long, eventType: String, tsUs: Long)
  final case class Anchor(eventId: Long, tsUs: Long)
  final case class Buf(open: Seq[Anchor], pending: Seq[PEv])
  final case class Match(userId: Long, viewEventId: Long, viewTsUs: Long,
                         purchaseTsUs: Long, waitUs: Long)

  /** Same horizon as the batch operator. */
  val HorizonUs: Long = 3600L * 1000000L

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private[streaming] def handle(key: Long, events: Iterator[Ev],
      state: GroupState[Buf]): Iterator[Match] = {
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MaxValue }
    val buf0 = state.getOption.getOrElse(Buf(Vector.empty, Vector.empty))
    val incoming = events.map(e => PEv(e.eventId, e.eventType, micros(e.ts)))
    val (ripe, still) = (buf0.pending ++ incoming)
      .partition(e => e.tsUs / 1000 <= wm)
    var open = buf0.open
    val out = Vector.newBuilder[Match]
    ripe.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      e.eventType match {
        case "view" => open = open :+ Anchor(e.eventId, e.tsUs)
        case "error" => open = Vector.empty
        case "purchase" =>
          open.foreach { a =>
            if (e.tsUs - a.tsUs <= HorizonUs)
              out += Match(key, a.eventId, a.tsUs, e.tsUs, e.tsUs - a.tsUs)
          }
          open = Vector.empty
        case _ => ()
      }
    }
    if (wm != Long.MaxValue)
      open = open.filter(a => (a.tsUs + HorizonUs) / 1000 > wm)
    if (open.isEmpty && still.isEmpty) state.remove()
    else state.update(Buf(open, still))
    if (still.nonEmpty) {
      // EventTimeTimeout fires when the watermark STRICTLY exceeds the
      // armed ms — arm one below the earliest pending ts, clamped above
      // the current watermark (Spark's contract), as in AsofEventTime
      val next = still.map(_.tsUs / 1000).min - 1
      state.setTimeoutTimestamp(math.max(next, wm + 1))
    }
    out.result().iterator
  }

  /** `ds` must have `withWatermark` on `ts` upstream with a delay
    * covering the stream's disorder bound. */
  def apply(ds: Dataset[Ev]): Dataset[Match] = {
    implicit val m = Encoders.product[Match]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.scalaLong
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
