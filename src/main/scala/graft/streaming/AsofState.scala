package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the as-of join (`EnrichJoin.asofAttribution`):
  * last-touch attribution as a keyed state machine — the form a Flink
  * user would write with a KeyedProcessFunction holding one ValueState
  * per user (reference's state idiom: test/StateTest.java:53-214; the
  * reference has no as-of operator, this is the extension's streaming
  * face).
  *
  * State per user is ONLY the latest touch seen — three fields,
  * independent of history length; a purchase emits its attribution row
  * immediately from that state. Same O(1)-state posture as the batch
  * window form's running `last(...)`, so the two forms cost the same
  * per event and AsofStreamSpec can require them IDENTICAL on ordered
  * input.
  *
  * Ordering contract (same as [[RollingState]]): within a micro-batch
  * events are processed in (ts_us, event_id) order regardless of
  * arrival order; ACROSS micro-batches the stream must be fed in order
  * — an append-mode attribution cannot retract a purchase already
  * emitted when an older touch straggles in later. A deployment with
  * real cross-batch disorder uses [[AsofEventTime]] instead: the same
  * touch machine behind a watermark-horizon buffer
  * (AsofEventTimeSpec pins it batch-identical on a ±15 min-jittered
  * feed); this twin keeps the reference's simple per-event semantics
  * for in-order streams. */
object AsofState {

  final case class Ev(eventId: Long, userId: Long, eventType: String,
                      tsUs: Long, value: Double)
  final case class Touch(id: Long, tpe: String, tsUs: Long)
  final case class Attribution(purchaseId: Long, userId: Long,
      purchaseTsUs: Long, purchaseValue: Double, touchId: Option[Long],
      touchType: Option[String], touchTsUs: Option[Long], lagUs: Option[Long])

  private[streaming] def before(a: Touch, ts: Long, id: Long): Boolean =
    a.tsUs < ts || (a.tsUs == ts && a.id < id)

  def handle(key: Long, events: Iterator[Ev],
             state: GroupState[Touch]): Iterator[Attribution] = {
    var latest = state.getOption
    val out = Vector.newBuilder[Attribution]
    events.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      if (e.eventType == "purchase")
        out += Attribution(e.eventId, key, e.tsUs, e.value,
          latest.map(_.id), latest.map(_.tpe), latest.map(_.tsUs),
          latest.map(t => e.tsUs - t.tsUs))
      else if (latest.forall(before(_, e.tsUs, e.eventId)))
        latest = Some(Touch(e.eventId, e.eventType, e.tsUs))
    }
    latest.foreach(state.update)
    out.result().iterator
  }

  /** `ds` must carry only view/click/purchase events (the batch form's
    * type filter happens upstream of the state machine). */
  def apply(ds: Dataset[Ev]): Dataset[Attribution] = {
    implicit val o = Encoders.product[Attribution]
    implicit val t = Encoders.product[Touch]
    implicit val k = Encoders.scalaLong
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
  }
}
