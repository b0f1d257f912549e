package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `EventAnalytics.debounce`: per-(user, event_type)
  * session-head suppression as a keyed state machine. State is ONE
  * timestamp — the last event seen for the key (kept or not: a
  * suppressed repeat still extends the session, Flink session-window
  * gap semantics) — so state is O(1) per key forever, no horizon
  * buffering needed. Emits exactly the session heads.
  *
  * Ordering contract as [[AsofState]]: within a micro-batch events are
  * processed in (ts, id) order; across batches the stream must be fed
  * in order (a disorder-bounded deployment wraps this in the
  * [[AsofEventTime]] watermark-buffer pattern). */
object DebounceState {

  final case class Ev(eventId: Long, userId: Long, eventType: String,
                      tsUs: Long, value: Double)

  def handle(gapUs: Long)(key: (Long, String), events: Iterator[Ev],
             state: GroupState[Long]): Iterator[Ev] = {
    var last = state.getOption
    val out = Vector.newBuilder[Ev]
    events.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      if (last.forall(l => e.tsUs - l > gapUs)) out += e
      // every event extends the session, suppressed ones included
      if (last.forall(_ <= e.tsUs)) last = Some(e.tsUs)
    }
    last.foreach(state.update)
    out.result().iterator
  }

  def apply(ds: Dataset[Ev], gapUs: Long): Dataset[Ev] = {
    implicit val o = Encoders.product[Ev]
    implicit val l = Encoders.scalaLong
    implicit val k = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    ds.groupByKey(e => (e.userId, e.eventType))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle(gapUs))
  }
}
