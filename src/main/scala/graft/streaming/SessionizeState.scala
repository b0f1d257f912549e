package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `EventAnalytics.sessionize`: per-user gap-based
  * session assembly as a keyed state machine emitting CLOSED session
  * rows. State is one in-flight session per user — (idx, start, last,
  * count, exact cent sum) — O(1) per key forever; a session closes
  * (and emits) the moment an event arrives more than the gap after the
  * session's last event, which also opens the successor with the next
  * dense index.
  *
  * Value sums are kept as exact long cents (HALF_UP at 2 decimals,
  * mirroring the batch side's DECIMAL(18,2) cast), so the emitted
  * double equals the batch `sumDec2(...).cast("double")` bit-for-bit:
  * both are the nearest double of the same exact rational.
  *
  * The LAST session of a key stays open at end-of-input by definition —
  * only later events (or, in a deployment, a watermark horizon via the
  * [[AsofEventTime]] buffer + EventTimeTimeout pattern) can prove it
  * complete. SessionizeStreamSpec pins: streaming closed sessions ==
  * batch sessions minus each user's final one.
  *
  * Ordering contract as [[AsofState]]/[[DebounceState]]: within a
  * micro-batch events are processed in (ts, id) order; across batches
  * the stream must be fed in order. */
object SessionizeState {

  final case class Ev(eventId: Long, userId: Long, tsUs: Long, value: Double)

  /** In-flight session: dense per-user index, bounds, size, cent-exact sum. */
  final case class Sess(idx: Long, startUs: Long, lastUs: Long, n: Long, cents: Long)

  final case class SessionRow(userId: Long, sessionIdx: Long, nEvents: Long,
                              startUs: Long, endUs: Long, durationUs: Long,
                              sumValue: Double)

  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  private def row(userId: Long, s: Sess): SessionRow =
    SessionRow(userId, s.idx, s.n, s.startUs, s.lastUs,
      s.lastUs - s.startUs, s.cents / 100.0)

  def handle(gapUs: Long)(userId: Long, events: Iterator[Ev],
             state: GroupState[Sess]): Iterator[SessionRow] = {
    var cur = state.getOption
    val out = Vector.newBuilder[SessionRow]
    events.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      cur = cur match {
        case Some(s) if e.tsUs - s.lastUs > gapUs =>
          out += row(userId, s)
          Some(Sess(s.idx + 1, e.tsUs, e.tsUs, 1, cents(e.value)))
        case Some(s) =>
          Some(s.copy(lastUs = math.max(s.lastUs, e.tsUs), n = s.n + 1,
            cents = s.cents + cents(e.value)))
        case None =>
          Some(Sess(1, e.tsUs, e.tsUs, 1, cents(e.value)))
      }
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  def apply(ds: Dataset[Ev], gapUs: Long): Dataset[SessionRow] = {
    implicit val ev = Encoders.product[Ev]
    implicit val se = Encoders.product[Sess]
    implicit val ro = Encoders.product[SessionRow]
    implicit val k = Encoders.scalaLong
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle(gapUs))
  }
}
