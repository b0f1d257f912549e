package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming multi-touch attribution: the out-of-order-tolerant twin of
  * the batch `multitouch_attribution` query, completing the attribution
  * family's 2×2 (last-touch batch `asof_attribution` / stream
  * [[AsofEventTime]]; multi-touch batch / THIS). Same watermark-buffer
  * idiom as [[AsofEventTime]]: events buffer in keyed state until the
  * query watermark passes them, then replay in (ts, event_id) order —
  * ripe processing is final, so emitted credits equal the batch
  * operator whatever the arrival order.
  *
  * The replay machine keeps the user's view/click touches inside one
  * [[HorizonUs]] window; a purchase splits its value equally across the
  * touches inside the half-open interval [p.ts − horizon, p.ts) —
  * closed at the horizon edge, matching the batch twin. Touches older than
  * the horizon prune at every step (and can never credit a future
  * purchase), so per-user state is bounded by one horizon of traffic
  * plus the watermark buffer — never the stream. */
object MultiTouchState {

  final case class Ev(eventId: Long, userId: Long, eventType: String,
                      ts: java.sql.Timestamp, value: Double)
  final case class PEv(eventId: Long, eventType: String, tsUs: Long, value: Double)
  final case class Touch(eventId: Long, eventType: String, tsUs: Long)
  final case class Buf(touches: Seq[Touch], pending: Seq[PEv])
  final case class Credit(userId: Long, purchaseId: Long, purchaseTsUs: Long,
                          touchId: Long, touchType: String, touchTsUs: Long,
                          nTouches: Long, credit: Double)

  /** Same horizon as the batch operator (EnrichJoin.IntervalUs). */
  val HorizonUs: Long = 3600000000L

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Credit arithmetic — matches the batch form bit-for-bit: the value
    * goes through DECIMAL(18,2) and one double division by the count. */
  private def creditOf(value: Double, n: Int): Double =
    BigDecimal(value).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble / n

  private[streaming] def handle(key: Long, events: Iterator[Ev],
      state: GroupState[Buf]): Iterator[Credit] = {
    val wm = try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MaxValue }
    val buf0 = state.getOption.getOrElse(Buf(Vector.empty, Vector.empty))
    val incoming = events.map(e =>
      PEv(e.eventId, e.eventType, micros(e.ts), e.value))
    val (ripe, still) = (buf0.pending ++ incoming)
      .partition(e => e.tsUs / 1000 <= wm)
    var touches = buf0.touches
    val out = Vector.newBuilder[Credit]
    ripe.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      e.eventType match {
        case "view" | "click" =>
          touches = touches :+ Touch(e.eventId, e.eventType, e.tsUs)
        case "purchase" =>
          val window = touches.filter(t =>
            t.tsUs < e.tsUs && t.tsUs >= e.tsUs - HorizonUs)
          val n = window.length
          window.foreach { t =>
            out += Credit(key, e.eventId, e.tsUs, t.eventId, t.eventType,
              t.tsUs, n.toLong, creditOf(e.value, n))
          }
          // touches stay live: a later purchase inside their horizon
          // credits them again (each conversion looks back independently)
          touches = touches.filter(t => t.tsUs > e.tsUs - HorizonUs)
        case _ => ()
      }
    }
    // horizon prune against the watermark: a touch the watermark has
    // outlived by a full horizon can never credit a future purchase
    if (wm != Long.MaxValue)
      touches = touches.filter(t => (t.tsUs + HorizonUs) / 1000 > wm)
    if (touches.isEmpty && still.isEmpty) state.remove()
    else state.update(Buf(touches, still))
    if (still.nonEmpty) {
      val next = still.map(_.tsUs / 1000).min - 1
      state.setTimeoutTimestamp(math.max(next, wm + 1))
    }
    out.result().iterator
  }

  /** `ds` must have `withWatermark` on `ts` upstream covering the
    * stream's disorder bound. */
  def apply(ds: Dataset[Ev]): Dataset[Credit] = {
    implicit val c = Encoders.product[Credit]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.scalaLong
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
