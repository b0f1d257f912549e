package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Count windows, triggers and evictors as keyed state machines —
  * the streaming forms of W1–W3 (reference:
  * test/HelloWorldFlinkTest.java:98-150 keyed countWindow;
  * test/WindowTest.java:79-94 GlobalWindows + CountTrigger(2) +
  * CountEvictor(5)).
  *
  * Structured Streaming has no count-window assigner, so these are
  * `flatMapGroupsWithState` handlers. Flink semantics preserved:
  * count windows only fire when FULL (un-filled windows never emit,
  * reference: test/HelloWorldFlinkTest.java:100-103); the trigger/evictor
  * variant fires every `fireEvery` elements over the last ≤ `keep`
  * retained elements. State per key is bounded (≤ N buffered values) —
  * the evictor cap is exactly the 100 TB skew guard SURVEY §7.4(6) calls
  * for.
  */
object CountWindowState {

  final case class KV(key: String, value: Long, seq: Long)
  final case class WindowOut(key: String, windowId: Long, sum: Long, n: Int)
  final case class CountBuf(windowId: Long, values: Vector[Long])

  /** Keyed countWindow(n): buffer per key, emit sum when full, clear. */
  def countWindow(ds: Dataset[KV], n: Int): Dataset[WindowOut] = {
    implicit val outEnc = Encoders.product[WindowOut]
    implicit val bufEnc = Encoders.product[CountBuf]
    implicit val keyEnc = Encoders.STRING
    def handle(key: String, events: Iterator[KV],
               state: GroupState[CountBuf]): Iterator[WindowOut] = {
      var buf = state.getOption.getOrElse(CountBuf(0L, Vector.empty))
      val out = Vector.newBuilder[WindowOut]
      events.toSeq.sortBy(_.seq).foreach { e =>
        val vs = buf.values :+ e.value
        if (vs.size == n) {
          out += WindowOut(key, buf.windowId, vs.sum, vs.size)
          buf = CountBuf(buf.windowId + 1, Vector.empty)
        } else buf = buf.copy(values = vs)
      }
      state.update(buf)
      out.result().iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
  }

  /** GlobalWindows + CountTrigger(fireEvery) + CountEvictor(keep):
    * fire on every `fireEvery`-th arrival with the sum of the last
    * ≤ `keep` elements. */
  final case class TriggerBuf(seen: Long, window: Vector[Long])

  def triggerEvictor(ds: Dataset[KV], fireEvery: Int, keep: Int): Dataset[WindowOut] = {
    implicit val outEnc = Encoders.product[WindowOut]
    implicit val bufEnc = Encoders.product[TriggerBuf]
    implicit val keyEnc = Encoders.STRING
    def handle(key: String, events: Iterator[KV],
               state: GroupState[TriggerBuf]): Iterator[WindowOut] = {
      var buf = state.getOption.getOrElse(TriggerBuf(0L, Vector.empty))
      val out = Vector.newBuilder[WindowOut]
      events.toSeq.sortBy(_.seq).foreach { e =>
        val w = (buf.window :+ e.value).takeRight(keep) // evict to last `keep`
        val seen = buf.seen + 1
        if (seen % fireEvery == 0) out += WindowOut(key, seen, w.sum, w.size)
        buf = TriggerBuf(seen, w)
      }
      state.update(buf)
      out.result().iterator
    }
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
  }
}
