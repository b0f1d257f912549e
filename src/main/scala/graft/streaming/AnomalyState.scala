package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detection: per-key z-score against WELFORD running
  * statistics held in O(1) GroupState — the "alert when a metric jumps"
  * job a Flink user writes with a `ValueState[(n, mean, m2)]` (keyed
  * state surface: test/StateTest.java), and the numerically-stable way
  * to keep a running variance (naive Σx/Σx² cancels catastrophically
  * once mean² ≫ variance; Welford's update is exact in the same float
  * width).
  *
  * Each event is scored against the statistics of the PRIOR events
  * only (its own value must not dilute the baseline it is judged
  * against), then folded in: z = (x − mean)/√(m2/n), anomalous when
  * |z| > [[Threshold]] and the baseline has at least [[MinN]]
  * observations. Per-key state is three doubles and a count, forever —
  * the honest contract on an unbounded stream. Within a micro-batch
  * events fold in (seq, value) order, so replays are deterministic. */
object AnomalyState {

  final case class In(key: String, seq: Long, value: Double)
  final case class Stats(n: Long, mean: Double, m2: Double)
  final case class Out(key: String, seq: Long, value: Double,
                       nPrior: Long, meanPrior: Double, stdPrior: Double,
                       z: Double, isAnomaly: Boolean)

  val Threshold = 3.0
  val MinN = 10

  /** Welford fold of one observation (pure core). */
  def fold(s: Stats, x: Double): Stats = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    Stats(n, mean, s.m2 + d * (x - mean))
  }

  /** Score x against PRIOR stats (pure core). */
  def score(s: Stats, x: Double): (Double, Boolean) = {
    val std = if (s.n > 0) math.sqrt(s.m2 / s.n) else 0.0
    val z = if (std > 0) (x - s.mean) / std else 0.0
    (z, s.n >= MinN && math.abs(z) > Threshold)
  }

  private[streaming] def handle(key: String, events: Iterator[In],
      state: GroupState[Stats]): Iterator[Out] = {
    var st = state.getOption.getOrElse(Stats(0L, 0.0, 0.0))
    val out = events.toVector.sortBy(e => (e.seq, e.value)).map { e =>
      val (z, anom) = score(st, e.value)
      val std = if (st.n > 0) math.sqrt(st.m2 / st.n) else 0.0
      val o = Out(key, e.seq, e.value, st.n, st.mean, std, z, anom)
      st = fold(st, e.value)
      o
    }
    state.update(st)
    out.iterator
  }

  /** Per-event anomaly verdicts (Append mode). */
  def apply(ds: Dataset[In]): Dataset[Out] = {
    implicit val o = Encoders.product[Out]
    implicit val st = Encoders.product[Stats]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(handle)
  }
}
