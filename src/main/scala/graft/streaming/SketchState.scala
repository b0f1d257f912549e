package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cardinality via a hand-rolled HyperLogLog register array
  * held in GroupState — the keyed-sketch pattern a Flink user writes
  * with a `ValueState[byte[]]` (reference state surface:
  * test/StateTest.java:53-932), and the streaming complement of the
  * batch sketch audits (`user_overlap`, `source_cardinality`).
  *
  * State posture: the register array is FIXED at 2^P bytes per key
  * forever — the only honest distinct-count contract on an unbounded
  * stream (exact per-key sets grow with the key space; a watermarked
  * dedup bounds by horizon, not lifetime). Registers are pointwise-max
  * mergeable, so the same bytes support cross-partition and
  * cross-stream union without re-reading history.
  *
  * The estimator is the standard HLL form (alpha·m²/Σ2^(-reg) with
  * linear-counting small-range correction); the 64-bit item hash is a
  * SplitMix64 finalizer (public-domain mixing constants). Estimates are
  * deterministic for a given item multiset — the spec pins tolerance
  * against exact counts, never sketch-register equality with another
  * engine. */
object SketchState {

  final case class In(key: String, item: Long)
  final case class Est(key: String, estimate: Long, seenBatches: Long)
  final case class Regs(bytes: Array[Byte], batches: Long)

  /** 2^P registers; rsd ≈ 1.04/√(2^P) ≈ 2.3% at P=11 (2 KB per key). */
  val P: Int = 11
  val M: Int = 1 << P

  /** SplitMix64 finalizer — a strong 64→64 bit mixer. */
  def hash64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def emptyRegs(): Array[Byte] = new Array[Byte](M)

  /** Fold one item into the registers (mutates; returns the array). */
  def add(regs: Array[Byte], item: Long): Array[Byte] = {
    val h = hash64(item)
    val idx = (h >>> (64 - P)).toInt
    val rank = (java.lang.Long.numberOfLeadingZeros(h << P | (1L << (P - 1))) + 1)
      .toByte // the OR caps rank at 64-P+1 without a branch
    if (rank > regs(idx)) regs(idx) = rank
    regs
  }

  /** Pointwise-max union — the property that makes HLL distributable. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  /** Standard HLL estimate with linear-counting small-range correction. */
  def estimate(regs: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * M.toDouble * M.toDouble / invSum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.rint(corrected).toLong
  }

  def handle(key: String, items: Iterator[In],
      state: GroupState[Regs]): Est = {
    val prev = state.getOption.getOrElse(Regs(emptyRegs(), 0L))
    val regs = prev.bytes.clone()
    items.foreach(in => add(regs, in.item))
    val next = Regs(regs, prev.batches + 1)
    state.update(next)
    Est(key, estimate(regs), next.batches)
  }

  /** Per-trigger running estimate per key (Update mode). */
  def apply(ds: Dataset[In]): Dataset[Est] = {
    implicit val e = Encoders.product[Est]
    implicit val r = Encoders.product[Regs]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(handle)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
