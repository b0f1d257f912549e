package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` family — the exact Spark analogue of
  * Flink's 4-method `AggregateFunction<IN, ACC, OUT>` (W12; reference:
  * test/EventTimeTest.java:87-115 list-accumulator;
  * test/WindowTest.java:262-293 (name, sum, history[]);
  * test/StateTest.java:584-630 BigDecimal revenue).
  *
  * createAccumulator/add/getResult/merge map 1:1 onto
  * zero/reduce/finish/merge. Because `merge` is implemented, Catalyst
  * runs these with map-side partial aggregation — the same incremental
  * pre-aggregation Flink's incremental window functions do (SURVEY §4).
  * Usable over groupByKey (`ds.groupByKey(..).agg(x.toColumn)`) and as
  * untyped UDAFs via `functions.udaf`.
  */
object Aggregators {

  /** A5/J4 typed form: last-non-null-wins 3-field wide-row merge,
    * ordered by a sequence number (reference: test/StateTest.java:683-698
    * — each non-null field of the newer partial overwrites). */
  final case class Partial(seq: Long, f1: Option[String], f2: Option[String], f3: Option[String])
  final case class MergeBuf(s1: Long, v1: Option[String],
                            s2: Long, v2: Option[String],
                            s3: Long, v3: Option[String])
  final case class Merged(f1: Option[String], f2: Option[String], f3: Option[String])

  final class NullCoalescingLast extends Aggregator[Partial, MergeBuf, Merged] {
    private def pick(bs: Long, bv: Option[String], as: Long, av: Option[String]) =
      if (av.isDefined && (bv.isEmpty || as >= bs)) (as, av) else (bs, bv)
    override def zero: MergeBuf =
      MergeBuf(Long.MinValue, None, Long.MinValue, None, Long.MinValue, None)
    override def reduce(b: MergeBuf, a: Partial): MergeBuf = {
      val (s1, v1) = pick(b.s1, b.v1, a.seq, a.f1)
      val (s2, v2) = pick(b.s2, b.v2, a.seq, a.f2)
      val (s3, v3) = pick(b.s3, b.v3, a.seq, a.f3)
      MergeBuf(s1, v1, s2, v2, s3, v3)
    }
    override def merge(x: MergeBuf, y: MergeBuf): MergeBuf = {
      val (s1, v1) = pick(x.s1, x.v1, y.s1, y.v1)
      val (s2, v2) = pick(x.s2, x.v2, y.s2, y.v2)
      val (s3, v3) = pick(x.s3, x.v3, y.s3, y.v3)
      MergeBuf(s1, v1, s2, v2, s3, v3)
    }
    override def finish(b: MergeBuf): Merged = Merged(b.v1, b.v2, b.v3)
    override def bufferEncoder: Encoder[MergeBuf] = Encoders.product[MergeBuf]
    override def outputEncoder: Encoder[Merged] = Encoders.product[Merged]
  }

  /** W12: sum + per-element history — Flink's list-accumulator
    * AggregateFunction producing (sum, detail[]) (reference:
    * test/WindowTest.java:262-293, ProductIncome.detail Integer[]).
    * detail is sorted at finish so the result is deterministic across
    * partial-merge orders (the unsorted form is order-sensitive — the
    * same caveat Flink's list accumulator has across repartitions). */
  final case class SumDetailBuf(sum: Long, detail: Seq[Long])
  final class SumWithDetail extends Aggregator[Long, SumDetailBuf, SumDetailBuf] {
    override def zero: SumDetailBuf = SumDetailBuf(0L, Vector.empty)
    override def reduce(b: SumDetailBuf, a: Long): SumDetailBuf =
      SumDetailBuf(b.sum + a, b.detail :+ a)
    override def merge(x: SumDetailBuf, y: SumDetailBuf): SumDetailBuf =
      SumDetailBuf(x.sum + y.sum, x.detail ++ y.detail)
    override def finish(b: SumDetailBuf): SumDetailBuf =
      b.copy(detail = b.detail.sorted)
    override def bufferEncoder: Encoder[SumDetailBuf] = Encoders.product[SumDetailBuf]
    override def outputEncoder: Encoder[SumDetailBuf] = Encoders.product[SumDetailBuf]
  }

  /** Bounded top-k: keeps only the k largest values per group — per-key
    * top-N without a global sort, O(k) state, map-side mergeable (the
    * shape Spark's own collect_top_k uses internally). */
  final case class TopKBuf(k: Int, values: Seq[Long])
  final class TopK(k: Int) extends Aggregator[Long, TopKBuf, Seq[Long]] {
    private def trim(vs: Seq[Long]): Seq[Long] = vs.sorted(Ordering[Long].reverse).take(k)
    override def zero: TopKBuf = TopKBuf(k, Vector.empty)
    override def reduce(b: TopKBuf, a: Long): TopKBuf = b.copy(values = trim(b.values :+ a))
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = x.copy(values = trim(x.values ++ y.values))
    override def finish(b: TopKBuf): Seq[Long] = trim(b.values)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[Long]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Misra–Gries heavy hitters: frequent items in O(capacity) state with
    * the classic undercount bound (≤ n/capacity); mergeable, so it runs
    * with map-side partial aggregation — the bounded-memory answer to
    * "most common tokens" over an unbounded corpus. */
  final case class MgBuf(capacity: Int, counters: Map[String, Long])
  final class HeavyHitters(capacity: Int) extends Aggregator[String, MgBuf, Map[String, Long]] {
    private def decrement(c: Map[String, Long], by: Long): Map[String, Long] =
      c.flatMap { case (k, v) => if (v > by) Some(k -> (v - by)) else None }
    private def add(b: MgBuf, item: String, n: Long): MgBuf =
      b.counters.get(item) match {
        case Some(v) => b.copy(counters = b.counters + (item -> (v + n)))
        case None if b.counters.size < capacity =>
          b.copy(counters = b.counters + (item -> n))
        case None =>
          val minV = b.counters.values.min
          val dec = math.min(minV, n)
          val after = decrement(b.counters, dec)
          if (n > dec) add(b.copy(counters = after), item, n - dec)
          else b.copy(counters = after)
      }
    override def zero: MgBuf = MgBuf(capacity, Map.empty)
    override def reduce(b: MgBuf, a: String): MgBuf = add(b, a, 1L)
    override def merge(x: MgBuf, y: MgBuf): MgBuf =
      y.counters.foldLeft(x) { case (b, (item, n)) => add(b, item, n) }
    override def finish(b: MgBuf): Map[String, Long] = b.counters
    override def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** W12/T8: exact-decimal revenue accumulator — Flink's AggregatingState
    * with java BigDecimal multiply/add (reference:
    * test/StateTest.java:602-621). IN = (income, sale) as decimals. */
  final case class DecPair(income: java.math.BigDecimal, sale: java.math.BigDecimal)
  final class RevenueDecimal extends Aggregator[DecPair, java.math.BigDecimal, java.math.BigDecimal] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: DecPair): java.math.BigDecimal =
      b.add(a.income.multiply(a.sale))
    override def merge(x: java.math.BigDecimal, y: java.math.BigDecimal): java.math.BigDecimal =
      x.add(y)
    override def finish(b: java.math.BigDecimal): java.math.BigDecimal = b
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  }
}
