package graft.streaming

import graft.model.Domain.{ProductIncome, ProductSale}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Income × sale enrichment keyed by productName (reference:
  * test/StateTest.java:536-579 — incomes buffered in ListState until the
  * product's sale rate arrives, then flushed; :584-630 — AggregatingState
  * keeps the exact BigDecimal revenue Σ income×sale).
  *
  * The mirror image of EnrichState's buffering: here MANY left-side
  * rows (incomes) buffer against ONE right-side value (the sale rate),
  * and the running revenue accumulates per key exactly like Flink's
  * AggregatingState fold. All money math in java BigDecimal. */
object ProductRevenue {

  final case class In(productName: String, seq: Long,
                      income: Option[Int], sale: Option[Double])
  final case class Out(productName: String, income: Int, sale: Double,
                       revenue: BigDecimal, totalRevenue: BigDecimal)
  final case class Buf(pendingIncomes: Vector[Int], sale: Option[Double],
                       totalRevenue: BigDecimal)

  def handle(key: String, events: Iterator[In], state: GroupState[Buf]): Iterator[Out] = {
    var buf = state.getOption.getOrElse(Buf(Vector.empty, None, BigDecimal(0)))
    val out = Vector.newBuilder[Out]
    def emit(income: Int, sale: Double): Unit = {
      val rev = BigDecimal(income) * BigDecimal(sale.toString) // exact, reference's BigDecimal path
      buf = buf.copy(totalRevenue = buf.totalRevenue + rev)
      out += Out(key, income, sale, rev, buf.totalRevenue)
    }
    events.toSeq.sortBy(_.seq).foreach { e =>
      (e.income, e.sale) match {
        case (Some(inc), _) =>
          buf.sale match {
            case Some(rate) => emit(inc, rate)
            case None => buf = buf.copy(pendingIncomes = buf.pendingIncomes :+ inc)
          }
        case (_, Some(rate)) =>
          buf.pendingIncomes.foreach(inc => emit(inc, rate))
          buf = buf.copy(pendingIncomes = Vector.empty, sale = Some(rate))
        case _ =>
      }
    }
    state.update(buf)
    out.result().iterator
  }

  def apply(ds: Dataset[In]): Dataset[Out] = {
    implicit val o = Encoders.product[Out]
    implicit val b = Encoders.product[Buf]
    implicit val k = Encoders.STRING
    ds.groupByKey(_.productName)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
  }

  /** Convenience taggers from the typed domain streams. */
  def fromStreams(incomes: Dataset[(ProductIncome, Long)],
                  sales: Dataset[(ProductSale, Long)]): Dataset[In] = {
    val s = incomes.sparkSession
    import s.implicits._
    incomes.map { case (i, seq) => In(i.productName, seq, Some(i.income), None) }
      .unionByName(sales.map { case (p, seq) => In(p.productName, seq, None, Some(p.sale)) })
  }
}
