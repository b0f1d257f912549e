package graft.streaming

import graft.SparkSpec
import graft.model.Domain.{ProductIncome, ProductSale}
import graft.sources.Synth
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import ProductRevenue._

class ProductRevenueSpec extends SparkSpec {

  test("incomes buffer until the sale rate arrives; revenue is exact decimal") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[In]
    val q = ProductRevenue(input.toDS())
      .writeStream.format("memory").queryName("rev1")
      .outputMode("append").start()
    try {
      input.addData(In("catA", 1, Some(100), None), In("catA", 2, Some(200), None))
      q.processAllAvailable()
      assert(s.table("rev1").count() == 0) // buffered, no sale rate yet

      input.addData(In("catA", 3, None, Some(0.75)))
      q.processAllAvailable()
      val flushed = s.table("rev1").as[Out].collect().sortBy(_.income)
      assert(flushed.map(_.revenue).toSeq == Seq(BigDecimal(75.0), BigDecimal(150.0)))
      assert(flushed.last.totalRevenue == BigDecimal(225.0))

      // later income joins immediately at the stored rate
      input.addData(In("catA", 4, Some(40), None))
      q.processAllAvailable()
      val all = s.table("rev1").as[Out].collect()
      assert(all.exists(o => o.income == 40 && o.revenue == BigDecimal(30.0)
        && o.totalRevenue == BigDecimal(255.0)))
    } finally q.stop()
  }

  test("fromStreams runs the revenue DAG end-to-end from the S4 generators") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // deterministic generator output (ProductSource / ProductSaleSource
    // rules), fed through MemoryStream in tick order
    val incomeRows = Synth.productIncome(Synth.batchCounter(s, 8))
      .as[(String, Int)].collect().toSeq
    val saleRows = Synth.productSale(Synth.every(Synth.batchCounter(s, 40), 5))
      .as[(String, Double)].collect().toSeq
    val inc = MemoryStream[(ProductIncome, Long)]
    val sal = MemoryStream[(ProductSale, Long)]
    val q = ProductRevenue(ProductRevenue.fromStreams(inc.toDS(), sal.toDS()))
      .writeStream.format("memory").queryName("rev_gen")
      .outputMode("append").start()
    try {
      inc.addData(incomeRows.zipWithIndex.map { case ((n, i), ix) =>
        (ProductIncome(n, i, 0, Nil), ix.toLong) })
      q.processAllAvailable()
      assert(s.table("rev_gen").count() == 0) // all buffered: no sale rates yet
      sal.addData(saleRows.zipWithIndex.map { case ((n, r), ix) =>
        (ProductSale(n, r), (100 + ix).toLong) })
      q.processAllAvailable()
      // each buffered income flushes at its category's FIRST sale rate
      // (later sales find an empty pending list and only update the rate)
      val firstRate = saleRows.groupBy(_._1).map { case (k, v) => k -> v.head._2 }
      val expected = incomeRows.filter(r => firstRate.contains(r._1))
        .map { case (n, i) => (n, i, BigDecimal(i) * BigDecimal(firstRate(n).toString)) }
      val out = s.table("rev_gen").as[Out].collect()
      assert(expected.nonEmpty)
      assert(out.map(o => (o.productName, o.income, o.revenue)).toSet == expected.toSet)
    } finally q.stop()
  }
}
