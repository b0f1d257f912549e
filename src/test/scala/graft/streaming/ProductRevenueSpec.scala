package graft.streaming

import graft.SparkSpec
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
}
