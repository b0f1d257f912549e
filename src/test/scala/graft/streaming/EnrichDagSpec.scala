package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import EnrichDag._
import EnrichState.Cem

/** E3 DAG stages under real Structured Streaming (the full four-stage
  * chain runs in batch mode via the `enrich_dag` oracle query; chaining
  * multiple flatMapGroupsWithState stages in ONE streaming query is not
  * supported by Spark, so streaming deployments run stages as separate
  * queries — each stage is verified independently here). */
class EnrichDagSpec extends SparkSpec {

  private def c(wc: String) = Cem(wc, "sig", "3", "site_3", null, null, null, None, None)
  private def e(wc: String) = Cem(wc, null, null, null, "9", "merchant_9", "pay", None, None)
  private def m(wc: String) = Cem(wc, null, null, null, null, null, null, Some(7L), Some(9L))

  test("stage A: rolling CEM merge emits progressively wider rows per batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[PartIn]
    val q = mergeCem(input.toDS())
      .writeStream.format("memory").queryName("dag_a")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(PartIn("JD1", 1, c("JD1")))
      q.processAllAvailable()
      input.addData(PartIn("JD1", 2, e("JD1")), PartIn("JD1", 3, m("JD1")))
      q.processAllAvailable()
      val rows = s.table("dag_a").as[Cem].collect()
      assert(rows.length == 2) // one merged emission per micro-batch
      val last = rows.maxBy(r => (Option(r.busiNo).size, Option(r.siteCode).size))
      // C fields survived the E/M merges (null-coalescing, not overwrite)
      assert(last == Cem("JD1", "sig", "3", "site_3", "9", "merchant_9", "pay", Some(7L), Some(9L)))
    } finally q.stop()
  }

  test("stage C: order link buffers waybills until the order arrives") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[OrderIn]
    val q = linkOrders(input.toDS())
      .writeStream.format("memory").queryName("dag_c")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(OrderIn("O1", 1, Some("JD1"), None))
      q.processAllAvailable()
      assert(s.table("dag_c").count() == 0) // waybill waits for the order
      input.addData(OrderIn("O1", 2, None, Some(42L)))
      q.processAllAvailable()
      val out = s.table("dag_c").as[OrderInfo].collect().toSeq
      assert(out == Seq(OrderInfo("JD1", "O1", 42L)))
    } finally q.stop()
  }

  test("full DAG in batch mode: 5 wide rows per waybill, fields from all six sources") {
    val s = spark
    import s.implicits._
    val out = enrichDag(s, "")
    val rows = out.collect()
    assert(rows.length == 1000) // 200 waybills x 5 packages
    val first = out.filter($"waybillCode" === "JD0000000000").as[BdWaybillOrder].collect()
    assert(first.length == 5)
    assert(first.forall(r => r.siteCode != null && r.busiNo != null
      && r.pickupTs.isDefined && r.packageCode.isDefined && r.orderCode == "Order0000000000"))
  }
}
