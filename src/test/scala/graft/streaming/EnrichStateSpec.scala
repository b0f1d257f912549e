package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import EnrichState._

/** Drives the CoFlatMap-style enrichment state machine through a real
  * Structured Streaming query (MemoryStream → flatMapGroupsWithState →
  * memory sink), batch-by-batch, mirroring the reference's arrival-order
  * semantics (main/func/flat/FlatMapTest.java:22-96). */
class EnrichStateSpec extends SparkSpec {

  private def cem(code: String): Cem =
    Cem(code, "sign", "1", "site_1", "9", "merchant_9", "pay", Some(1000L), None)

  test("link before CEM is buffered; CEM arrival flushes buffered links") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[In]
    val q = EnrichState(input.toDS())
      .writeStream.format("memory").queryName("enrich1")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two links arrive before their CEM → buffered, no output
      input.addData(
        In("JD1", 1, None, Some(RouteLink("JD1", "JD1-1", 100L))),
        In("JD1", 2, None, Some(RouteLink("JD1", "JD1-2", 200L))))
      q.processAllAvailable()
      assert(s.table("enrich1").count() == 0)

      // batch 2: CEM arrives → both buffered links flushed as joined rows
      input.addData(In("JD1", 3, Some(cem("JD1")), None))
      q.processAllAvailable()
      val out1 = s.table("enrich1").as[Out].collect().sortBy(_.packageCode)
      assert(out1.length == 2)
      assert(out1.map(_.packageCode) sameElements Array(Some("JD1-1"), Some("JD1-2")))
      assert(out1.forall(_.busiName == "merchant_9"))

      // batch 3: another link now joins immediately
      input.addData(In("JD1", 4, None, Some(RouteLink("JD1", "JD1-3", 300L))))
      q.processAllAvailable()
      assert(s.table("enrich1").count() == 3)
    } finally q.stop()
  }

  test("CEM with no buffered links emits the bare CEM row once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[In]
    val q = EnrichState(input.toDS())
      .writeStream.format("memory").queryName("enrich2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(In("JD9", 1, Some(cem("JD9")), None))
      q.processAllAvailable()
      val rows = s.table("enrich2").as[Out].collect()
      assert(rows.length == 1)
      assert(rows.head.packageCode.isEmpty && rows.head.waybillCode == "JD9")
    } finally q.stop()
  }

  test("keys are isolated: JD1 state never leaks into JD2") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[In]
    val q = EnrichState(input.toDS())
      .writeStream.format("memory").queryName("enrich3")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        In("JD1", 1, Some(cem("JD1")), None),
        In("JD2", 2, None, Some(RouteLink("JD2", "JD2-1", 100L))))
      q.processAllAvailable()
      val rows = s.table("enrich3").as[Out].collect()
      // JD1 emits its bare CEM; JD2's link stays buffered (no CEM yet)
      assert(rows.map(_.waybillCode).toSeq == Seq("JD1"))
    } finally q.stop()
  }
}
