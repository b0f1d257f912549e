package graft.streaming

import graft.SparkSpec
import graft.agg.Aggregators
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import RollingState._

class RollingStateSpec extends SparkSpec {

  test("A2 exact: one output per input with the running sum (HelloWorldFlinkTest:78)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KV]
    val q = RollingState(input.toDS())
      .writeStream.format("memory").queryName("roll_exact")
      .outputMode("append").start()
    try {
      input.addData(KV("a", 5.0, 1), KV("a", 3.0, 2), KV("b", 1.0, 3))
      q.processAllAvailable()
      input.addData(KV("a", 2.0, 4)) // running state survives micro-batches
      q.processAllAvailable()
      val rows = s.table("roll_exact").as[RollOut].collect().sortBy(r => (r.key, r.seq))
      assert(rows.map(r => (r.key, r.runningSum, r.n)).toSeq == Seq(
        ("a", 5.0, 1L), ("a", 8.0, 2L), ("a", 10.0, 3L), ("b", 1.0, 1L)))
    } finally q.stop()
  }

  /** W12 combo: incremental typed Aggregator inside a time-window groupBy,
    * then a metadata pass over the window struct (reference:
    * test/WindowTest.java:440-537 aggregate+process with window bounds). */
  test("W12 combo: Aggregator in window groupBy + window-metadata pass") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("p1", 5L, 1L), ("p1", 9L, 2L), ("p1", 4L, 4L), ("p2", 7L, 2L))
      .toDF("product", "income", "sec")
      .select(col("product"), col("income"), timestamp_seconds(col("sec")).as("ts"))
    val agged = events
      .groupBy(col("product"), window(col("ts"), "3 seconds"))
      .agg(udaf(new Aggregators.SumWithDetail).apply(col("income")).as("sd"))
      // the "process" pass: window metadata + derived fields
      .select(col("product"),
        col("window.start").cast("long").as("win_start"),
        col("window.end").cast("long").as("win_end"),
        col("sd.sum").as("total"), col("sd.detail").as("history"))
      .orderBy("product", "win_start")
    val rows = agged.collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("p1", 0L, 3L, 14L), ("p1", 3L, 6L, 4L), ("p2", 0L, 3L, 7L)))
    assert(rows.head.getSeq[Long](4) == Seq(5L, 9L))
  }
}
