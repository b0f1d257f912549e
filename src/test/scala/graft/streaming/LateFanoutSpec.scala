package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import EventWindowState.{EvW, WinOut}

/** W10/J8 end-to-end: the reference's sideOutputLateData PIPELINE shape —
  * windowAll(5s).allowedLateness(2s).sideOutputLateData(lateTag) with the
  * main aggregate stream and the late stream each going to their own sink
  * (ref: test/EventTimeTest.java:329-428 testLateSide) — reproduced as ONE
  * live Structured Streaming query: EventWindowState.tumblingCarrier
  * (fire / re-fire / late tagging) → SideOutputs.fanOut (foreachBatch
  * two-sink split).
  *
  * Flink's explicit `ctx.emitWatermark(...)` calls run AHEAD of max event
  * time, which a watermark derived from the event-time column can't do —
  * so the watermark rides the carrier column `wmTs` (each row attests the
  * watermark in force at its arrival; emitting tuples carry the new
  * value), Flink's source-watermark contract. The engine's
  * beyond-watermark filter tests the carrier, so the trace's late rows
  * reach the operator (asserted via numRowsDroppedByWatermark == 0) and
  * the operator applies Flink's drop rule (windowEnd + lateness <= wm) to
  * tag the late side output — late rows observable as ROWS, not just a
  * drop counter. */
class LateFanoutSpec extends SparkSpec {

  test("testLateSide trace: main + late sinks match the Flink comment trace") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Long, Long, Long)] // value(=tuple id), tsMs, wmMs
    val evs = input.toDS().toDF("value", "tsMs", "wmMs")
      .select(lit("all").as("key"), col("value"),
        timestamp_millis(col("tsMs")).as("ts"),
        timestamp_millis(col("wmMs")).as("wmTs"))
      .withWatermark("wmTs", "0 seconds")
      .as[EvW]
    val outs = EventWindowState.tumblingCarrier(evs, sizeMs = 5000L, allowedLatenessMs = 2000L)

    val mainRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val lateRows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = SideOutputs.start(outs.toDF(), Seq(
      ("kind = 'fire'", b => b.as[WinOut].collect()
        .foreach(w => mainRows.add((w.windowStart, w.sum, w.count)))),
      ("kind = 'late'", b => b.as[WinOut].collect()
        .foreach(w => lateRows.add(w.sum))))) // a late row carries its value as sum
    try {
      // batch boundaries at the trace's emitWatermark calls. Each row's
      // wmMs attests a watermark STRICTLY ahead of the one in force at
      // its arrival (the engine's beyond-watermark filter is inclusive:
      // carrier <= wm drops), so every trace row is delivered; the
      // emitting tuple carries the NEW watermark, so the end-of-batch
      // watermark (max(wmTs) - 0) lands exactly on the Flink emission
      input.addData(Seq( // t1..t7 under wm 0, then wm := 11000
        (1L, 1100L, 1L), (2L, 300L, 1L), (3L, 5100L, 1L), (4L, 4600L, 1L),
        (5L, 2900L, 1L), (6L, 13000L, 1L), (7L, 9100L, 11000L)))
      q.processAllAvailable() // no-data batch: [0,5000) fires {1,2,4,5}; [5000,10000) fires {3,7}
      input.addData(Seq( // t8 (drop), t9/t10 (allowed-late re-fires), then wm := 18000
        (8L, 3000L, 11001L), (9L, 6700L, 11001L), (10L, 9900L, 18000L)))
      q.processAllAvailable() // then [10000,15000) fires {6}
      input.addData(Seq( // t11..t19 under wm 18000, then wm := 26000
        (11L, 13000L, 18001L), (12L, 8888L, 18001L), (13L, 12000L, 18001L),
        (14L, 15300L, 18001L), (15L, 17200L, 18001L), (16L, 1300L, 18001L),
        (17L, 21000L, 18001L), (18L, 23000L, 18001L), (19L, 5000L, 26000L)))
      q.processAllAvailable() // then [15000,20000) fires {14,15}; [20000,25000) fires {17,18}
      input.addData(Seq((20L, 19000L, 26001L))) // t20 under wm 26000: drop
      q.processAllAvailable()

      // main sink: every window result of the comment trace, including the
      // two allowed-late RE-fires of [5000,10000), each exactly once
      import scala.jdk.CollectionConverters._
      val fires = mainRows.asScala.toVector
      val expectedFires = Vector(
        (0L, 1L + 2 + 4 + 5, 4L),        // [0,5000)     {1,2,4,5}
        (5000L, 3L + 7, 2L),             // [5000,10000) {3,7}
        (5000L, 3L + 7 + 9, 3L),         //   re-fire    {3,7,9}
        (5000L, 3L + 7 + 9 + 10, 4L),    //   re-fire    {3,7,9,10}
        (10000L, 6L, 1L),                // [10000,15000) {6}
        (15000L, 14L + 15, 2L),          // [15000,20000) {14,15}
        (20000L, 17L + 18, 2L))          // [20000,25000) {17,18}
      assert(fires.sorted == expectedFires.sorted,
        s"main sink diverged from the trace:\n got $fires\n want $expectedFires")

      // late sink: exactly the trace's dropped tuples
      val late = lateRows.asScala.toVector.sorted
      assert(late == Vector(8L, 11L, 12L, 13L, 16L, 19L, 20L),
        s"late sink diverged from the trace: $late")

      // and the split was done by the OPERATOR, not the engine's watermark
      // filter — no row was silently dropped upstream of the late tag
      val engineDropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(engineDropped == 0, s"engine pre-dropped $engineDropped rows")
    } finally q.stop()
  }
}
