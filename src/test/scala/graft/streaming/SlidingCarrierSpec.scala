package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import EventWindowState.{EvW, WinOut}

/** W5/W9/W10 live deployment: the reference's sliding-event-time-window
  * shape (test/WindowTest.java:152-203) with allowedLateness + late side
  * output (test/EventTimeTest.java:166-178 rules), running as ONE
  * Structured Streaming query: EventWindowState.slidingCarrier
  * (multi-pane assignment, per-pane fire/re-fire, pane-aware lateness)
  * → SideOutputs.fanOut (foreachBatch main+late two-sink split).
  *
  * Watermark rides the carrier column `wmTs` (source-attested, Flink's
  * emitWatermark contract) so late-by-event-time rows reach the operator
  * and surface as kind='late' ROWS — asserted against the same golden
  * traces FlinkWindowsSpec pins for the pure engine, plus
  * numRowsDroppedByWatermark == 0 to prove the engine didn't pre-drop. */
class SlidingCarrierSpec extends SparkSpec {

  private def run(batches: Seq[Seq[(Long, Long, Long)]], sizeMs: Long, slideMs: Long,
                  latenessMs: Long): (Vector[(Long, Long, Long)], Vector[Long], Long) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Long, Long)] // value, tsMs, wmMs
    val evs = input.toDS().toDF("value", "tsMs", "wmMs")
      .select(lit("a").as("key"), col("value"),
        timestamp_millis(col("tsMs")).as("ts"),
        timestamp_millis(col("wmMs")).as("wmTs"))
      .withWatermark("wmTs", "0 seconds")
      .as[EvW]
    val outs = EventWindowState.slidingCarrier(evs, sizeMs, slideMs, latenessMs)
    val mainRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val lateRows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = SideOutputs.start(outs.toDF(), Seq(
      ("kind = 'fire'", b => b.as[WinOut].collect()
        .foreach(w => mainRows.add((w.windowStart, w.sum, w.count)))),
      ("kind = 'late'", b => b.as[WinOut].collect()
        .foreach(w => lateRows.add(w.sum))))) // a late row carries its value as sum
    try {
      batches.foreach { rows => input.addData(rows); q.processAllAvailable() }
      import scala.jdk.CollectionConverters._
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      (mainRows.asScala.toVector, lateRows.asScala.toVector, dropped)
    } finally q.stop()
  }

  test("sliding 10s/5s trace: per-pane fires + pane-aware late side output") {
    // the FlinkWindowsSpec 'sliding 10s/5s' golden trace, batched at the
    // watermark emissions; each row's wmMs is strictly ahead of the
    // watermark in force at its arrival so the engine delivers it
    val (fires, late, dropped) = run(Seq(
      Seq((1L, 2000L, 1L), (2L, 7000L, 10000L)),
      // wm 10000 fires [-5000,5000)=1 and [0,10000)=1+2
      Seq((4L, 9000L, 10001L)),  // [0,10000) passed but [5000,15000) live → kept there only
      Seq((8L, 12000L, 15000L)), // wm 15000 fires [5000,15000)=2+4+8
      Seq((16L, 4000L, 15001L))  // both its panes passed → late side output
    ), sizeMs = 10000L, slideMs = 5000L, latenessMs = 0L)
    val expected = Vector((-5000L, 1L, 1L), (0L, 3L, 2L), (5000L, 14L, 3L))
    assert(fires.sorted == expected.sorted, s"main sink diverged: $fires")
    assert(late == Vector(16L), s"late sink diverged: $late")
    assert(dropped == 0, s"engine pre-dropped $dropped rows")
  }

  test("sliding with allowedLateness: allowed-late arrival re-fires both panes") {
    val (fires, late, dropped) = run(Seq(
      Seq((10L, 1000L, 12000L)), // wm 12000 fires [-5000,5000)=10, [0,10000)=10
      Seq((7L, 3000L, 12001L))   // within lateness → immediate re-fire of both panes
    ), sizeMs = 10000L, slideMs = 5000L, latenessMs = 10000L)
    // count=1 rows are the first fires, count=2 the allowed-late re-fires
    val expected = Vector(
      (-5000L, 10L, 1L), (0L, 10L, 1L),  // first fires
      (-5000L, 17L, 2L), (0L, 17L, 2L))  // allowed-late re-fires
    assert(fires.sorted == expected.sorted, s"main sink diverged: $fires")
    assert(late.isEmpty, s"late sink not empty: $late")
    assert(dropped == 0, s"engine pre-dropped $dropped rows")
  }
}
