package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import WindowedTopKState._

/** Hand-traced allowedLateness lifecycle for the windowed heavy-hitters
  * machine (lateCarrier): initial fire on watermark passage, an
  * allowed-late arrival folding in and RE-firing the updated top-k
  * (Update mode), and a beyond-lateness arrival emerging as a
  * kind='late' side-output row — test/EventTimeTest.java:241-327's
  * fire/re-fire/side-output rules over the sketch-aggregate window. */
class WindowedTopKLateSpec extends SparkSpec {

  test("fire, allowed-late re-fire with updated counts, then late side output") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // (key, item, tsSec, wmSec): watermark rides the carrier column
    val input = MemoryStream[(String, String, Long, Long)]
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("item"),
        timestamp_seconds(col("_3")).as("ts"),
        timestamp_seconds(col("_4")).as("wmTs"))
      .withWatermark("wmTs", "0 seconds")
      .as[InW]
    val q = WindowedTopKState.lateCarrier(evs, sizeMs = 10000L, allowedLatenessMs = 5000L)
      .writeStream.format("memory").queryName("wtopk_late")
      .outputMode("update").start()
    try {
      def rows() = s.table("wtopk_late").as[OutL].collect().toVector
      def step(batch: (String, String, Long, Long)*): Unit = {
        input.addData(batch: _*); q.processAllAvailable()
      }

      // window [0,10000): x,x,y — wm still below end, nothing fires
      step(("a", "x", 1L, 1L), ("a", "x", 2L, 2L), ("a", "y", 3L, 3L))
      assert(rows().isEmpty, "fired before watermark passed window end")

      // carrier drives wm to 12 s at batch end; the armed timeout then
      // fires [0,10000) in the follow-up micro-batch: x(2), y(1)
      step(("a", "z", 11L, 12L))
      val fire1 = rows()
      assert(fire1.map(o => (o.kind, o.windowStart, o.rank, o.item, o.count, o.n)) ==
        Vector(("fire", 0L, 1L, "x", 2L, 3L), ("fire", 0L, 2L, "y", 1L, 3L)),
        s"initial fire mismatch: $fire1")

      // second event into the OPEN [10000,20000) window; no new output
      step(("a", "z", 13L, 13L))
      assert(rows().size == fire1.size, "fired window must not re-fire without late data")

      // ALLOWED-late arrival (ts 5 s, wm 13 s < end+lateness 15 s):
      // folds in and re-fires the updated top-k immediately
      step(("a", "x", 5L, 14L))
      val refire = rows().drop(fire1.size)
      assert(refire.map(o => (o.kind, o.windowStart, o.rank, o.item, o.count, o.n)) ==
        Vector(("fire", 0L, 1L, "x", 3L, 4L), ("fire", 0L, 2L, "y", 1L, 4L)),
        s"allowed-late re-fire mismatch: $refire")

      // drive wm to 21 s (past end+lateness=15 s) — purges [0,10000)
      // and fires [10000,20000): z(2)
      step(("a", "q", 21L, 21L))
      step(("a", "q2", 22L, 22L))
      val w10fire = rows().filter(o => o.windowStart == 10000L && o.kind == "fire")
      assert(w10fire.map(o => (o.rank, o.item, o.count)) == Vector((1L, "z", 2L)),
        s"window [10000,20000) fire mismatch: $w10fire")

      // BEYOND-lateness arrival for [0,10000) → kind='late' side output
      step(("a", "y", 6L, 23L))
      val late = rows().filter(_.kind == "late")
      assert(late.map(o => (o.windowStart, o.rank, o.item, o.count)) ==
        Vector((0L, 0L, "y", 1L)), s"late side output mismatch: $late")

      // and it must NOT have re-fired the purged window
      val w0fires = rows().filter(o => o.windowStart == 0L && o.kind == "fire")
      assert(w0fires.size == 4, s"purged window re-fired: $w0fires")
    } finally q.stop()
  }

  test("several allowed-late events in one batch emit ONE row-set per window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, String, Long, Long)]
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("item"),
        timestamp_seconds(col("_3")).as("ts"),
        timestamp_seconds(col("_4")).as("wmTs"))
      .withWatermark("wmTs", "0 seconds")
      .as[InW]
    val q = WindowedTopKState.lateCarrier(evs, sizeMs = 10000L, allowedLatenessMs = 10000L)
      .writeStream.format("memory").queryName("wtopk_late_batch")
      .outputMode("update").start()
    try {
      def rows() = s.table("wtopk_late_batch").as[OutL].collect().toVector
      def step(batch: (String, String, Long, Long)*): Unit = {
        input.addData(batch: _*); q.processAllAvailable()
      }
      step(("a", "x", 1L, 1L)); step(("a", "c", 11L, 12L)) // fire [0,10000): x(1)
      val fired = rows()
      assert(fired.map(o => (o.kind, o.item, o.count)) == Vector(("fire", "x", 1L)),
        s"setup fire mismatch: $fired")
      // THREE allowed-late events for the fired window in ONE batch:
      // exactly one re-fired row-set with the final counts — no
      // intermediate (x,2)/(y,1) emissions, no same-batch duplicate
      // (key, windowStart, rank) coordinates for append-style consumers
      step(("a", "x", 2L, 13L), ("a", "y", 3L, 13L), ("a", "x", 4L, 13L))
      val refire = rows().drop(fired.size)
      assert(refire.map(o => (o.kind, o.windowStart, o.rank, o.item, o.count, o.n)) ==
        Vector(("fire", 0L, 1L, "x", 3L, 4L), ("fire", 0L, 2L, "y", 1L, 4L)),
        s"batched late events must emit one final row-set: $refire")
    } finally q.stop()
  }
}
