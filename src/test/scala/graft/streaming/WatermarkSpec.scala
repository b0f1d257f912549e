package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S7/W7/W11 native Structured Streaming path: MemoryStream with an event
  * timestamp → withWatermark → tumbling window aggregation in append mode.
  * Spark's watermark advances per micro-batch from max(eventTime) - delay
  * (vs Flink's per-record emit — the SURVEY §7.4(1) documented delta);
  * fire/drop behavior beyond that matches the reference's rules. */
class WatermarkSpec extends SparkSpec {

  test("tumbling event-time window fires when watermark passes, late row dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Int, Long)] // (key, value, epochSec)
    val windowed = input.toDS()
      .select(col("_1").as("k"), col("_2").as("v"),
        timestamp_seconds(col("_3")).as("ts"))
      .withWatermark("ts", "2 seconds")
      .groupBy(col("k"), window(col("ts"), "3 seconds"))
      .agg(sum("v").as("total"))
      .select(col("k"), col("window.start").cast("long").as("ws"), col("total"))
    val q = windowed.writeStream.format("memory").queryName("wm1")
      .outputMode("append").start()
    try {
      // batch 1: fill window [0,3); watermark after batch = 2 - 2 = 0
      input.addData(("a", 35, 1L), ("a", 20, 2L))
      q.processAllAvailable()
      // batch 2: event at 10 pushes watermark to 8 → [0,3) closes+fires
      input.addData(("a", 60, 10L))
      q.processAllAvailable()
      val fired = s.table("wm1").as[(String, Long, Long)].collect().toSet
      assert(fired == Set(("a", 0L, 55L)))

      // batch 3: ts=1 is far behind watermark 8 → dropped, never fires
      input.addData(("a", 99, 1L))
      q.processAllAvailable()
      // batch 4: advance far enough to close [9,12) too
      input.addData(("a", 1, 20L))
      q.processAllAvailable()
      val all = s.table("wm1").as[(String, Long, Long)].collect().toSet
      assert(all == Set(("a", 0L, 55L), ("a", 9L, 60L)))
    } finally q.stop()
  }

  test("session_window merges in streaming mode with watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Int, Long)]
    val sessions = input.toDS()
      .select(col("_1").as("k"), col("_2").as("v"),
        timestamp_seconds(col("_3")).as("ts"))
      .withWatermark("ts", "1 second")
      .groupBy(col("k"), session_window(col("ts"), "2 seconds"))
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .select(col("k"),
        col("session_window.start").cast("long").as("ss"),
        col("session_window.end").cast("long").as("se"),
        col("total"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("wm2")
      .outputMode("append").start()
    try {
      // two events 1s apart merge into one session [1, 2+2)
      input.addData(("a", 21, 1L), ("a", 32, 2L))
      q.processAllAvailable()
      input.addData(("a", 13, 30L)) // watermark 29 closes the session
      q.processAllAvailable()
      val fired = s.table("wm2").as[(String, Long, Long, Long, Long)].collect().toSet
      assert(fired == Set(("a", 1L, 4L, 53L, 2L)))
    } finally q.stop()
  }
}
