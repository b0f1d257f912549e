package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import SessionWindowState._

/** The reference's session-merge walkthrough (WindowTest:222-242)
  * running live: overlapping sessions merge, fire when the watermark
  * passes, per-key isolation holds. */
class SessionWindowStateSpec extends SparkSpec {

  test("live session windows: gap merge + watermark fire (WindowTest:222-242)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Long)] // key, value, epochMs
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("value"),
        timestamp_millis(col("_3")).as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[Ev]
    val q = SessionWindowState.session(evs, gapMs = 2000L)
      .writeStream.format("memory").queryName("sws1")
      .outputMode("append").start()
    try {
      // [1000,3000) and [1500,3500) merge → [1000,3500) with both values
      input.addData(("a", 21L, 1000L), ("a", 32L, 1500L))
      q.processAllAvailable()
      // advance watermark far past the merged session end
      input.addData(("a", 13L, 10000L))
      q.processAllAvailable()
      input.addData(("a", 1L, 20000L)) // tick applies the new watermark
      q.processAllAvailable()
      val fired = s.table("sws1").as[SessOut].collect().toVector
      assert(fired.contains(SessOut("a", 1000L, 3500L, 53L, 2L)),
        s"expected merged session, got $fired")
      // the t=10s session also closed once wm reached 20s
      assert(fired.exists(f => f.sessionStart == 10000L && f.sum == 13L))
    } finally q.stop()
  }
}
