package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** J1 streaming form (reference: test/WindowTest.java:410-425): two live
  * event streams, watermarked, inner-joined on (key, tumbling window).
  * Asserts the per-window pair semantics AND that join state is evicted
  * once the watermark passes a window — the property that makes the
  * operator runnable against unbounded streams. */
class StreamJoinSpec extends SparkSpec {

  test("watermarked stream-stream window join emits per-window pairs and evicts state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val views = MemoryStream[(String, Long, String)]  // (user, epochSec, view_id)
    val clicks = MemoryStream[(String, Long, String)] // (user, epochSec, click_id)
    def shape(ms: MemoryStream[(String, Long, String)], idName: String) =
      ms.toDS().select(col("_1").as("user_id"),
        timestamp_seconds(col("_2")).as("ts"), col("_3").as(idName))
    val joined = StreamJoins.windowJoin(
      shape(views, "view_id"), shape(clicks, "click_id"),
      "user_id", "ts", dur = "3 seconds", delay = "2 seconds")
      .select("user_id", "window_start", "view_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      // window [0,3): u1 has 2 views x 1 click -> 2 pairs; u2 view-only -> none.
      // window [3,6): u1 click-only -> no pair.
      views.addData(("u1", 1L, "v1"), ("u1", 2L, "v2"), ("u2", 1L, "v3"))
      clicks.addData(("u1", 2L, "c1"), ("u1", 4L, "c2"))
      q.processAllAvailable()
      // a join emits as soon as both sides are present (no window-close
      // wait for INNER join output) — both [0,3) pairs are already out
      val early = s.table("ssj").as[(String, Long, String, String)].collect().toSet
      assert(early == Set(("u1", 0L, "v1", "c1"), ("u1", 0L, "v2", "c1")))

      // advance both watermarks past [0,3): ts=10 -> wm = 10-2 = 8
      views.addData(("u1", 10L, "v4"))
      clicks.addData(("u1", 10L, "c3"))
      q.processAllAvailable()
      // one more batch so the state-cleanup metrics land in a progress line
      views.addData(("u1", 11L, "v5"))
      clicks.addData(("u2", 11L, "c4"))
      q.processAllAvailable()

      // late-but-in-window arrivals for [0,3) are now behind the watermark:
      // state for that window was evicted, so no new pairs may appear
      views.addData(("u1", 1L, "v-late"))
      clicks.addData(("u1", 2L, "c-late"))
      q.processAllAvailable()
      val all = s.table("ssj").as[(String, Long, String, String)].collect().toSet
      assert(all == Set(
        ("u1", 0L, "v1", "c1"), ("u1", 0L, "v2", "c1"),
        ("u1", 9L, "v4", "c3"),   // window [9,12) pair from the advance batch
        ("u1", 9L, "v5", "c3"))) // v5@11 joins c3@10 in [9,12)
      assert(!all.exists { case (_, _, v, c) => v == "v-late" || c == "c-late" })

      // state eviction is observable in the operator metrics: rows were
      // removed when the watermark crossed window [0,3)
      val progresses = q.recentProgress.toSeq
      val removed = progresses.flatMap(_.stateOperators.toSeq)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, s"expected watermark eviction from join state; " +
        s"progress lines: ${progresses.map(_.stateOperators.map(so =>
          (so.numRowsTotal, so.numRowsRemoved)).toSeq)}")
    } finally q.stop()
  }
}
