package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import SessionWindowState._

/** The reference's session-merge walkthrough (WindowTest:222-242)
  * running live: overlapping sessions merge, fire when the watermark
  * passes, per-key isolation holds — plus the allowedLateness contract
  * (retain fired sessions, merge late-but-allowed arrivals, re-fire). */
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

  test("allowedLateness transition: late-but-allowed merge re-fires; beyond-horizon drops " +
       "(WindowTest:222-242 walkthrough + lateness)") {
    val gap = 2000L; val lateness = 5000L
    // step 1 — the walkthrough's tuple1+tuple2 (:227-229): [1000,3000) and
    // [1500,3500) merge to [1000,3500); no watermark yet, nothing fires
    val (out1, st1) = advance("a", Vector.empty,
      Seq((1000L, 21L), (1500L, 32L)), Long.MinValue, gap, lateness)
    assert(out1.isEmpty && st1 == Vector((1000L, 3500L, 53L, 2L, true)))

    // step 2 — tuple3 (:230-231): wm 5500 passes the merged end → fire.
    // With lateness the fired session is RETAINED (3499+5000 > 5500),
    // where the lateness-0 operator purged it at fire time
    val (out2, st2) = advance("a", st1, Seq((3600L, 13L)), 5500L, gap, lateness)
    assert(out2 == Vector(SessOut("a", 1000L, 3500L, 53L, 2L)))
    assert(st2.toSet == Set((1000L, 3500L, 53L, 2L, false), (3600L, 5600L, 13L, 1L, true)))

    // step 3 — late-but-allowed arrival: ts=1200 is behind wm 5500, but
    // its post-merge window [1000,3500) satisfies end-1+lateness > wm →
    // KEPT (Flink's mergeWindows-then-isWindowLate order), merged into
    // the fired session, and re-fired immediately with updated contents.
    // (ts is chosen so [1200,3200) touches ONLY the fired session; a
    // later ts would bridge into the open [3600,5600) session and the
    // merge would go back to waiting instead — also Flink behavior)
    val (out3, st3) = advance("a", st2, Seq((1200L, 7L)), 5500L, gap, lateness)
    assert(out3 == Vector(SessOut("a", 1000L, 3500L, 60L, 3L)),
      s"expected immediate re-fire, got $out3")
    assert(st3.contains((1000L, 3500L, 60L, 3L, false)))

    // step 4 — watermark sweep to 11000: [3600,5600) fires; both sessions
    // are then past end-1+lateness and leave state
    val (out4, st4) = advance("a", st3, Nil, 11000L, gap, lateness)
    assert(out4 == Vector(SessOut("a", 3600L, 5600L, 13L, 1L)))
    assert(st4.isEmpty)

    // step 5 — beyond-horizon: nothing overlaps ts=1000 anymore and its
    // own window [1000,3000) has 2999+5000 <= 11000 → dropped, no state
    val (out5, st5) = advance("a", st4, Seq((1000L, 99L)), 11000L, gap, lateness)
    assert(out5.isEmpty && st5.isEmpty)
  }

  test("allowedLateness live: a fired session is retained and re-fires on a touching arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Long)] // key, value, epochMs
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("value"),
        timestamp_millis(col("_3")).as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[Ev]
    val q = SessionWindowState.session(evs, gapMs = 2000L, allowedLatenessMs = 5000L)
      .writeStream.format("memory").queryName("sws_late")
      .outputMode("append").start()
    try {
      // the walkthrough sessions: [1000,3000) + [1500,3500) → [1000,3500)
      input.addData(("a", 21L, 1000L), ("a", 32L, 1500L))
      q.processAllAvailable()
      // key "b" advances the QUERY watermark to exactly a's fire point
      // (3499) without touching a's sessions; a fires via its timer
      input.addData(("b", 1L, 3499L))
      q.processAllAvailable()
      val afterFire = s.table("sws_late").as[SessOut].collect().toVector
      assert(afterFire.contains(SessOut("a", 1000L, 3500L, 53L, 2L)),
        s"expected the merged session to fire at wm 3499, got $afterFire")

      // ts=3500 touches the FIRED session (TimeWindow.intersects keeps
      // touching windows): with lateness > 0 the session was retained, so
      // the arrival merges into it and extends it to [1000,5500) — a
      // lateness-0 operator would have purged at fire time and opened a
      // fresh [3500,5500) session instead
      input.addData(("a", 7L, 3500L))
      q.processAllAvailable()
      input.addData(("b", 1L, 12000L)) // wm → 12000: extended session re-fires
      q.processAllAvailable()
      input.addData(("b", 1L, 20000L)) // tick applies wm 12000 everywhere
      q.processAllAvailable()
      val all = s.table("sws_late").as[SessOut].collect().toVector
      assert(all.contains(SessOut("a", 1000L, 5500L, 60L, 3L)),
        s"expected re-fire of the extended session, got $all")
      assert(!all.contains(SessOut("a", 3500L, 5500L, 7L, 1L)),
        "the touching arrival must merge into the retained session, not open a new one")
    } finally q.stop()
  }
}
