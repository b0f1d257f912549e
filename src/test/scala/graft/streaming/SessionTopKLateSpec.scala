package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import SessionTopKState._

/** Hand-traced allowedLateness on MERGING session windows — the last
  * cell of the lateness matrix (test/WindowTest.java:205-242's
  * session-merge walkthrough composed with
  * test/EventTimeTest.java:241-327's fire/re-fire/side-output rules):
  * fired sessions are retained through the lateness horizon, an
  * allowed-late event BRIDGES two already-fired sessions into one fused
  * session whose merged sketch re-fires under the fused coordinates,
  * and a beyond-lateness arrival emerges as a kind='late' row. */
class SessionTopKLateSpec extends SparkSpec {

  private val Gap = 10000L      // 10 s
  private val Lateness = 20000L // 20 s

  private def harness(name: String) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, String, Long, Long)] // key,item,tsSec,wmSec
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("item"),
        timestamp_seconds(col("_3")).as("ts"),
        timestamp_seconds(col("_4")).as("wmTs"))
      .withWatermark("wmTs", "0 seconds")
      .as[InL]
    val q = SessionTopKState.lateCarrier(evs, Gap, Lateness)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    (input, q, () => s.table(name).as[OutL].collect().toVector)
  }

  test("late bridge event merges two FIRED sessions and re-fires the fused sketch") {
    val (input, q, rows) = harness("sess_late_bridge")
    try {
      def step(batch: (String, String, Long, Long)*): Unit = {
        input.addData(batch: _*); q.processAllAvailable()
      }
      // session A [1,12): x,x — session B [20,30): y; wm 3 → nothing fires
      step(("a", "x", 1L, 1L), ("a", "x", 2L, 2L), ("a", "y", 20L, 3L))
      assert(rows().isEmpty, "fired before watermark passed a session end")

      // wm → 31: fires A (x:2) and B (y:1); both retained (purge bounds
      // 31.999 s and 49.999 s sit past the watermark)
      step(("a", "c", 60L, 31L))
      val fires1 = rows()
      assert(fires1.map(o => (o.kind, o.sessionStart, o.sessionEnd, o.rank, o.item, o.count, o.n)) ==
        Vector(("fire", 1000L, 12000L, 1L, "x", 2L, 2L),
               ("fire", 20000L, 30000L, 1L, "y", 1L, 1L)),
        s"initial session fires mismatch: $fires1")

      // THE merge case: late event at ts 11 s (reach [11,21)) bridges
      // fired A ([1,12)) and fired B ([20,30)) — ONE re-fire of the
      // fused [1,30) session with the MERGED tables: x 2+1, y 1, n 4
      step(("a", "x", 11L, 32L))
      val refire = rows().drop(fires1.size)
      assert(refire.map(o => (o.kind, o.sessionStart, o.sessionEnd, o.rank, o.item, o.count, o.n)) ==
        Vector(("fire", 1000L, 30000L, 1L, "x", 3L, 4L),
               ("fire", 1000L, 30000L, 2L, "y", 1L, 4L)),
        s"fused re-fire mismatch: $refire")

      // wm → 80: fused [1,30) purges (49.999 s ≤ 80 s) without
      // re-emitting; open session C [60,70) fires
      step(("a", "d", 95L, 80L))
      val fires2 = rows().drop(fires1.size + refire.size)
      assert(fires2.map(o => (o.kind, o.sessionStart, o.item, o.count)) ==
        Vector(("fire", 60000L, "c", 1L)), s"post-purge fires mismatch: $fires2")

      // beyond lateness: ts 5 s window [5,15) ends 34.999 s ≤ wm 80 s and
      // overlaps nothing retained → side output, no re-fire of anything
      step(("a", "q", 5L, 81L))
      val late = rows().filter(_.kind == "late")
      assert(late.map(o => (o.sessionStart, o.sessionEnd, o.rank, o.item, o.count)) ==
        Vector((5000L, 15000L, 0L, "q", 1L)), s"late side output mismatch: $late")
      assert(rows().count(_.kind == "fire") == fires1.size + refire.size + 1,
        "beyond-lateness arrival must not re-fire purged sessions")
    } finally q.stop()
  }

  test("several allowed-late events for one fired session emit ONE fused row-set") {
    val (input, q, rows) = harness("sess_late_batch")
    try {
      def step(batch: (String, String, Long, Long)*): Unit = {
        input.addData(batch: _*); q.processAllAvailable()
      }
      step(("a", "x", 1L, 1L))
      step(("a", "c", 60L, 15L)) // wm 15 fires [1,11): x(1)
      val fired = rows()
      assert(fired.map(o => (o.kind, o.item, o.count)) == Vector(("fire", "x", 1L)),
        s"setup fire mismatch: $fired")
      // three late events in ONE batch, all folding into the fired
      // session (ts 2,3,4 s, wm nudged to 16 s so the carrier rows clear the
      // late-row filter): exactly one
      // re-fired row-set with the final counts and extended end [1,14)
      step(("a", "x", 2L, 16L), ("a", "y", 3L, 16L), ("a", "x", 4L, 16L))
      val refire = rows().drop(fired.size)
      assert(refire.map(o => (o.kind, o.sessionStart, o.sessionEnd, o.rank, o.item, o.count, o.n)) ==
        Vector(("fire", 1000L, 14000L, 1L, "x", 3L, 4L),
               ("fire", 1000L, 14000L, 2L, "y", 1L, 4L)),
        s"batched late fold must emit one final row-set: $refire")
    } finally q.stop()
  }

  test("an allowed-late event extending a fired session BEYOND the watermark defers the re-fire") {
    val (input, q, rows) = harness("sess_late_defer")
    try {
      def step(batch: (String, String, Long, Long)*): Unit = {
        input.addData(batch: _*); q.processAllAvailable()
      }
      step(("a", "x", 1L, 1L))
      step(("a", "c", 60L, 15L)) // fires [1,11): x(1)
      val fired = rows()
      // late event at ts 14 s: reach [14,24) overlaps [1,11)? no — but
      // ts 10 s does ([10,20) vs [1,11)): fuses and extends end to 20 s,
      // PAST wm 15 → no immediate re-fire; fires when wm passes 20 s
      step(("a", "y", 10L, 16L))
      assert(rows().size == fired.size,
        "extension past the watermark must defer the fire to the new end")
      step(("a", "d", 90L, 30L)) // wm 30 → fused [1,20) fires: x1 y1
      val refire = rows().drop(fired.size)
      assert(refire.map(o => (o.kind, o.sessionStart, o.sessionEnd, o.rank, o.item, o.count, o.n)) ==
        Vector(("fire", 1000L, 20000L, 1L, "x", 1L, 2L),
               ("fire", 1000L, 20000L, 2L, "y", 1L, 2L)),
        s"deferred fused fire mismatch: $refire")
    } finally q.stop()
  }
}
