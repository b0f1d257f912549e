package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import WindowedTopKState._

/** Hand-computed trace for the windowed heavy-hitters machine:
  * per-(key, window) SpaceSaving tables, top-k emitted exactly once
  * when the watermark passes window end, eviction inside a window,
  * post-fire arrivals discarded, quiet keys fired by timer, and the
  * state bound (≤ Capacity counters per live window). */
class WindowedTopKStateSpec extends SparkSpec {

  private def startQuery(input: MemoryStream[(String, String, Long)],
      name: String) = {
    val s = spark
    import s.implicits._
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("item"),
        timestamp_seconds(col("_3")).as("ts"))
      .withWatermark("ts", "2 seconds")
      .as[In]
    WindowedTopKState(evs, sizeMs = 3000L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  test("per-window top-k fires once on watermark passage; late arrivals discarded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, String, Long)] // key, item, epochSec
    val q = startQuery(input, "wtopk1")
    try {
      def rows() = s.table("wtopk1").as[Out].collect().toVector

      // window [0,3000): x twice, y once, z once → top3 = x(2), y(1), z(1)
      input.addData(("a", "x", 1L), ("a", "z", 1L), ("a", "x", 2L), ("a", "y", 2L))
      q.processAllAvailable()
      assert(rows().isEmpty, "watermark has not passed window end yet")

      // t=5s drives wm to 3000 ms at batch end; next tick fires [0,3000)
      input.addData(("a", "w5", 5L))
      q.processAllAvailable()
      input.addData(("a", "w6", 6L))
      q.processAllAvailable()
      val w0 = rows().filter(_.windowStart == 0L)
      assert(w0.map(o => (o.rank, o.item, o.count, o.err, o.n)) ==
        Vector((1L, "x", 2L, 0L, 4L), (2L, "y", 1L, 0L, 4L), (3L, "z", 1L, 0L, 4L)),
        s"hand trace mismatch: $w0")

      // post-fire arrival for [0,3000) must be discarded, never re-fired
      input.addData(("a", "x", 1L))
      q.processAllAvailable()
      input.addData(("a", "w7", 7L))
      q.processAllAvailable()
      assert(rows().filter(_.windowStart == 0L) == w0, "no re-fire, no dup")
    } finally q.stop()
  }

  test("eviction inside one window: SpaceSaving count/err carry the hand-computed values") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val q = startQuery(input, "wtopk2")
    try {
      // window [3000,6000): fill capacity (8) with i1..i8, then i9
      // evicts the (count,item)-min victim i1 (steals its count 1 as
      // err, entering at 2), then two more i9 → (4, err 1). n = 11.
      val fill = (1 to 8).map(i => ("b", s"i$i", 3L))
      input.addData(fill :+ (("b", "i9", 4L)) :+ (("b", "i9", 4L)) :+ (("b", "i9", 4L)): _*)
      q.processAllAvailable()
      input.addData(("b", "w9", 9L)) // wm → 7000: window fires
      q.processAllAvailable()
      input.addData(("b", "w10", 10L))
      q.processAllAvailable()
      val w3 = s.table("wtopk2").as[Out].collect().toVector
        .filter(_.windowStart == 3000L)
      assert(w3.map(o => (o.rank, o.item, o.count, o.err, o.n)) ==
        Vector((1L, "i9", 4L, 1L, 11L), (2L, "i2", 1L, 0L, 11L), (3L, "i3", 1L, 0L, 11L)),
        s"eviction trace mismatch: $w3")
    } finally q.stop()
  }

  test("quiet key fires by timer; state stays bounded at Capacity per live window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val q = startQuery(input, "wtopk3")
    try {
      // "quiet" fills [0,3000) then NEVER speaks again; 40 distinct items
      // must leave at most Capacity counters in state
      // ts ∈ {1s, 2s} — never 0: the engine's late filter measures
      // against the INITIAL watermark (0) on the first batch
      input.addData((1 to 40).map(i => ("quiet", f"q$i%02d", (i % 2 + 1).toLong)): _*)
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1, s"one (key) state row expected, got $stateRows")

      // another key advances the watermark; quiet's timer must fire it
      input.addData(("driver", "d", 6L))
      q.processAllAvailable()
      input.addData(("driver", "d", 7L))
      q.processAllAvailable()
      val quiet = s.table("wtopk3").as[Out].collect().toVector
        .filter(o => o.key == "quiet" && o.windowStart == 0L)
      assert(quiet.nonEmpty, "timer must fire the quiet key's window")
      assert(quiet.forall(_.n == 40L))
      // SpaceSaving bound: every emitted count ≤ n, err < count, and the
      // table the emission came from had ≤ Capacity counters — witnessed
      // by counts: with 40 distinct items in capacity 8, the top item's
      // over-estimate err must be > 0 (stealing happened)
      assert(quiet.head.err > 0L, "eviction must have produced over-estimates")
    } finally q.stop()
  }
}
