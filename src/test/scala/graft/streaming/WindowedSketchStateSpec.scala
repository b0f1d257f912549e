package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import WindowedSketchState._

/** Per-window HLL: small windows count EXACTLY (linear-counting range),
  * estimates land within rsd of truth for larger populations, windows
  * fire once on watermark passage and never re-fire, and the quiet-key
  * timer path works. */
class WindowedSketchStateSpec extends SparkSpec {

  private def startQuery(input: MemoryStream[(String, Long, Long)], name: String) = {
    val s = spark
    import s.implicits._
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("item"),
        timestamp_seconds(col("_3")).as("ts"))
      .withWatermark("ts", "2 seconds")
      .as[In]
    WindowedSketchState(evs, sizeMs = 3000L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  test("per-window estimates: exact in the small range, fire-once, discard after fire") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Long)] // key, item, epochSec
    val q = startQuery(input, "wsk1")
    try {
      def rows() = s.table("wsk1").as[Out].collect().toVector
      // window [0,3000): items {10,11,12,10} → 3 distinct (exact via
      // linear counting at this scale); [3000,6000): {7} → 1
      input.addData(("a", 10L, 1L), ("a", 11L, 1L), ("a", 12L, 2L),
        ("a", 10L, 2L), ("a", 7L, 4L))
      q.processAllAvailable()
      input.addData(("a", 99L, 6L)) // wm → 4000 after this batch
      q.processAllAvailable()
      input.addData(("a", 98L, 8L)) // tick: fire [0,3000)
      q.processAllAvailable()
      val w0 = rows().filter(_.windowStart == 0L)
      assert(w0 == Vector(Out("a", 0L, 3L)), s"exact small-range count: $w0")

      // post-fire arrival discarded, never re-fired
      input.addData(("a", 55L, 1L))
      q.processAllAvailable()
      input.addData(("a", 97L, 9L))
      q.processAllAvailable()
      assert(rows().filter(_.windowStart == 0L) == w0)
      // the second window fired too, exactly once
      assert(rows().filter(_.windowStart == 3000L) == Vector(Out("a", 3000L, 1L)))
    } finally q.stop()
  }

  test("estimate accuracy within rsd for a 20k-item window; quiet key fires by timer") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = startQuery(input, "wsk2")
    try {
      val n = 20000
      // 20k distinct items in [0,3000), then silence on this key
      input.addData((1 to n).map(i => ("big", i.toLong * 2654435761L, (i % 2 + 1).toLong)): _*)
      q.processAllAvailable()
      input.addData(("drv", 1L, 6L)) // advance wm
      q.processAllAvailable()
      input.addData(("drv", 2L, 7L)) // tick: timer fires "big"
      q.processAllAvailable()
      val est = s.table("wsk2").as[Out].collect()
        .filter(o => o.key == "big" && o.windowStart == 0L)
      assert(est.length == 1, s"fire-once: $est")
      val rsd = 1.04 / math.sqrt(SketchState.M.toDouble)
      assert(math.abs(est.head.estimate - n.toDouble) / n < 4 * rsd,
        s"estimate ${est.head.estimate} vs $n outside 4·rsd")
    } finally q.stop()
  }
}
