package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import CountWindowState._

/** Count windows / trigger+evictor via real streaming queries.
  * Flink semantics: count windows fire only when FULL
  * (reference: test/HelloWorldFlinkTest.java:100-103);
  * CountTrigger(2)+CountEvictor(5) fires every 2nd element over the last
  * ≤5 (reference: test/WindowTest.java:79-94). */
class CountWindowStateSpec extends SparkSpec {

  test("keyed countWindow(3): full windows fire, partial window never does") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KV]
    val q = countWindow(input.toDS(), 3)
      .writeStream.format("memory").queryName("cw1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1 to 7).map(i => KV("k", i.toLong, i.toLong)): _*)
      q.processAllAvailable()
      val out = s.table("cw1").as[WindowOut].collect().sortBy(_.windowId)
      // windows [1,2,3]=6 and [4,5,6]=15 fire; 7 stays buffered forever
      assert(out.toSeq == Seq(WindowOut("k", 0, 6, 3), WindowOut("k", 1, 15, 3)))

      // two more elements complete the third window across micro-batches
      input.addData(KV("k", 8, 8), KV("k", 9, 9))
      q.processAllAvailable()
      val out2 = s.table("cw1").as[WindowOut].collect().sortBy(_.windowId)
      assert(out2.length == 3 && out2.last.sum == 7 + 8 + 9)
    } finally q.stop()
  }

  test("CountTrigger(2) + CountEvictor(5): fire every 2nd over last <=5") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KV]
    val q = triggerEvictor(input.toDS(), fireEvery = 2, keep = 5)
      .writeStream.format("memory").queryName("cw2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1 to 8).map(i => KV("k", i.toLong, i.toLong)): _*)
      q.processAllAvailable()
      val out = s.table("cw2").as[WindowOut].collect().sortBy(_.windowId)
      // fires at n=2:[1,2]=3, n=4:[1..4]=10, n=6:[2..6]=20, n=8:[4..8]=30
      assert(out.map(o => (o.windowId, o.sum, o.n)).toSeq ==
        Seq((2L, 3L, 2), (4L, 10L, 4), (6L, 20L, 5), (8L, 30L, 5)))
    } finally q.stop()
  }
}
