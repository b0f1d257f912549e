package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Remaining streaming forms: update-mode rolling aggregation (A2),
  * streaming exact dedup with a watermark (M5 stream path), and
  * foreachBatch side-output fan-out (T6/J8). */
class StreamingOpsSpec extends SparkSpec {

  test("A2 streaming: per-key running sum in update output mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = input.toDS().toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("memory").queryName("roll1")
      .outputMode("update").start()
    try {
      input.addData(("a", 5L), ("a", 3L), ("b", 1L))
      q.processAllAvailable()
      val afterB1 = s.table("roll1").as[(String, Long)].collect().toSet
      assert(afterB1 == Set(("a", 8L), ("b", 1L)))
      input.addData(("a", 2L))
      q.processAllAvailable()
      // update mode re-emits the refreshed running value for 'a' only —
      // Flink's rolling sum emits per record; Spark per trigger
      // (SURVEY §7.4(1) documented delta)
      val all = s.table("roll1").as[(String, Long)].collect()
      assert(all.count(_ == ("a", 10L)) == 1)
      assert(all.count(_._1 == "b") == 1)
    } finally q.stop()
  }

  test("M5 streaming dedup: dropDuplicatesWithinWatermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = input.toDS().toDF("doc", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark(Seq("doc"))
      .select("doc", "sec")
      .writeStream.format("memory").queryName("dedup1")
      .outputMode("append").start()
    try {
      input.addData(("d1", 1L), ("d1", 2L), ("d2", 3L))
      q.processAllAvailable()
      input.addData(("d1", 4L)) // dup within watermark window → dropped
      q.processAllAvailable()
      val docs = s.table("dedup1").as[(String, Long)].collect().map(_._1).sorted
      assert(docs.toSeq == Seq("d1", "d2"))
    } finally q.stop()
  }

  test("T6/J8 streaming: foreachBatch fans one stream out to two sinks") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val main = mutable.ArrayBuffer[Long]()
    val side = mutable.ArrayBuffer[Long]()
    val input = MemoryStream[Long]
    val q = input.toDS().toDF("v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cached = batch.cache() // one upstream pass, two sinks
        try {
          main.synchronized { main ++= cached.filter("v >= 10").select("v").as[Long](s.implicits.newLongEncoder).collect() }
          side.synchronized { side ++= cached.filter("v < 10").select("v").as[Long](s.implicits.newLongEncoder).collect() }
          ()
        } finally cached.unpersist()
      }
      .start()
    try {
      input.addData(3L, 12L, 7L, 40L)
      q.processAllAvailable()
      assert(main.sorted.toSeq == Seq(12L, 40L))
      assert(side.sorted.toSeq == Seq(3L, 7L))
    } finally q.stop()
  }
}
