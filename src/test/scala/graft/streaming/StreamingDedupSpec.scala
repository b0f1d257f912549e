package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dedup-on-ingest: first occurrence kept, in-horizon duplicates
  * dropped, and duplicates arriving after watermark eviction admitted
  * again (the documented horizon contract). */
class StreamingDedupSpec extends SparkSpec {

  test("dropDuplicatesWithinWatermark keeps first occurrence; horizon bounds state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Long)] // (text, event-time seconds)
    val docs = input.toDS()
      .select(col("_1").as("text"), timestamp_seconds(col("_2")).as("ts"))
    val q = StreamingDedup.dedupOnIngest(docs, "5 seconds")
      .select("text", "content_hash")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // batch 1: A twice + B once → A's duplicate dropped in-batch
      input.addData(("docA", 1L), ("docA", 2L), ("docB", 3L))
      q.processAllAvailable()
      assert(s.table("sdedup").groupBy("text").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("docA" -> 1L, "docB" -> 1L))
      // batch 2: A again while still inside the 5 s horizon → dropped
      input.addData(("docA", 4L))
      q.processAllAvailable()
      assert(s.table("sdedup").filter("text = 'docA'").count() == 1)
      // advance the watermark far past A's eviction point, then replay A:
      // its state row is gone, so the late duplicate is admitted — state
      // is bounded by the horizon, exactly as documented
      input.addData(("docC", 100L))
      q.processAllAvailable()
      input.addData(("docA", 101L))
      q.processAllAvailable()
      assert(s.table("sdedup").filter("text = 'docA'").count() == 2)
    } finally q.stop()
  }
}
