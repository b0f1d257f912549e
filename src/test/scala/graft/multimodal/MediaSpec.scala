package graft.multimodal

import graft.SparkSpec
import graft.streaming.SideOutputs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import Media._
import scala.collection.mutable

class MediaSpec extends SparkSpec {

  test("typed media pipeline: decoder per partition, metadata-only pruning") {
    val s = spark
    import s.implicits._
    val recs = (1 to 100).map { i =>
      MediaRecord(i.toLong,
        MediaMeta(s"src${i % 4}", Seq("image", "audio", "video")(i % 3), i * 10L),
        Array.fill(i)(i.toByte))
    }
    val ds = s.createDataset(recs).repartition(4)
    val feats = extractFeatures(ds).collect().sortBy(_.mediaId)
    assert(feats.length == 100)
    assert(feats.head.byteLen == 1L && feats.last.byteLen == 100L)
    assert(feats.forall(_.fingerprint.length == 16))
    // metadata-only query prunes the payload column from the scan
    val metaOnly = ds.select("mediaId", "meta.modality")
    val schemaRead = metaOnly.queryExecution.optimizedPlan.schema.fieldNames.toSet
    assert(!schemaRead.contains("payload"))
  }

  test("SideOutputs.fanOut routes a stream to multiple sinks in one pass") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val big = mutable.ArrayBuffer[Long]()
    val small = mutable.ArrayBuffer[Long]()
    val input = MemoryStream[Long]
    val q = SideOutputs.start(input.toDS().toDF("v"), Seq(
      "v >= 10" -> { df => big.synchronized {
        big ++= df.select("v").as[Long](s.implicits.newLongEncoder).collect() } },
      "v < 10" -> { df => small.synchronized {
        small ++= df.select("v").as[Long](s.implicits.newLongEncoder).collect() } }))
    try {
      input.addData(1L, 15L, 7L, 30L)
      q.processAllAvailable()
      assert(big.sorted.toSeq == Seq(15L, 30L))
      assert(small.sorted.toSeq == Seq(1L, 7L))
    } finally q.stop()
  }
}
