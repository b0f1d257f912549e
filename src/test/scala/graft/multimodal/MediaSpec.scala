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

  test("frame_sample: empty payloads emit no frames (sequence(1,0) is descending, not empty)") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-frames").toString
    Seq((1L, "", "en", "web", 0L), (2L, "one tiny doc", "en", "web", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.ops.Multimodal.frameSample(s, tmp)
      .select("doc_id").as[Long].collect()
    assert(rows.toSeq == Seq(2L), s"empty doc must emit zero frames, got ${rows.toSeq}")
  }

  test("frame_sample: stride/cap arithmetic and per-frame independence") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val frames = graft.ops.Multimodal.frameSample(s, dir)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_._1)
    val lens = graft.Tables.documents(s, dir)
      .selectExpr("doc_id", "length(text) AS n").as[(Long, Long)].collect().toMap
    byDoc.foreach { case (doc, fs) =>
      val expected = math.min((lens(doc) + 63) / 64, 8L)
      assert(fs.length == expected, s"doc $doc: ${fs.length} frames, expected $expected")
      // frame indexes are 1..n with offsets at the fixed stride
      assert(fs.map(_._2).sorted.toSeq == (1L to expected))
      fs.foreach { case (_, idx, off, bytes, md5hex) =>
        assert(off == (idx - 1) * 64 + 1)
        assert(bytes > 0 && bytes <= 64)
        assert(md5hex.length == 32)
      }
    }
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
