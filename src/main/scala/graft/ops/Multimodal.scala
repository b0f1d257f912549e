package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus feature-extraction and frame-sampling over them.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * `fake_width`/`fake_height` are deterministic fakes derived from the
  * payload (clearly marked below). Everything around the stub is the real
  * Spark-side design: binary columns survive parquet round-trips, the
  * per-record work is a narrow map stage (no shuffle), and at 100 TB the
  * payloads stay columnar-compressed with metadata readable WITHOUT
  * fetching payload bytes (column pruning drops `payload` for
  * metadata-only queries).
  *
  * The typed API (graft.multimodal.Media) carries the same schema through
  * a Dataset[MediaRecord] with a mapPartitions-based extractor, the shape
  * a real decoder (batched, per-partition codec init) would use.
  */
object Multimodal {

  /** Batch query: synthesize a payload per document (utf-8 bytes of the
    * text — a stand-in for real image/audio bytes), attach modality
    * metadata, extract features, sample 4 "frames". */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"),
        encode(col("text"), "utf-8").as("payload"))
      .select(
        col("doc_id"),
        // modality from the source id: src<k> → k % 3
        expr("element_at(array('image', 'audio', 'video'), CAST(substring(source, 4, 10) AS INT) % 3 + 1)")
          .as("modality"),
        length(col("payload")).cast("long").as("byte_len"),
        hex(encode(expr("substring(text, 1, 8)"), "utf-8")).as("header_hex"), // 8 CHARS, matching the oracle's substr
        // STUB decode: real decoders need codec libs absent from this
        // container; deterministic fakes keep the pipeline testable.
        (length(col("payload")) % 640).cast("long").as("fake_width"),
        (length(col("payload")) * 7 % 480).cast("long").as("fake_height"),
        // frame sampling: 4 evenly-spaced 64-char slices, fingerprinted
        concat_ws(",",
          (0 until 4).map(i => md5(substring(col("text"), 1 + i * 64, 64))): _*)
          .as("frames"))
      .orderBy("doc_id")

  def multimodalFeaturesSql: String = {
    val frames = (0 until 4).map(i => s"md5(substr(text, ${1 + i * 64}, 64))")
      .mkString(" || ',' || ")
    s"""SELECT doc_id,
       |  ['image', 'audio', 'video'][CAST(substr(source, 4) AS INT) % 3 + 1] AS modality,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |  hex(substr(text, 1, 8)) AS header_hex,
       |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
       |  CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS fake_height,
       |  $frames AS frames
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "multimodal_features" -> multimodalFeaturesSql,
  )
}
