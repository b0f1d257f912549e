package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** Typed multimodal record API — media payloads as opaque bytes with
  * structured metadata, and a per-partition feature extractor in the
  * shape a real decoder uses (batched, codec initialized once per
  * partition, payload bytes touched only inside the extractor).
  *
  * THE DECODE IS A STUB: this container has no image/audio codecs, so
  * `StubDecoder` derives deterministic fake features from the bytes.
  * A production deployment swaps in a real `Decoder` (e.g. JNI codec)
  * without touching the pipeline shape — the partition iterator,
  * schema, and metadata-only column pruning stay identical.
  */
object Media {

  final case class MediaMeta(sourceId: String, modality: String,
                             declaredBytes: Long)
  final case class MediaRecord(mediaId: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(mediaId: Long, modality: String,
                                 byteLen: Long, width: Int, height: Int,
                                 fingerprint: String)

  /** Per-partition decoder contract: heavyweight init in the factory,
    * cheap per-record decode. */
  trait Decoder extends AutoCloseable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** STUB decode: deterministic fakes from payload bytes (no codecs in
    * the build container). */
  final class StubDecoder extends Decoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val len = r.payload.length.toLong
      MediaFeatures(r.mediaId, r.meta.modality, len,
        width = (len % 640).toInt, height = (len * 7 % 480).toInt,
        fingerprint = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).take(8).map("%02x".format(_)).mkString)
    }
    def close(): Unit = ()
  }

  /** Feature extraction over a media Dataset: decoder per partition,
    * records streamed through it (never collected). */
  def extractFeatures(ds: Dataset[MediaRecord],
                      decoderFactory: () => Decoder = () => new StubDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { rows =>
      val dec = decoderFactory()
      // close exactly once at task completion (covers partial consumption)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      rows.map(dec.decode)
    }
  }
}
