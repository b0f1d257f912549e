package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact dedup on ingest — the streaming complement to the batch dedup
  * family (graft.ops.Dedup): keep the FIRST occurrence of each content
  * hash, dropping later duplicates as they arrive.
  *
  * State posture: `dropDuplicatesWithinWatermark` keeps one state row
  * per distinct hash and EVICTS it once the watermark passes the
  * event's time + the watermark delay — so state is bounded by the
  * dedup horizon, not the stream's lifetime. That is the only honest
  * contract at 100 TB/day: global forever-dedup on ingest would grow
  * state without bound; beyond the horizon, the batch jobs
  * (dedup_exact / minhash / simhash) own global dedup.
  */
object StreamingDedup {

  /** docs: a streaming DataFrame with (text, ts TimestampType). Keeps
    * the first row per md5(text) within the watermark horizon. */
  def dedupOnIngest(docs: DataFrame, horizon: String = "10 seconds"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
