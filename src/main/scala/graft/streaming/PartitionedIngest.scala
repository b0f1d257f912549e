package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The INGEST half of the time-series layout story: a continuous event
  * stream landing directly in the date-partitioned directory layout the
  * serving path reads (`storage/Layout.partitionedEvents` /
  * `plans/PartitionDateInference`), plus the two maintenance moves a
  * long-lived 100 TB events table cannot live without — sealing a sink
  * into a clean serving copy, and partition-horizon retention.
  *
  * Pipeline shape at scale: `start` appends each micro-batch's rows
  * into `ts_date=YYYY-MM-DD/` directories through Spark's
  * FileStreamSink, whose `_spark_metadata` commit log makes the set of
  * VISIBLE files transactional per batch — a reader through
  * `spark.read.parquet` sees only committed files, so a mid-batch
  * crash never exposes partial output, and restart-from-checkpoint
  * never double-commits a batch. The cost of that guarantee is that
  * the directory is owned by the log: compacting or deleting files
  * underneath it would desynchronize the log from the bytes. Hence
  * [[seal]]: one log-respecting rewrite into a PLAIN partitioned
  * layout (the nightly "close out the day" job), after which
  * [[graft.storage.Layout.compact]] and [[expirePartitions]] apply
  * freely and the serving path reads it like any other layout copy.
  */
object PartitionedIngest {

  /** Start appending `events` (must carry a TimestampType `ts`; a
    * watermark upstream bounds any stateful transforms before the
    * sink) into a date-partitioned parquet sink. The derived `ts_date`
    * partition column follows the `<col>_date` convention, so
    * ts-range predicates prune the sink's directories through
    * [[graft.plans.PartitionDateInference]] exactly as on the batch
    * layout. */
  def start(events: DataFrame, path: String, checkpoint: String): StreamingQuery =
    events.withColumn("ts_date", graft.storage.Layout.utcDate(col("ts")))
      .writeStream.format("parquet")
      .partitionBy("ts_date")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Seal a (stopped) streaming sink into a plain partitioned serving
    * copy at `servingPath`: the read respects the sink's
    * `_spark_metadata` commit log — exactly the committed rows, no
    * orphaned task files — and the rewrite coalesces each day's
    * accumulated micro-batch files into task-sized ones. After this,
    * the copy is an ordinary layout directory: compactable, expirable,
    * and free of the log's ownership. */
  def seal(spark: SparkSession, sinkPath: String, servingPath: String): Unit =
    spark.read.parquet(sinkPath)
      .write.mode("overwrite")
      .partitionBy("ts_date")
      .parquet(servingPath)

  /** Retention: drop every `ts_date=<day>` directory strictly OLDER
    * than `keepFrom` (ISO `YYYY-MM-DD`; lexicographic order IS
    * chronological for ISO dates). Directory-granular delete — the
    * whole point of date partitioning is that expiry is O(directories
    * dropped), never a scan — on a PLAIN layout (seal a streaming sink
    * first; deleting under a live `_spark_metadata` log would
    * desynchronize it). Returns the days dropped, for the caller's
    * audit log. */
  def expirePartitions(spark: SparkSession, path: String,
      keepFrom: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = "ts_date="
    val dropped = Seq.newBuilder[String]
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith(prefix)) {
        val day = name.stripPrefix(prefix)
        if (day < keepFrom) {
          fs.delete(st.getPath, true)
          dropped += day
        }
      }
    }
    dropped.result().sorted
  }
}
