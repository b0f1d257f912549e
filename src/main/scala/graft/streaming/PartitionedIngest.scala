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
  *
  * ==Late events vs sealed/expired partitions==
  *
  * The pinned policy (spec: PartitionedIngestSpec "late rows across a
  * seal boundary"):
  *
  *  - The SINK accepts appends into ANY day directory forever — a
  *    FileStreamSink has no notion of "sealed", and rejecting late rows
  *    at the sink would mean dropping data the watermark already
  *    admitted.
  *  - A late row for an already-SEALED day is folded in by the next
  *    seal: sealing is an idempotent per-day snapshot of the sink, so
  *    re-sealing (full [[seal]], or [[sealDays]] on exactly the touched
  *    days — the incremental nightly form) replaces the day's serving
  *    directory with sink truth. Between seals the serving copy lags
  *    the sink by design; readers needing the late rows read the sink.
  *  - A late row for an EXPIRED day (older than the seal's `keepFrom`
  *    horizon) is EXCLUDED at seal time and COUNTED in the returned
  *    [[SealStats]] — a seal must never resurrect a partition retention
  *    already dropped, and a silently vanishing row is an operational
  *    blind spot, so the count is the caller's alert hook.
  */
object PartitionedIngest {

  /** What a [[seal]] did: rows landed in the serving copy, and rows
    * dropped because their day fell before the retention horizon (the
    * late-beyond-horizon count a caller alerts on). */
  final case class SealStats(rowsSealed: Long, rowsBeyondHorizon: Long)

  /** Start appending `events` (must carry a TimestampType `ts`; a
    * watermark upstream bounds any stateful transforms before the
    * sink) into a date-partitioned parquet sink. The derived `ts_date`
    * partition column follows the `<col>_date` convention and the sink
    * root is marked with the UTC-day provenance marker, so ts-range
    * predicates prune the sink's directories through
    * [[graft.plans.PartitionDateInference]] exactly as on the batch
    * layout. */
  def start(events: DataFrame, path: String, checkpoint: String): StreamingQuery = {
    // provenance before first commit: the sink writes UTC days
    // (Layout.utcDate), so the inference rule may trust it immediately
    graft.storage.Layout.markUtcDays(events.sparkSession, path)
    events.withColumn("ts_date", graft.storage.Layout.utcDate(col("ts")))
      .writeStream.format("parquet")
      .partitionBy("ts_date")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
  }

  /** Seal a (stopped) streaming sink into a plain partitioned serving
    * copy at `servingPath`: the read respects the sink's
    * `_spark_metadata` commit log — exactly the committed rows, no
    * orphaned task files — and the rewrite coalesces each day's
    * accumulated micro-batch files into task-sized ones. After this,
    * the copy is an ordinary layout directory: compactable, expirable,
    * and free of the log's ownership.
    *
    * `keepFrom` (ISO `YYYY-MM-DD`, optional) is the retention horizon:
    * days strictly older are excluded from the seal — so a late row
    * landing in the sink for an already-expired day can never
    * resurrect the partition — and their row count comes back in
    * [[SealStats]] for the caller's audit/alerting.
    *
    * The write is pinned to STATIC partition-overwrite mode (saved and
    * restored around the write): the serving copy is a full snapshot of
    * the sink, so days that vanished from the sink since the last seal
    * must vanish from the copy too. Under a session-global DYNAMIC mode
    * the overwrite would only replace days present in the sink and the
    * copy would silently diverge. (The INCREMENTAL form with the
    * opposite requirement is [[sealDays]].) */
  def seal(spark: SparkSession, sinkPath: String, servingPath: String,
      keepFrom: Option[String] = None): SealStats = {
    val all = spark.read.parquet(sinkPath)
    val horizon = keepFrom.map(d => lit(d).cast("date"))
    val kept = horizon.map(h => all.filter(col("ts_date") >= h)).getOrElse(all)
    val beyond = horizon.map(h => all.filter(col("ts_date") < h).count()).getOrElse(0L)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "STATIC")
    try kept.write.mode("overwrite")
      .partitionBy("ts_date")
      .parquet(servingPath)
    finally spark.conf.set(key, prev)
    graft.storage.Layout.markUtcDays(spark, servingPath)
    SealStats(spark.read.parquet(servingPath).count(), beyond)
  }

  /** Incremental seal: replace EXACTLY the named `ts_date` days in the
    * serving copy with sink truth, leaving every other day's files
    * physically untouched — the nightly job ("yesterday, plus any days
    * the late-arrival log touched") that makes re-sealing O(days
    * changed) instead of O(table). This is how a late row lands in an
    * already-sealed day: re-seal that day. Uses dynamic
    * partition-overwrite pinned to this one write
    * ([[graft.storage.Layout.overwritePartitions]]). Returns the rows
    * written. Days listed but absent from the sink are left as they
    * are — deleting a partition is retention's job
    * ([[expirePartitions]]), not seal's.
    *
    * Each day is rewritten as its OWN job, repartitioned to
    * ~`targetBytes` output files sized from the day directory's actual
    * on-disk bytes ([[graft.storage.Layout.compact]]'s arithmetic): the
    * close-out of a day that accumulated thousands of trigger-sized
    * micro-batch files must also be the de-fragmentation pass, and
    * relying on scan-side openCost bin-packing leaves ~1 output file
    * per 32 inputs regardless of bytes (the sealcost probe measured 90
    * KB-sized files for a 1 MB day). The per-day repartition is a
    * day-sized shuffle — the price of tight file sizing, paid on
    * exactly the days being resealed and nothing else.
    *
    * CONCURRENCY CONTRACT (in-place form): the dynamic overwrite
    * deletes the day's old files before the new ones commit, so a
    * reader that already resolved the serving directory's listing and
    * is scanning the day being resealed can hit deleted-file errors
    * mid-flight (spec-pinned: VersionedServingSpec "in-place sealDays
    * under a pinned reader"). Run in-place re-seals in a reader
    * maintenance window — or deploy the serving copy as a
    * [[graft.storage.VersionedServing]] root (its `sealDays` publishes
    * fresh generations behind an atomic manifest flip and retains
    * superseded files for a grace window; same O(days-changed) cost,
    * no window needed). */
  def sealDays(spark: SparkSession, sinkPath: String, servingPath: String,
      days: Seq[String], targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(days.nonEmpty, "sealDays needs at least one day")
    val hc = spark.sparkContext.hadoopConfiguration
    var rows = 0L
    days.foreach { day =>
      val dayDir = new org.apache.hadoop.fs.Path(s"$sinkPath/ts_date=$day")
      val fs = dayDir.getFileSystem(hc)
      if (fs.exists(dayDir)) {
        // sizing approximation: raw dir bytes (incl. any not-yet-committed
        // orphans — fine, this only picks a file count; the ROWS written
        // still come through the log-respecting read below)
        val bytes = fs.getContentSummary(dayDir).getLength
        val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val slice = spark.read.parquet(sinkPath)
          .filter(col("ts_date") === lit(day).cast("date"))
          .repartition(nFiles)
        graft.storage.Layout.overwritePartitions(slice, servingPath, Seq("ts_date"))
        // count what was WRITTEN — the serving day directory, ours and
        // immutable until the next seal: one sink read per day, and no
        // race against a live ingest appending to the sink mid-count
        rows += spark.read.parquet(s"$servingPath/ts_date=$day").count()
      }
    }
    graft.storage.Layout.markUtcDays(spark, servingPath)
    rows
  }

  /** [[daysTouchedSince]]'s result: the `ts_date` day values whose
    * directories received committed files in batches after the caller's
    * bookmark, and the latest committed batch id — the new bookmark. */
  final case class TouchedDays(days: Seq[String], throughBatch: Long)

  private val DayInPath = "/ts_date=([^/]+)/".r

  /** The latest batch id the sink's `_spark_metadata` commit log has,
    * or None when the path is not a streaming sink (or never
    * committed). Metadata-only. */
  def latestBatch(spark: SparkSession, sinkPath: String): Option[Long] = {
    import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
    val metaDir = new org.apache.hadoop.fs.Path(sinkPath, "_spark_metadata")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaDir)) None
    else new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, metaDir.toString)
      .getLatestBatchId()
  }

  /** PRODUCER-side change detection for the nightly close-out: which
    * `ts_date` days did the ingest touch since the last seal? Derived
    * from the sink's `_spark_metadata` commit log — the same log that
    * owns file visibility — so the answer is exact committed truth, not
    * an mtime heuristic, and costs a metadata read (no data files
    * opened). `sinceBatch` is the caller's bookmark (the manifest's
    * `#sealedThrough` for [[graft.storage.VersionedServing
    * .sealTouched]]); None means "never sealed" and returns every day
    * the log has ever committed. Returns None when the path is not a
    * streaming sink or nothing was ever committed.
    *
    * Compaction correctness: a compact log batch REPLAYS every file
    * committed before it, so entries in the scanned range are filtered
    * against the file set visible at `sinceBatch`. If pre-bookmark log
    * files have aged out of the log's own retention that baseline is
    * partial and days can OVER-report — safe, a re-seal is an
    * idempotent per-day snapshot. UNDER-report is impossible: the log
    * retains every batch after its latest compact, so a missing delta
    * in the range implies a compact inside the range that replays its
    * files. */
  def daysTouchedSince(spark: SparkSession, sinkPath: String,
      sinceBatch: Option[Long]): Option[TouchedDays] = {
    import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
    val metaDir = new org.apache.hadoop.fs.Path(sinkPath, "_spark_metadata")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaDir)) return None
    val log = new FileStreamSinkLog(
      FileStreamSinkLog.VERSION, spark, metaDir.toString)
    log.getLatestBatchId() match {
      case None => None
      case Some(latest) if sinceBatch.exists(_ > latest) =>
        // a bookmark STRICTLY ahead of the commit log means the sink's
        // checkpoint/metadata log was recreated (batch ids restarted)
        // under an old manifest — returning "nothing touched" here
        // would leave the serving copy permanently stale with no
        // signal while new data keeps landing
        throw new IllegalStateException(
          s"bookmark ${sinceBatch.get} is ahead of the commit log's latest " +
            s"batch $latest at $sinkPath — the sink's metadata log was " +
            "likely recreated; re-bootstrap the serving copy with a full " +
            "seal instead of a touched-day close-out")
      case Some(latest) if sinceBatch.contains(latest) =>
        Some(TouchedDays(Nil, latest))
      case Some(latest) =>
        val entries = log.get(sinceBatch.map(_ + 1), Some(latest)).flatMap(_._2)
        val baseline: Set[String] = sinceBatch match {
          case None => Set.empty
          case Some(s) => log.get(None, Some(s)).flatMap(_._2).map(_.path).toSet
        }
        val days = entries.iterator.map(_.path).filterNot(baseline)
          .flatMap(p => DayInPath.findFirstMatchIn(p).map(_.group(1)))
          .toSeq.distinct.sorted
        Some(TouchedDays(days, latest))
    }
  }

  /** Janitor for the LIVE sink: delete data files present under the
    * sink directory but absent from its `_spark_metadata` commit log —
    * the leftovers of crashed/speculative write tasks. Readers never
    * see these (the log owns visibility), which is exactly why they
    * accumulate silently: nothing ever reads them, nothing ever deletes
    * them, and at 100 TB a year of task attrition is real money on
    * object storage. Deleting them is safe BECAUSE they are invisible —
    * this is the one delete that may run under a live log (contrast
    * [[expirePartitions]]'s plain-layout-only contract).
    *
    * The gate: if an ACTIVE query in this session is writing this sink,
    * the janitor REFUSES (IllegalStateException). An mtime grace alone
    * cannot protect a running writer — a micro-batch whose
    * write-to-commit span exceeds the grace (backlog replay, a skewed
    * day) has task files older than the window that its log commit is
    * about to reference; deleting them corrupts the sink, not just an
    * orphan. Query state is checkable, so it is checked; `graceMs`
    * remains as the SECONDARY margin for writers this session cannot
    * see (a cross-JVM ingest job — coordinating with those is the
    * operator's contract, and 15 min ≫ any sane trigger interval).
    * Pass `graceMs = 0` only when the query is known stopped. Returns
    * the deleted paths for the audit log. */
  def vacuumOrphans(spark: SparkSession, sinkPath: String,
      graceMs: Long = 15 * 60 * 1000L): Seq[String] = {
    import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
    val root = new org.apache.hadoop.fs.Path(sinkPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = root.toUri.getPath
    val writers = spark.streams.active.filter {
      org.apache.spark.sql.execution.streaming.GraftStreamingShim.fileSinkPath(_)
        .exists(p => new org.apache.hadoop.fs.Path(p).toUri.getPath == target)
    }
    if (writers.nonEmpty) throw new IllegalStateException(
      s"vacuumOrphans refused: active streaming query " +
        s"${writers.map(_.id).mkString(", ")} is writing $sinkPath — " +
        "stop it first (an in-flight batch's task files can predate any grace window)")
    val metaDir = new org.apache.hadoop.fs.Path(root, "_spark_metadata")
    // no commit log -> not a streaming sink -> NOTHING is an orphan
    if (!fs.exists(metaDir)) return Nil
    val log = new FileStreamSinkLog(
      FileStreamSinkLog.VERSION, spark, metaDir.toString)
    val committed = log.allFiles()
      .map(_.toFileStatus.getPath.toUri.getPath).toSet
    val now = System.currentTimeMillis
    val dropped = Seq.newBuilder[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath
      val underMeta = p.toString.contains("/_spark_metadata")
      val hidden = p.getName.startsWith("_") || p.getName.startsWith(".")
      if (f.isFile && !underMeta && !hidden &&
          !committed.contains(p.toUri.getPath) &&
          now - f.getModificationTime >= graceMs) {
        fs.delete(p, false)
        dropped += p.toUri.getPath
      }
    }
    dropped.result().sorted
  }

  /** Retention: drop every `ts_date=<day>` directory strictly OLDER
    * than `keepFrom` (ISO `YYYY-MM-DD`; lexicographic order IS
    * chronological for ISO dates). Directory-granular delete — the
    * whole point of date partitioning is that expiry is O(directories
    * dropped), never a scan — on a PLAIN layout (seal a streaming sink
    * first; deleting under a live `_spark_metadata` log would
    * desynchronize it). Returns the days dropped, for the caller's
    * audit log. Pair with the SAME `keepFrom` passed to [[seal]] so a
    * late row for a dropped day cannot re-create the directory at the
    * next seal. */
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
