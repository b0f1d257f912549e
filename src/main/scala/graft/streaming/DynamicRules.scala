package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Dynamic rule enrichment — the Spark-native answer to Flink's
  * broadcast-state pattern (`BroadcastProcessFunction`: a low-volume
  * rule stream replicated to every parallel instance of a main-stream
  * operator; the closest reference surface is the connect/CoProcess
  * shared-state demo, test/StateTest.java — J2).
  *
  * Spark has no broadcast STATE; the supported refresh idiom is
  * PER-BATCH RE-PLANNING: `foreachBatch` re-builds the rules frame from
  * storage on every trigger, so a newly published snapshot (a fresh
  * versioned directory made visible by an atomic pointer flip) is
  * visible to the very next micro-batch, the
  * replication to all tasks is the broadcast hash join the planner
  * already picks for a small side, and rule updates ride ordinary table
  * commits instead of bespoke keyed state. The tempting shortcut — a
  * plain stream–static join against the rules path — does NOT work: the
  * static side's file index is pinned when the streaming query starts,
  * so the first snapshot overwrite kills the query with
  * FAILED_READ_FILE (DynamicRulesSpec pins this failure as the
  * motivation). Trade vs Flink: rules apply per micro-batch, not
  * per-record interleaved with the data stream — the right trade
  * wherever rules change slowly relative to triggers, which is the
  * broadcast-state use case.
  *
  * At scale the per-batch cost is one metadata listing + a
  * rules-snapshot read (KB-sized), and the main stream never shuffles
  * (broadcast join): zero exchanges added to the streaming plan. */
object DynamicRules {

  final case class Rule(eventType: String, minValue: Double, tag: String)

  /** Snapshot directories kept after a publish (beyond CURRENT's, which
    * is always kept): slack for readers still scanning an older version
    * when the pointer flips. */
  val KeepVersions = 3

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Publish a rules snapshot. Each publish writes a FRESH immutable
    * `v<n>` directory under `path`, then atomically flips the one-line
    * `CURRENT` pointer file onto it (temp-write + overwrite-rename —
    * atomic on HDFS and posix filesystems). A reader that resolved the
    * pointer before the flip keeps scanning its old snapshot's files,
    * which a publish never touches — so concurrent publish-while-
    * enriching (the module's intended production use) can neither fail
    * a micro-batch nor show it a half-written set. A plain
    * `mode("overwrite")` of one directory would: overwrite deletes
    * before it commits. Snapshots older than the newest [[KeepVersions]]
    * are pruned. Single writer assumed (concurrent publishers race the
    * version number, as with any non-transactional table format). */
  def publish(spark: SparkSession, path: String, rules: Seq[Rule]): Unit = {
    require(rules.map(_.eventType).distinct.length == rules.length,
      "one rule per event type per snapshot (a join key must not fan out)")
    import spark.implicits._
    val (fs, base) = fsFor(spark, path)
    val next = listVersions(fs, base).lastOption.map(_._1 + 1).getOrElse(1L)
    val snap = new org.apache.hadoop.fs.Path(base, f"v$next%08d")
    rules.toDF("eventType", "minValue", "tag")
      .coalesce(1).write.mode("overwrite").parquet(snap.toString)
    val tmp = new org.apache.hadoop.fs.Path(base, s".CURRENT.$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(snap.getName.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(base.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(base, "CURRENT"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    listVersions(fs, base).dropRight(KeepVersions)
      .filterNot(_._2.getName == snap.getName)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{8}"))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath))
      .sortBy(_._1)

  /** Resolve the CURRENT pointer to its snapshot directory. Fails
    * loudly — a missing pointer means nothing was ever published, and
    * silently tagging every event 'none' would mask it. */
  def currentSnapshot(spark: SparkSession, path: String): String = {
    val (fs, base) = fsFor(spark, path)
    val ptr = new org.apache.hadoop.fs.Path(base, "CURRENT")
    require(fs.exists(ptr),
      s"no rules snapshot published at $path (missing CURRENT pointer)")
    val in = fs.open(ptr)
    val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
               finally in.close()
    new org.apache.hadoop.fs.Path(base, name).toString
  }

  /** Enrich ONE batch (a micro-batch inside [[start]], or any batch
    * frame) against the CURRENT snapshot at `rulesPath`: events matching
    * a rule (same type, value ≥ threshold) carry its tag; the rest pass
    * through tagged 'none'. Reading the snapshot here — not outside the
    * per-batch closure — is what makes the rules dynamic. */
  def enrich(events: DataFrame, rulesPath: String): DataFrame = {
    val spark = events.sparkSession
    val rules = spark.read.parquet(currentSnapshot(spark, rulesPath))
      .select(col("eventType").as("event_type"), col("minValue"), col("tag"))
    events.join(broadcast(rules), Seq("event_type"), "left")
      .withColumn("matched",
        col("tag").isNotNull && col("value") >= col("minValue"))
      .select(events.columns.map(col) :+
        when(col("matched"), col("tag")).otherwise(lit("none")).as("rule_tag"): _*)
  }

  /** Run a streaming event frame with per-trigger rule refresh: each
    * micro-batch re-reads the snapshot and hands the enriched batch to
    * `sink` (which owns output semantics, as always with foreachBatch). */
  def start(events: DataFrame, rulesPath: String)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(enrich(batch, rulesPath), id))
      .start()
}
