package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The cron'd composition: sealTouched + expire + vacuum in one run,
  * with the beyond-horizon alert surfacing in the summary. */
class NightlyCloseoutSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("one close-out run: discovers days, seals, expires the horizon, vacuums orphans, alerts on refused lates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("closeout").toString
    val (sink, ckpt, root) = (s"$base/sink", s"$base/ckpt", s"$base/serving")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    def ingest(rows: (Long, java.sql.Timestamp)*): Unit = {
      val q = graft.streaming.PartitionedIngest.start(
        in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
      try { in.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    }

    ingest((101L, ts("2024-03-01 09:00:00")), (201L, ts("2024-03-02 09:00:00")),
      (301L, ts("2024-03-03 09:00:00")))
    // an orphan: a crashed task's file the commit log never references
    val orphan = new java.io.File(s"$sink/ts_date=2024-03-02/part-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))

    // first close-out with a horizon: the elder day is refused AT SEAL
    // TIME (never enters the copy — the same exclusion a full
    // seal(keepFrom) applies), reported, and expire has nothing to drop
    val s1 = NightlyCloseout.run(spark, sink, root,
      keepFrom = Some("2024-03-02"), vacuum = false)
    assert(s1.sealedDays == Seq("2024-03-02", "2024-03-03") &&
      s1.rowsSealed == 2 && s1.beyondHorizon == Seq("2024-03-01") &&
      s1.expiredDays.isEmpty, s"got $s1")
    assert(VersionedServing.servedDays(spark, root) ==
      Seq("2024-03-02", "2024-03-03"))
    // the refusal is DURABLE from the publish that advanced the bookmark
    // past it: recorded in the manifest, not just in this run's summary
    val recorded = VersionedServing.refusedLates(spark, root)
    assert(recorded.keySet == Set("2024-03-01") &&
      recorded("2024-03-01") == s1.sealedThrough.get,
      s"refusal must be recorded at the advancing publish, got $recorded")
    assert(s1.refusedOutstanding == recorded)
    // the vacuum leg through the composition itself (grace 0: the
    // ingest query is stopped, so the only orphan is the planted one)
    val sv = NightlyCloseout.run(spark, sink, root,
      keepFrom = Some("2024-03-02"), vacuum = true, vacuumGraceMs = 0)
    assert(sv.sealedDays.isEmpty &&
      sv.vacuumedOrphans.exists(_.endsWith("part-orphan.parquet")) && !orphan.exists(),
      s"the orphan must be swept by the close-out, got $sv")

    // a late row beyond the horizon: the next close-out refuses it and
    // the summary carries the alert; nothing is resurrected
    ingest((102L, ts("2024-03-01 23:00:00")), (401L, ts("2024-03-04 09:00:00")))
    val s2 = NightlyCloseout.run(spark, sink, root, keepFrom = Some("2024-03-02"))
    assert(s2.sealedDays == Seq("2024-03-04") && s2.beyondHorizon == Seq("2024-03-01"),
      s"got $s2")
    assert(!VersionedServing.servedDays(spark, root).contains("2024-03-01"))
    assert(VersionedServing.read(spark, root)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(201L, 301L, 401L))

    // the cron pattern: the horizon ADVANCES nightly — expire is the
    // step that drops already-served days aging past it, metadata-only
    val s3 = NightlyCloseout.run(spark, sink, root, keepFrom = Some("2024-03-03"))
    assert(s3.sealedDays.isEmpty && s3.expiredDays == Seq("2024-03-02"), s"got $s3")
    assert(VersionedServing.servedDays(spark, root) ==
      Seq("2024-03-03", "2024-03-04"))

    // the durable record is carried by every later publish (s2's re-seal
    // updated its batch id; s3's expire-only publish carried it) and
    // stays readable until an operator acts — losing the cron's stdout
    // loses nothing
    assert(s3.refusedOutstanding ==
      Map("2024-03-01" -> s2.sealedThrough.get), s"got $s3")
    assert(VersionedServing.refusedLates(spark, root) == s3.refusedOutstanding)
    // acknowledging clears the record (data and bookmark untouched) and
    // the next close-out's alert surface is quiet
    assert(VersionedServing.acknowledgeRefusals(
      spark, root, Seq("2024-03-01")).isEmpty)
    assert(VersionedServing.refusedLates(spark, root).isEmpty)
    assert(VersionedServing.sealedThrough(spark, root) == s2.sealedThrough)
    assert(VersionedServing.servedDays(spark, root) ==
      Seq("2024-03-03", "2024-03-04"))
    val s4 = NightlyCloseout.run(spark, sink, root, keepFrom = Some("2024-03-03"))
    assert(s4.refusedOutstanding.isEmpty && s4.beyondHorizon.isEmpty, s"got $s4")
  }
}
