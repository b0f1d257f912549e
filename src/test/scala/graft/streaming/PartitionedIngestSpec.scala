package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming-ingest end of the events layout: micro-batches land as
  * date directories under a transactional sink log, ts predicates prune
  * the sink through PartitionDateInference, sealing produces a plain
  * serving copy, and retention drops whole directories. */
class PartitionedIngestSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def scanOf(df: DataFrame) = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    plan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("ingest → prune → seal → expire: the events-table lifecycle") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("pingest").toString
    val (sink, ckpt, serving) = (s"$base/sink", s"$base/ckpt", s"$base/serving")

    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      // two micro-batches spanning four days (the second REVISITS day 2:
      // late-arriving rows append into an existing directory)
      in.addData((1L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-02 10:00:00")),
        (3L, ts("2024-03-02 11:00:00")), (4L, ts("2024-03-03 10:00:00")))
      q.processAllAvailable()
      in.addData((5L, ts("2024-03-02 23:00:00")), (6L, ts("2024-03-04 10:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    // the sink read goes through _spark_metadata: committed rows only,
    // partition discovery intact
    val back = spark.read.parquet(sink)
    assert(back.count() == 6)
    assert(back.select("ts_date").distinct().count() == 4)

    // ts predicates prune the SINK's directories through the inference
    // rule (ts >= 03-03 → ts_date >= 03-03: days 03 and 04)
    val pruned = back.filter(col("ts") >= lit("2024-03-03").cast("timestamp"))
    assert(scanOf(pruned).selectedPartitions.partitionCount == 2,
      "sink directories must prune on the derived ts_date bound")
    assert(pruned.count() == 2)

    // seal into a plain serving layout: same rows, no metadata log
    PartitionedIngest.seal(spark, sink, serving)
    val served = spark.read.parquet(serving)
    assert(served.count() == 6)
    assert(!new java.io.File(s"$serving/_spark_metadata").exists(),
      "the sealed copy must be a plain layout, not a sink")

    // retention drops whole day directories, O(dirs), scan-free
    val dropped = PartitionedIngest.expirePartitions(spark, serving, "2024-03-02")
    assert(dropped == Seq("2024-03-01"), s"dropped: $dropped")
    assert(spark.read.parquet(serving).count() == 5)
    assert(PartitionedIngest.expirePartitions(spark, serving, "2024-03-02").isEmpty,
      "expiry must be idempotent")
  }

  test("vacuumOrphans deletes crashed-task leftovers, never committed files, never plain layouts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("pvacuum").toString
    val (sink, ckpt) = (s"$base/sink", s"$base/ckpt")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      in.addData((1 to 4).map(d => (d.toLong, ts(f"2024-03-$d%02d 10:00:00"))): _*)
      q.processAllAvailable()
    } finally q.stop()

    // plant an orphan: a crashed task's file — real parquet bytes, in a
    // day directory, absent from the commit log
    val dayDir = new java.io.File(s"$sink/ts_date=2024-03-02")
    val committedFile = dayDir.listFiles().filter(_.getName.startsWith("part-")).head
    val orphan = new java.io.File(dayDir, "part-99999-orphan.snappy.parquet")
    java.nio.file.Files.copy(committedFile.toPath, orphan.toPath)

    // the log owns visibility: the reader never saw the orphan
    assert(spark.read.parquet(sink).count() == 4)

    val dropped = PartitionedIngest.vacuumOrphans(spark, sink, graceMs = 0L)
    assert(dropped.size == 1 && dropped.head.endsWith("part-99999-orphan.snappy.parquet"),
      s"dropped: $dropped")
    assert(!orphan.exists(), "the orphan must be physically deleted")
    assert(committedFile.exists(), "committed files must survive the vacuum")
    assert(spark.read.parquet(sink).count() == 4, "reader unaffected")
    assert(PartitionedIngest.vacuumOrphans(spark, sink, graceMs = 0L).isEmpty,
      "vacuum must be idempotent")

    // grace window: a fresh uncommitted file (a possible in-flight
    // commit) is NOT deleted under the default grace
    val young = new java.io.File(dayDir, "part-99998-young.snappy.parquet")
    java.nio.file.Files.copy(committedFile.toPath, young.toPath)
    assert(PartitionedIngest.vacuumOrphans(spark, sink).isEmpty,
      "a file younger than the grace window must be spared")
    assert(young.exists())

    // a PLAIN layout (no _spark_metadata) has no orphans by definition
    val plain = s"$base/plain"
    PartitionedIngest.seal(spark, sink, plain)
    assert(PartitionedIngest.vacuumOrphans(spark, plain, graceMs = 0L).isEmpty,
      "a directory without a commit log must never be vacuumed")
    assert(spark.read.parquet(plain).count() == 4)
  }

  test("vacuumOrphans refuses while a query is WRITING the sink, and the query is unharmed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("pvgate").toString
    val (sink, ckpt) = (s"$base/sink", s"$base/ckpt")
    val (sink2, ckpt2) = (s"$base/other_sink", s"$base/other_ckpt")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      in.addData((1L, ts("2024-03-01 10:00:00")))
      q.processAllAvailable()
      // plant an orphan OLDER than any grace — without the gate, a
      // mid-batch janitor could also eat a slow batch's real task files
      val dayDir = new java.io.File(s"$sink/ts_date=2024-03-01")
      val committed = dayDir.listFiles().filter(_.getName.startsWith("part-")).head
      val orphan = new java.io.File(dayDir, "part-99999-orphan.snappy.parquet")
      java.nio.file.Files.copy(committed.toPath, orphan.toPath)

      val e = intercept[IllegalStateException](
        PartitionedIngest.vacuumOrphans(spark, sink, graceMs = 0L))
      assert(e.getMessage.contains("refused"), e.getMessage)
      assert(orphan.exists(), "a refused vacuum must delete nothing")

      // the gate is PER-SINK: a query writing THIS sink must not block
      // the janitor on a DIFFERENT (stopped) sink
      val in2 = MemoryStream[(Long, java.sql.Timestamp)]
      val q2 = PartitionedIngest.start(
        in2.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink2, ckpt2)
      try { in2.addData((9L, ts("2024-03-01 10:00:00"))); q2.processAllAvailable() }
      finally q2.stop()
      assert(PartitionedIngest.vacuumOrphans(spark, sink2, graceMs = 0L).isEmpty)

      // the running writer keeps committing batches after the refusal
      in.addData((2L, ts("2024-03-02 10:00:00")))
      q.processAllAvailable()
      assert(spark.read.parquet(sink).count() == 2)
    } finally q.stop()
    // stopped writer: the janitor proceeds and takes exactly the orphan
    val dropped = PartitionedIngest.vacuumOrphans(spark, sink, graceMs = 0L)
    assert(dropped.size == 1 && dropped.head.endsWith("orphan.snappy.parquet"),
      s"dropped: $dropped")
    assert(spark.read.parquet(sink).count() == 2, "committed data intact")
  }

  test("the deployment lifecycle end-to-end: ingest → seal(horizon) → expire → serve through Tables.events with pruning + batch identity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("plifecycle").toString
    val (sink, ckpt, serving, batch) =
      (s"$base/sink", s"$base/ckpt", s"$base/serving", s"$base/batch")

    // 30 days × 2 rows (2024-03-01..30), fed as three micro-batches —
    // the month a production events table accumulates between seals
    val rows = for (d <- 1 to 30; h <- Seq(9, 21)) yield
      ((d * 100 + h).toLong, ts(f"2024-03-$d%02d $h%02d:00:00"))
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try rows.grouped(20).foreach { g => in.addData(g: _*); q.processAllAvailable() }
    finally q.stop()

    // nightly close-out: seal everything inside the 28-day horizon
    val stats = PartitionedIngest.seal(spark, sink, serving, keepFrom = Some("2024-03-03"))
    assert(stats.rowsSealed == 56 && stats.rowsBeyondHorizon == 4,
      s"expected 56 sealed + 4 beyond the horizon, got $stats")
    // retention against the same horizon: seal already excluded those
    // days, so there is nothing to drop — the two tools agree
    assert(PartitionedIngest.expirePartitions(spark, serving, "2024-03-03").isEmpty)

    // serve the SEALED copy through the production accessor
    s.conf.set(graft.storage.Layout.EventsEnabledKey, "true")
    s.conf.set(graft.storage.Layout.EventsServingDirKey, serving)
    try {
      val servedAll = graft.Tables.events(s, base)
      assert(servedAll.count() == 56)
      assert(!servedAll.columns.contains("ts_date"),
        "the accessor must serve the raw schema (partition column dropped)")
      // serving-deployment consistency: eventsRaw must read the SAME
      // sealed dataset (there may be no batch source at all) — the
      // plain-serving-form counterpart of VersionedServingSpec's pin
      val raw = graft.Tables.eventsRaw(s, base)
      assert(raw.columns.toSeq == servedAll.columns.toSeq &&
        raw.count() == 56,
        "eventsRaw must serve the sealed copy under a serving deployment")
      // the week-slice query plans exactly 7 of the 28 surviving day
      // directories through PartitionDateInference (seal marked the
      // copy's provenance; the strict midnight upper is sharp)
      val week = servedAll
        .filter(col("ts") >= lit("2024-03-10").cast("timestamp") &&
          col("ts") < lit("2024-03-17").cast("timestamp"))
      assert(scanOf(week).selectedPartitions.partitionCount == 7,
        "ts week-slice must prune the sealed copy to its exact 7 days")
      assert(week.count() == 14)
      // row identity vs the BATCH layout of the same retained data: the
      // streaming ingest+seal path and the batch write are two routes to
      // ONE layout contract
      val retained = rows.filter(_._2.toString >= "2024-03-03")
        .toDF("event_id", "ts")
      graft.storage.Layout.writePartitioned(
        retained.withColumn("ts_date",
          graft.storage.Layout.utcDate(col("ts"))), batch, Seq("ts_date"))
      val servedRows = servedAll.orderBy("event_id").collect().toSeq
      val batchRows = spark.read.parquet(batch).drop("ts_date")
        .select("event_id", "ts").orderBy("event_id").collect().toSeq
      assert(servedRows == batchRows,
        "sealed serving copy diverged from the batch layout of the same data")
      assert(servedRows.size == 56, "vacuous comparison")
    } finally {
      s.conf.unset(graft.storage.Layout.EventsServingDirKey)
      s.conf.set(graft.storage.Layout.EventsEnabledKey, "false")
    }
  }

  test("late rows across a seal boundary: folded in by re-seal, never resurrecting expired days") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("plate").toString
    val (sink, ckpt, serving) = (s"$base/sink", s"$base/ckpt", s"$base/serving")

    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      in.addData((1 to 5).map(d => (d.toLong, ts(f"2024-03-$d%02d 10:00:00"))): _*)
      q.processAllAvailable()
      // first seal: horizon 03 — serving holds days 03..05
      val first = PartitionedIngest.seal(spark, sink, serving, Some("2024-03-03"))
      assert(first.rowsSealed == 3 && first.rowsBeyondHorizon == 2)
      // LATE rows arrive after the seal: one into a SEALED day (04), one
      // into an EXPIRED day (01) — the sink accepts both (policy leg 1)
      in.addData((104L, ts("2024-03-04 23:00:00")), (101L, ts("2024-03-01 23:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(sink).count() == 7)
    // between seals the serving copy LAGS the sink by design
    assert(spark.read.parquet(serving).count() == 3)

    // policy leg 2: the incremental re-seal folds the late row into the
    // sealed day — and leaves every OTHER day's files physically untouched
    def dayFiles(day: String): Set[String] = {
      val d = new java.io.File(s"$serving/ts_date=$day")
      if (!d.exists()) Set.empty
      else d.listFiles().map(f => s"${f.getName}:${f.lastModified}").toSet
    }
    val (d3Before, d5Before) = (dayFiles("2024-03-03"), dayFiles("2024-03-05"))
    val written = PartitionedIngest.sealDays(spark, sink, serving, Seq("2024-03-04"))
    assert(written == 2, "day 04 must now hold its original + late row")
    assert(spark.read.parquet(serving).count() == 4)
    assert(dayFiles("2024-03-03") == d3Before && dayFiles("2024-03-05") == d5Before,
      "incremental seal must not rewrite untouched days")

    // policy leg 3: a FULL re-seal with the same horizon counts the
    // expired-day late row as beyond-horizon — it never resurrects 01
    val second = PartitionedIngest.seal(spark, sink, serving, Some("2024-03-03"))
    assert(second.rowsSealed == 4 && second.rowsBeyondHorizon == 3,
      s"late row for an expired day must be dropped+counted, got $second")
    assert(!new java.io.File(s"$serving/ts_date=2024-03-01").exists(),
      "an expired day must never be resurrected by a later seal")
  }

  test("daysTouchedSince: committed truth since a bookmark, exact through log compaction") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ptouch").toString
    val (sink, ckpt) = (s"$base/sink", s"$base/ckpt")
    def d(day: Int, id: Long) = (id, ts(f"2024-03-$day%02d 10:00:00"))

    // compact every 3 batches (batches 2, 5, ... are compacts), so the
    // test exercises the replay-filtering path a nightly close-out
    // crosses every ~compactInterval batches in production
    val key = "spark.sql.streaming.fileSink.log.compactInterval"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "3")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      // batch 0: days 01 + 02
      in.addData(d(1, 1L), d(2, 2L)); q.processAllAvailable()
      val t0 = PartitionedIngest.daysTouchedSince(spark, sink, None)
        .getOrElse(fail("a committed sink must report"))
      assert(t0 == PartitionedIngest.TouchedDays(
        Seq("2024-03-01", "2024-03-02"), 0L), s"got $t0")
      // bookmarked at batch 0: nothing since
      assert(PartitionedIngest.daysTouchedSince(spark, sink, Some(0L)) ==
        Some(PartitionedIngest.TouchedDays(Nil, 0L)))

      // batch 1 touches day 01 again (late row); batch 2 — a COMPACT
      // batch, which replays every file ever committed — adds day 03
      in.addData(d(1, 11L)); q.processAllAvailable()
      in.addData(d(3, 3L)); q.processAllAvailable()
      val t1 = PartitionedIngest.daysTouchedSince(spark, sink, Some(0L))
        .getOrElse(fail("must report"))
      assert(t1 == PartitionedIngest.TouchedDays(
        Seq("2024-03-01", "2024-03-03"), 2L),
        s"the compact's replayed day-02 file must be filtered out, got $t1")

      // batches 3+4 (one crossing into the next compact at 5): day 04
      in.addData(d(4, 4L)); q.processAllAvailable()
      in.addData(d(4, 41L)); q.processAllAvailable()
      in.addData(d(2, 22L)); q.processAllAvailable() // batch 5 = compact
      val t2 = PartitionedIngest.daysTouchedSince(spark, sink, Some(2L))
        .getOrElse(fail("must report"))
      assert(t2 == PartitionedIngest.TouchedDays(
        Seq("2024-03-02", "2024-03-04"), 5L), s"got $t2")
      // a fresh never-sealed scan still reports every day exactly once
      val all = PartitionedIngest.daysTouchedSince(spark, sink, None).get
      assert(all.days ==
        Seq("2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"))
    } finally {
      q.stop()
      prev.fold(s.conf.unset(key))(s.conf.set(key, _))
    }
    // not a streaming sink → None (never a guess from directory mtimes)
    val plain = s"$base/plain"
    Seq(d(1, 9L)).toDF("event_id", "ts").write.parquet(plain)
    assert(PartitionedIngest.daysTouchedSince(spark, plain, None).isEmpty)
    assert(PartitionedIngest.latestBatch(spark, plain).isEmpty)
  }

  test("daysTouchedSince: a bookmark ahead of the commit log fails loudly (recreated sink)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("pahead").toString
    val (sink, ckpt) = (s"$base/sink", s"$base/ckpt")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      in.addData((1L, ts("2024-03-01 10:00:00"))); q.processAllAvailable()
      // the log's latest batch is 0; an old manifest carrying a higher
      // bookmark means the sink's metadata log was recreated — returning
      // "nothing touched" would leave the serving copy permanently stale
      val e = intercept[IllegalStateException] {
        PartitionedIngest.daysTouchedSince(spark, sink, Some(7L))
      }
      assert(e.getMessage.contains("ahead of the commit log"), e.getMessage)
      // exactly-at-latest remains the quiet "nothing new" answer
      assert(PartitionedIngest.daysTouchedSince(spark, sink, Some(0L)) ==
        Some(PartitionedIngest.TouchedDays(Nil, 0L)))
    } finally q.stop()
  }
}
