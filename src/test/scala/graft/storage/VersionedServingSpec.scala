package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The snapshot-isolated serving copy: seal/re-seal/expire lifecycle,
  * reader isolation under concurrent re-seal (the r16 verdict's one
  * remaining serving-side seam), and the pinned failure mode of the
  * in-place form it replaces. */
class VersionedServingSpec extends SparkSpec {

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

  /** Physical (name, mtime) listing of one pool day directory. */
  private def poolDayFiles(root: String, gen: Long, day: String): Set[String] = {
    val d = new java.io.File(s"$root/data/${VersionedServing.GenCol}=$gen/ts_date=$day")
    if (!d.exists()) Set.empty
    else d.listFiles().map(f => s"${f.getName}:${f.lastModified}").toSet
  }

  test("versioned lifecycle: seal(horizon) → serve+prune → incremental re-seal shares unchanged days → metadata-only expire → deferred vacuum") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("vserv").toString
    val (sink, ckpt, root) = (s"$base/sink", s"$base/ckpt", s"$base/serving")

    // 5 days × 2 rows through the streaming ingest
    val rows = for (d <- 1 to 5; h <- Seq(9, 21)) yield
      ((d * 100 + h).toLong, ts(f"2024-03-$d%02d $h%02d:00:00"))
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = graft.streaming.PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try { in.addData(rows: _*); q.processAllAvailable() } finally q.stop()

    // full seal inside the horizon: days 02..05 (8 rows), 2 beyond
    val stats = VersionedServing.seal(spark, sink, root, keepFrom = Some("2024-03-02"))
    assert(stats.rowsSealed == 8 && stats.rowsBeyondHorizon == 2, s"got $stats")
    assert(VersionedServing.servedDays(spark, root) ==
      Seq("2024-03-02", "2024-03-03", "2024-03-04", "2024-03-05"))
    // the dropped day is durably #refused (same contract as sealTouched)
    assert(VersionedServing.refusedLates(spark, root).keySet == Set("2024-03-01"),
      "full seal must record its horizon-dropped days in the manifest")

    // serve through the production accessors — ONE dataset for all
    // events consumers (events AND eventsRaw), raw schema, pruning live
    s.conf.set(Layout.EventsEnabledKey, "true")
    s.conf.set(Layout.EventsServingDirKey, root)
    try {
      val served = graft.Tables.events(s, base)
      assert(served.count() == 8)
      assert(!served.columns.contains("ts_date") &&
        !served.columns.contains(VersionedServing.GenCol),
        "the accessor must serve the raw schema")
      val raw = graft.Tables.eventsRaw(s, base)
      assert(raw.columns.toSeq == served.columns.toSeq &&
        raw.orderBy("event_id").collect().toSeq ==
          served.orderBy("event_id").collect().toSeq,
        "eventsRaw must see the SAME dataset as events under a serving deployment")
      // ts predicates prune the manifest's day directories at planning
      // time (each pool day dir carries the provenance marker)
      val slice = served.filter(col("ts") >= lit("2024-03-04").cast("timestamp"))
      assert(scanOf(slice).selectedPartitions.partitionCount == 2,
        "ts bound must prune the versioned snapshot to its 2 days")
      assert(slice.count() == 4)
      // row identity vs the ingested input (the retained horizon)
      assert(served.orderBy("event_id").collect().toSeq.map(r => r.getLong(0)) ==
        rows.filter(_._2.toString >= "2024-03-02").map(_._1).sorted)

      // a late row lands in the sink for sealed day 03; the incremental
      // re-seal publishes ONLY that day into a new generation
      val q2 = graft.streaming.PartitionedIngest.start(
        in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
      try { in.addData((303L, ts("2024-03-03 23:00:00"))); q2.processAllAvailable() }
      finally q2.stop()
      val d02Before = poolDayFiles(root, 1, "2024-03-02")
      val d05Before = poolDayFiles(root, 1, "2024-03-05")
      assert(d02Before.nonEmpty && d05Before.nonEmpty, "pool sanity")
      val written = VersionedServing.sealDays(spark, sink, root, Seq("2024-03-03"))
      assert(written == 3, "day 03 must now hold original 2 + late row")
      assert(graft.Tables.events(s, base).count() == 9)
      assert(poolDayFiles(root, 1, "2024-03-02") == d02Before &&
        poolDayFiles(root, 1, "2024-03-05") == d05Before,
        "incremental seal must not touch unchanged days' files (O(days-changed))")
      assert(VersionedServing.currentManifest(spark, root)("2024-03-03") == 2L &&
        VersionedServing.currentManifest(spark, root)("2024-03-02") == 1L,
        "only the resealed day moves to the new generation")

      // expire is METADATA-ONLY: day 02 leaves the manifest now, its
      // bytes only when the manifests referencing it age out
      assert(VersionedServing.expire(spark, root, "2024-03-03") == Seq("2024-03-02"))
      assert(graft.Tables.events(s, base).count() == 7)
      assert(poolDayFiles(root, 1, "2024-03-02").nonEmpty,
        "expire must not delete bytes a retained manifest still references")
      assert(VersionedServing.expire(spark, root, "2024-03-03").isEmpty,
        "expiry must be idempotent")

      // age the old manifests out: KeepManifests more publishes, then the
      // unreferenced day dirs (old day-03 gen, expired day-02) are gone
      (1 to VersionedServing.KeepManifests).foreach { _ =>
        VersionedServing.sealDays(spark, sink, root, Seq("2024-03-05")) }
      assert(poolDayFiles(root, 1, "2024-03-02").isEmpty,
        "an expired day's bytes must be reclaimed once no kept manifest references it")
      assert(poolDayFiles(root, 1, "2024-03-03").isEmpty,
        "a superseded generation must be reclaimed once no kept manifest references it")
      assert(graft.Tables.events(s, base).count() == 7, "served data unaffected by vacuum")
    } finally {
      s.conf.unset(Layout.EventsServingDirKey)
      s.conf.set(Layout.EventsEnabledKey, "false")
    }
  }

  test("snapshot isolation: a reader pinned before the flip keeps its files through a re-seal of the very day it scans") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsiso").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")

    // a plain partitioned dir is a valid seal source (the read respects
    // no log when there is none) — lets the test append between seals
    def appendRows(n: Int, tag: Int): Unit =
      (1 to n).map(i => ((tag * 1000 + i).toLong, ts("2024-03-01 10:00:00")))
        .toDF("event_id", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode("append").partitionBy("ts_date").parquet(sink)

    appendRows(4, 1)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))

    // the reader resolves the manifest AND the file listing NOW
    val pinned = VersionedServing.read(spark, root)
    assert(pinned.count() == 4)

    // the writer re-seals the exact day the reader holds
    appendRows(3, 2)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))

    assert(pinned.count() == 4,
      "the pinned reader must keep its snapshot — old files are retained, not overwritten")
    assert(VersionedServing.read(spark, root).count() == 7,
      "a fresh resolve must see the new snapshot")
  }

  test("racing reader: continuous reads during repeated re-seals never fail and always see one complete snapshot") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsrace").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    def appendRows(n: Int, tag: Int): Unit =
      (1 to n).map(i => ((tag * 1000 + i).toLong, ts("2024-03-01 10:00:00")))
        .toDF("event_id", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode("append").partitionBy("ts_date").parquet(sink)

    appendRows(5, 0)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    // every published snapshot's total: 5, 10, 15, ... — any count a
    // reader ever sees must be exactly one of these
    val publishes = 6
    val valid = (1 to publishes + 1).map(_ * 5L).toSet
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val badCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        while (!stopFlag.get()) {
          val c = VersionedServing.read(spark, root).count()
          if (!valid(c)) badCounts.add(c)
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    reader.start()
    try (1 to publishes).foreach { i =>
      appendRows(5, i)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    } finally { stopFlag.set(true); reader.join(30000) }
    assert(failures.isEmpty, s"reader failed mid-race: ${Option(failures.peek())}")
    assert(badCounts.isEmpty,
      s"reader saw a torn snapshot: ${badCounts.toArray.mkString(", ")}")
    assert(VersionedServing.read(spark, root).count() == (publishes + 1) * 5L)
  }

  test("time travel: a pinned version re-reads its exact snapshot through any re-seals, until retention drops it") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vstt").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    def appendRows(n: Int, tag: Int): Unit =
      (1 to n).map(i => ((tag * 1000 + i).toLong, ts("2024-03-01 10:00:00")))
        .toDF("event_id", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode("append").partitionBy("ts_date").parquet(sink)

    appendRows(4, 1)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    val trainRunVersion = VersionedServing.currentVersion(spark, root)
    val trainRunRows = VersionedServing.read(spark, root)
      .orderBy("event_id").collect().toSeq

    // two re-seals later the CURRENT snapshot has moved on...
    appendRows(2, 2)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    appendRows(2, 3)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    assert(VersionedServing.read(spark, root).count() == 8)
    assert(VersionedServing.versions(spark, root) ==
      Seq(trainRunVersion, trainRunVersion + 1, trainRunVersion + 2))
    // ...but the pinned version re-reads BIT-IDENTICAL data — directly
    // and through the serving accessor's version conf
    assert(VersionedServing.readAt(spark, root, trainRunVersion)
      .orderBy("event_id").collect().toSeq == trainRunRows)
    s.conf.set(Layout.EventsEnabledKey, "true")
    s.conf.set(Layout.EventsServingDirKey, root)
    s.conf.set(Layout.EventsServingVersionKey, trainRunVersion.toString)
    try assert(graft.Tables.events(s, base).count() == 4,
      "the version conf must pin every events consumer to the snapshot")
    finally {
      s.conf.unset(Layout.EventsServingVersionKey)
      s.conf.unset(Layout.EventsServingDirKey)
      s.conf.set(Layout.EventsEnabledKey, "false")
    }

    // retention drops the pinned version after KeepManifests more
    // publishes: the read fails LOUDLY, never serves the wrong snapshot
    appendRows(1, 4)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    val e = intercept[IllegalArgumentException](
      VersionedServing.readAt(spark, root, trainRunVersion))
    assert(e.getMessage.contains("not retained"), e.getMessage)
  }

  test("parallel sealDays: concurrent per-day jobs, one atomic publish, identical result to serial") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vspar").toString
    val (sink, serial, par) = (s"$base/sink", s"$base/serial", s"$base/par")
    val rows = for (d <- 1 to 6; h <- Seq(8, 12, 20)) yield
      ((d * 100 + h).toLong, ts(f"2024-03-$d%02d $h%02d:00:00"))
    rows.toDF("event_id", "ts")
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.partitionBy("ts_date").parquet(sink)
    val days = (1 to 6).map(d => f"2024-03-$d%02d") :+ "2024-03-31" // one absent day

    val nSerial = VersionedServing.sealDays(spark, sink, serial, days)
    val nPar = VersionedServing.sealDays(spark, sink, par, days, parallelism = 4)
    assert(nSerial == 18 && nPar == 18, s"got serial=$nSerial par=$nPar")
    assert(VersionedServing.currentManifest(spark, par) ==
      VersionedServing.currentManifest(spark, serial),
      "both forms must publish the same manifest")
    assert(VersionedServing.read(spark, par).orderBy("event_id").collect().toSeq ==
      VersionedServing.read(spark, serial).orderBy("event_id").collect().toSeq,
      "parallel and serial seals must serve identical data")
    // exactly ONE manifest: partial progress was never visible
    assert(new java.io.File(s"$par/manifests").listFiles()
      .count(_.getName.matches("m\\d{8}")) == 1)
  }

  test("a crashed seal's orphan generation is invisible and reclaimed by the next publish") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vscrash").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    (1 to 4).map(i => (i.toLong, ts("2024-03-01 10:00:00")))
      .toDF("event_id", "ts")
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.partitionBy("ts_date").parquet(sink)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))

    // simulate a seal that died between writing its day files and
    // publishing: a generation directory no manifest references
    val orphanDay = new java.io.File(
      s"$root/data/${VersionedServing.GenCol}=99/ts_date=2024-03-01")
    assert(orphanDay.mkdirs())
    val committed = new java.io.File(s"$root/data/${VersionedServing.GenCol}=1/ts_date=2024-03-01")
      .listFiles().filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.copy(committed.toPath,
      new java.io.File(orphanDay, committed.getName).toPath)

    // invisible: the manifest owns visibility
    assert(VersionedServing.read(spark, root).count() == 4)
    // the next seal takes a FRESH generation (no collision with 99)...
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    assert(VersionedServing.currentManifest(spark, root)("2024-03-01") == 100L)
    // ...and once enough publishes pass, the orphan is reclaimed with
    // every other unreferenced generation
    (1 to VersionedServing.KeepManifests).foreach { _ =>
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) }
    assert(!orphanDay.exists(), "orphan generation must be swept by the reclaim")
    assert(VersionedServing.read(spark, root).count() == 4)
  }

  test("archive pins a version past retention; diff reports exactly what each publish touched") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsarch").toString
    val (sink, root, arch) = (s"$base/sink", s"$base/serving", s"$base/archive")
    def writeSink(rows: Seq[(Long, java.sql.Timestamp)], mode: String): Unit =
      rows.toDF("event_id", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode(mode).partitionBy("ts_date").parquet(sink)
    writeSink(for (d <- 1 to 3; h <- Seq(9, 21)) yield
      ((d * 100 + h).toLong, ts(f"2024-03-$d%02d $h%02d:00:00")), "overwrite")

    VersionedServing.seal(spark, sink, root) // v1
    val v1 = VersionedServing.currentVersion(spark, root)
    val v1Rows = VersionedServing.read(spark, root)
      .orderBy("event_id").collect().toSeq

    // a late row for day 02 → v2 re-seals exactly that day
    writeSink(Seq((202L, ts("2024-03-02 23:00:00"))), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02")) // v2
    val d12 = VersionedServing.diff(spark, root, v1, v1 + 1)
    assert(d12 == VersionedServing.VersionDiff(Seq("2024-03-02"), Nil, Nil), s"got $d12")

    // the changed-days feed: between v1 and v2 exactly day 02 changed,
    // and the feed serves that day WHOLE at v2 (original rows + the
    // late one — the per-day replace contract an incremental consumer
    // needs)
    val feed = VersionedServing.readChangedDays(spark, root, v1, v1 + 1)
      .getOrElse(fail("day 02 changed — the feed must be non-empty"))
    assert(feed.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(202L, 209L, 221L), s"the feed must serve the re-sealed day whole")

    // expire day 01 → v3 drops it, metadata-only
    VersionedServing.expire(spark, root, "2024-03-02") // v3
    val d23 = VersionedServing.diff(spark, root, v1 + 1, v1 + 2)
    assert(d23 == VersionedServing.VersionDiff(Nil, Nil, Seq("2024-03-01")), s"got $d23")
    // an expire-only publish changes no readable day → the feed says skip
    assert(VersionedServing.readChangedDays(spark, root, v1 + 1, v1 + 2).isEmpty,
      "an expire-only publish changes no readable day — the feed must signal skip")

    // pin v1 before it ages out of the KeepManifests window
    val bytes = VersionedServing.archive(spark, root, v1, arch)
    assert(bytes > 0)
    intercept[IllegalArgumentException] { // archives are immutable
      VersionedServing.archive(spark, root, v1 + 1, arch)
    }

    // age v1 out: re-seal day 03 repeatedly until v1's manifest is gone
    (1 to VersionedServing.KeepManifests).foreach { _ =>
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-03"))
    }
    assert(!VersionedServing.versions(spark, root).contains(v1),
      "v1 must have aged out of the rolling window")
    quietly(intercept[IllegalArgumentException] {
      VersionedServing.readAt(spark, root, v1)
    })

    // the archive still serves v1 bit-exactly, with pruning and through
    // the production accessor
    assert(VersionedServing.read(spark, arch)
      .orderBy("event_id").collect().toSeq == v1Rows,
      "archive must serve the pinned snapshot exactly")
    val slice = Layout.servingEvents(spark, arch)
      .filter(col("ts") >= lit("2024-03-03").cast("timestamp"))
    assert(scanOf(slice).selectedPartitions.partitionCount == 1,
      "provenance markers must travel with the archived days")
    assert(slice.count() == 2)
  }

  test("the changed-days feed maintains a downstream rollup incrementally — per-day replace equals full recompute") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsfeed").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    def writeSink(rows: Seq[(Long, java.sql.Timestamp, Long)], mode: String): Unit =
      rows.toDF("event_id", "ts", "v")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode(mode).partitionBy("ts_date").parquet(sink)
    // the maintained artifact: day -> (rows, sum) from a serving frame
    def rollup(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.groupBy(col("ts_date").cast("string").as("day"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    writeSink(for (d <- 1 to 4; h <- Seq(8, 14, 20)) yield
      ((d * 100 + h).toLong, ts(f"2024-03-$d%02d $h%02d:00:00"), (d * 10 + h).toLong),
      "overwrite")
    VersionedServing.seal(spark, sink, root)
    val v1 = VersionedServing.currentVersion(spark, root)
    val maintained = collection.mutable.Map() ++= rollup(VersionedServing.read(spark, root))

    // the nightly close-out touches day 02 (late rows) and a NEW day 05
    writeSink(Seq(
        (222L, ts("2024-03-02 23:00:00"), 7L),
        (223L, ts("2024-03-02 23:30:00"), 8L),
        (501L, ts("2024-03-05 09:00:00"), 9L)), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02", "2024-03-05"))
    val v2 = VersionedServing.currentVersion(spark, root)

    // the incremental consumer: re-aggregate ONLY the feed's days and
    // replace them in the maintained artifact (the documented per-day
    // replace discipline — idempotent, no read of unchanged days)
    val feed = VersionedServing.readChangedDays(spark, root, v1, v2)
      .getOrElse(fail("two days changed — the feed must be non-empty"))
    maintained ++= rollup(feed)

    assert(maintained.toMap == rollup(VersionedServing.read(spark, root)),
      "feed-maintained rollup must equal the full recompute at v2")
    // day 02: original values 28, 34, 40 plus late 7, 8
    assert(maintained("2024-03-02") == ((5L, 117L)),
      s"day 02 must fold its late rows (got ${maintained("2024-03-02")})")
    assert(maintained("2024-03-05") == ((1L, 9L)), "the added day must appear")
  }

  test("schema evolution: the manifest pins each snapshot's schema — widened re-seals null-fill elder days, time travel is schema-exact") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsevo").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")

    // v1: two narrow days (event_id, ts)
    Seq((101L, ts("2024-03-01 09:00:00")), (201L, ts("2024-03-02 09:00:00")))
      .toDF("event_id", "ts")
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.partitionBy("ts_date").parquet(sink)
    VersionedServing.seal(spark, sink, root) // v1
    assert(VersionedServing.read(spark, root).columns.take(2).toSeq ==
      Seq("event_id", "ts"))

    // the sink widens: day 02 gains a `score` column and is re-sealed
    Seq((202L, ts("2024-03-02 21:00:00"), 0.5))
      .toDF("event_id", "ts", "score")
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.mode("overwrite").partitionBy("ts_date").parquet(sink)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02")) // v2

    // v2 serves the WIDENED schema deterministically: day 01's
    // generation predates the column and null-fills it — no dependence
    // on which file the planner would have sampled
    val cur = VersionedServing.read(spark, root)
    assert(cur.columns.contains("score"),
      s"widened column must be served (got ${cur.columns.mkString(", ")})")
    val byId = cur.select("event_id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byId == Map(101L -> None, 202L -> Some(0.5)), s"got $byId")

    // time travel is SCHEMA-exact: v1 still reads with v1's columns
    val v1 = VersionedServing.readAt(spark, root, 1L)
    assert(!v1.columns.contains("score"),
      "the pinned v1 snapshot must not grow columns it never had")
    assert(v1.select("event_id").as[Long].collect().sorted.toSeq == Seq(101L, 201L))

    // pruning still plans on the pinned-schema read (ts_date stays a
    // partition column under the explicit schema)
    val slice = cur.filter(col("ts") >= lit("2024-03-02").cast("timestamp"))
    assert(scanOf(slice).selectedPartitions.partitionCount == 1,
      "day pruning must survive the pinned schema")
    assert(slice.count() == 1)

    // expire and archive both carry the pinned schema forward
    VersionedServing.expire(spark, root, "2024-03-02") // v3
    assert(VersionedServing.read(spark, root).columns.contains("score"))
    val arch = s"$base/archive"
    VersionedServing.archive(spark, root, 2L, arch)
    assert(VersionedServing.read(spark, arch).columns.contains("score"))
  }

  test("z-ordered sealDays: identical rows, and the day's files prune BOTH cluster columns where the plain layout prunes neither") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vszord").toString
    val (sink, plain, zroot) = (s"$base/sink", s"$base/plain", s"$base/z")
    val day = "2024-03-01"
    // one dense day: 40k rows, user ids and intraday seconds both
    // uniform but DECORRELATED from row order (prime strides), so a
    // round-robin repartition spreads every value range over every file
    val n = 40000L
    val dayT0 = 1709251200L // 2024-03-01 00:00:00 UTC
    s.range(n).select(
        col("id").as("event_id"),
        (lit(dayT0) + (col("id") * 7919L) % 86400L).cast("timestamp").as("ts"),
        ((col("id") * 104729L) % 10000L).as("user_id"))
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.partitionBy("ts_date").parquet(sink)

    val target = 64L * 1024 // force a multi-file day at this volume
    val nPlain = VersionedServing.sealDays(spark, sink, plain, Seq(day), targetBytes = target)
    val nZ = VersionedServing.sealDays(spark, sink, zroot, Seq(day), targetBytes = target,
      zorder = Some(("user_id", "ts")))
    assert(nPlain == n && nZ == n, s"got plain=$nPlain z=$nZ")

    // the layout never changes an answer
    assert(VersionedServing.read(spark, zroot).orderBy("event_id").collect().toSeq ==
      VersionedServing.read(spark, plain).orderBy("event_id").collect().toSeq,
      "z-ordered and plain seals must serve identical data")

    val zDay = s"$zroot/data/${VersionedServing.GenCol}=1/ts_date=$day"
    val pDay = s"$plain/data/${VersionedServing.GenCol}=1/ts_date=$day"
    // a 1/8 × 1/8 box on (user, intraday time) — the dashboard slice
    val uBox = ("user_id", 4000L, 5249L)
    val tBox = ("ts", dayT0 + 6L * 3600, dayT0 + 9L * 3600 - 1)
    val (pTouch, pTotal) = Layout.filesTouched(s, pDay, Seq(uBox, tBox))
    val (zTouch, zTotal) = Layout.filesTouched(s, zDay, Seq(uBox, tBox))
    assert(pTotal >= 4 && zTotal >= 4, s"multi-file day sanity: plain=$pTotal z=$zTotal")
    // round-robin files span both full ranges: nothing prunes
    assert(pTouch == pTotal, s"plain layout must touch every file ($pTouch/$pTotal)")
    // the curve layout cuts the box to a corner of the files (margin
    // for range-sampling jitter: at least half pruned, typically more)
    assert(zTouch * 2 <= zTotal, s"z-order must prune the two-sided box ($zTouch/$zTotal)")
    // and each single-sided slice still prunes — the reason the curve
    // beats a linear sort on either column alone
    val (zU, _) = Layout.filesTouched(s, zDay, Seq(uBox))
    val (zT, _) = Layout.filesTouched(s, zDay, Seq(tBox))
    assert(zU < zTotal && zT < zTotal, s"one-sided slices must prune (user=$zU time=$zT of $zTotal)")
  }

  test("bootstrap sealFrame(zorder): every day directory lands curve-clustered, rows identical") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vszboot").toString
    val (plain, zroot) = (s"$base/plain", s"$base/z")
    val n = 30000L
    val frame = s.range(n).select(
        col("id").as("event_id"),
        (lit(1709251200L) + (col("id") % 3) * 86400L + (col("id") * 7919L) % 86400L)
          .cast("timestamp").as("ts"),
        ((col("id") * 104729L) % 10000L).as("user_id"))
      .withColumn("ts_date", Layout.utcDate(col("ts")))
    // the bootstrap's range exchange defaults to the session's shuffle
    // partitions (4 in tests — one file per day over 3 days); widen so
    // each day spans several curve-segment files, as it would in prod
    // (and AQE would re-coalesce a 30k-row exchange back to one file —
    // at prod volume its 64 MB advisory target is exactly the file
    // sizing we want, but here it hides the layout under test)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = s.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "12")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      VersionedServing.sealFrame(spark, frame, plain)
      VersionedServing.sealFrame(spark, frame, zroot, zorder = Some(("user_id", "ts")))
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
    assert(VersionedServing.read(spark, zroot).orderBy("event_id").collect().toSeq ==
      VersionedServing.read(spark, plain).orderBy("event_id").collect().toSeq,
      "bootstrap z-order must not change the served rows")
    // within each day the files tile the user dimension: a 1/4 user
    // slice cannot touch every file of a day (4 range partitions per
    // test session × 3 days ⇒ expect few files/day; assert pruning
    // whenever a day has more than one file)
    val days = VersionedServing.servedDays(spark, zroot)
    assert(days.length == 3)
    val pruned = days.map { d =>
      val dayDir = s"$zroot/data/${VersionedServing.GenCol}=1/ts_date=$d"
      val (touch, total) = Layout.filesTouched(s, dayDir, Seq(("user_id", 0L, 2499L)))
      (touch, total)
    }
    assert(pruned.exists { case (touch, total) => total > 1 && touch < total },
      s"at least one multi-file day must prune the user slice (got $pruned)")
  }

  test("bloom-filtered sealDays: identical rows, and point lookups skip row groups that stats and dictionaries cannot") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsbloom").toString
    val (sink, plain, broot) = (s"$base/sink", s"$base/plain", s"$base/bloom")
    val day = "2024-03-01"
    val dayT0 = 1709251200L
    // one dense day of EVEN event ids: any odd probe value sits inside
    // every file's [min,max] (stats cannot skip it) yet is absent
    // (bloom proves it). A 1 KB dictionary page limit makes the 40k
    // distinct ids overflow their dictionaries — the same fallback a
    // 128 MB row group of int64 ids hits at warehouse scale — so
    // dictionary filtering cannot act either: the bloom layer is the
    // only skip, which is exactly the claim under test.
    val n = 40000L
    s.range(n).select(
        (col("id") * 2L).as("event_id"),
        (lit(dayT0) + (col("id") * 7919L) % 86400L).cast("timestamp").as("ts"),
        ((col("id") * 104729L) % 10000L).as("user_id"))
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.partitionBy("ts_date").parquet(sink)

    val target = 64L * 1024 // multi-file day
    val smallDict = Map("parquet.dictionary.page.size" -> "1024")
    val nPlain = VersionedServing.sealDays(spark, sink, plain, Seq(day),
      targetBytes = target, writeOptions = smallDict)
    val nBloom = VersionedServing.sealDays(spark, sink, broot, Seq(day),
      targetBytes = target,
      writeOptions = smallDict ++ Layout.bloomOptions(Map("event_id" -> n)))
    assert(nPlain == n && nBloom == n, s"got plain=$nPlain bloom=$nBloom")

    // the physical knob never changes an answer
    assert(VersionedServing.read(spark, broot).orderBy("event_id").collect().toSeq ==
      VersionedServing.read(spark, plain).orderBy("event_id").collect().toSeq,
      "bloom and plain seals must serve identical data")

    val pDay = s"$plain/data/${VersionedServing.GenCol}=1/ts_date=$day"
    val bDay = s"$broot/data/${VersionedServing.GenCol}=1/ts_date=$day"
    val absentOdd = 40001L   // mid-range, never written
    val presentId = 39998L   // written exactly once
    val (pAbsent, pTotal) = Layout.rowGroupsTouched(s, pDay, "event_id", absentOdd)
    val (bAbsent, bTotal) = Layout.rowGroupsTouched(s, bDay, "event_id", absentOdd)
    assert(pTotal >= 4 && bTotal >= 4, s"multi-group day sanity: plain=$pTotal bloom=$bTotal")
    assert(pAbsent == pTotal,
      s"without bloom, an in-range absent id must touch every row group ($pAbsent/$pTotal)")
    assert(bAbsent == 0,
      s"bloom must prove the absent id out of every row group ($bAbsent/$bTotal)")
    val (bPresent, _) = Layout.rowGroupsTouched(s, bDay, "event_id", presentId)
    assert(bPresent >= 1 && bPresent < bTotal,
      s"a present id lives in one row group; bloom must skip (most of) the rest ($bPresent/$bTotal)")
    // and the lookup still answers through the serving read
    assert(VersionedServing.read(spark, broot)
      .filter(col("event_id") === presentId).count() == 1)
    assert(VersionedServing.read(spark, broot)
      .filter(col("event_id") === absentOdd).count() == 0)
  }

  test("composed seal: z-order + bloom on one writeOptions map — the curve prunes the band, the bloom proves the point, rows identical") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsboth").toString
    val (sink, plain, both) = (s"$base/sink", s"$base/plain", s"$base/both")
    val day = "2024-03-01"
    val dayT0 = 1709251200L
    val n = 40000L
    s.range(n).select(
        (col("id") * 2L).as("event_id"),
        (lit(dayT0) + (col("id") * 7919L) % 86400L).cast("timestamp").as("ts"),
        ((col("id") * 104729L) % 10000L).as("user_id"))
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.partitionBy("ts_date").parquet(sink)

    val target = 64L * 1024
    val smallDict = Map("parquet.dictionary.page.size" -> "1024")
    VersionedServing.sealDays(spark, sink, plain, Seq(day),
      targetBytes = target, writeOptions = smallDict)
    VersionedServing.sealDays(spark, sink, both, Seq(day), targetBytes = target,
      zorder = Some(("user_id", "ts")),
      writeOptions = smallDict ++ Layout.bloomOptions(Map("event_id" -> n)))

    assert(VersionedServing.read(spark, both).orderBy("event_id").collect().toSeq ==
      VersionedServing.read(spark, plain).orderBy("event_id").collect().toSeq,
      "composed physical layout must serve identical data")

    val bothDay = s"$both/data/${VersionedServing.GenCol}=1/ts_date=$day"
    // the curve layer: a user band touches a strict subset of the files
    val (uTouch, uTotal) = Layout.filesTouched(s, bothDay, Seq(("user_id", 0L, 1249L)))
    assert(uTotal >= 4 && uTouch < uTotal,
      s"curve must prune the user band on the composed seal ($uTouch/$uTotal)")
    // the bloom layer: a mid-range absent id is proven out of every row group
    val (aTouch, aTotal) = Layout.rowGroupsTouched(s, bothDay, "event_id", 40001L)
    assert(aTouch == 0, s"bloom must prove the absent id out on the composed seal ($aTouch/$aTotal)")
  }

  test("in-place sealDays under a pinned reader: the documented failure mode the versioned layout removes") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsinplace").toString
    val (sink, serving) = (s"$base/sink", s"$base/serving")
    def appendRows(n: Int, tag: Int): Unit =
      (1 to n).map(i => ((tag * 1000 + i).toLong, ts("2024-03-01 10:00:00")))
        .toDF("event_id", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode("append").partitionBy("ts_date").parquet(sink)

    appendRows(4, 1)
    graft.streaming.PartitionedIngest.sealDays(spark, sink, serving, Seq("2024-03-01"))
    // reader pins the serving dir's listing, then the day is resealed
    // IN PLACE: the dynamic overwrite deletes the files it holds
    val pinned = spark.read.parquet(serving)
    appendRows(3, 2)
    graft.streaming.PartitionedIngest.sealDays(spark, sink, serving, Seq("2024-03-01"))
    val thrown = quietly(intercept[Throwable](pinned.count()))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => s"${x.getClass.getName}: ${x.getMessage}").toSeq
    assert(chain(thrown).exists(m =>
        m.contains("FileNotFound") || m.contains("does not exist") ||
        m.contains("FILE_NOT_EXIST") || m.contains("MISSING_FILE")),
      s"expected the deleted-file failure the contract documents, got: ${chain(thrown)}")
  }

  test("self-driving close-out: sealTouched derives its day list from the sink's commit log — a late-touched day is never left stale") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("vstouch").toString
    val (sink, ckpt, root) = (s"$base/sink", s"$base/ckpt", s"$base/serving")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    def ingest(rows: (Long, java.sql.Timestamp)*): Unit = {
      val q = graft.streaming.PartitionedIngest.start(
        in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
      try { in.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    }

    ingest((101L, ts("2024-03-01 09:00:00")), (201L, ts("2024-03-02 09:00:00")),
      (301L, ts("2024-03-03 09:00:00")))
    // first close-out: no bookmark → the whole log
    val s1 = VersionedServing.sealTouched(spark, sink, root)
    assert(s1.days == Seq("2024-03-01", "2024-03-02", "2024-03-03") &&
      s1.rowsSealed == 3 && s1.beyondHorizon.isEmpty, s"got $s1")
    assert(s1.sealedThrough.isDefined &&
      VersionedServing.sealedThrough(spark, root) == s1.sealedThrough,
      "the publish must record the bookmark it covered")
    val v1 = VersionedServing.currentVersion(spark, root)

    // nothing new → metadata-only: no publish, no manifest churn
    val s2 = VersionedServing.sealTouched(spark, sink, root)
    assert(s2.days.isEmpty && s2.rowsSealed == 0 &&
      s2.sealedThrough == s1.sealedThrough, s"got $s2")
    assert(VersionedServing.currentVersion(spark, root) == v1,
      "an idle close-out must not publish")

    // a late row lands in OLD day 01 plus a NEW day 04 — NOBODY names
    // the days; the close-out discovers exactly those two
    ingest((102L, ts("2024-03-01 23:30:00")), (401L, ts("2024-03-04 08:00:00")))
    val s3 = VersionedServing.sealTouched(spark, sink, root)
    assert(s3.days == Seq("2024-03-01", "2024-03-04") && s3.rowsSealed == 3,
      s"the close-out must discover exactly the touched days, got $s3")
    val v2 = VersionedServing.currentVersion(spark, root)
    assert(VersionedServing.diff(spark, root, v1, v2) ==
      VersionedServing.VersionDiff(Seq("2024-03-01"), Seq("2024-03-04"), Nil),
      "untouched days 02/03 must keep their generation")
    assert(VersionedServing.read(spark, root)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(101L, 102L, 201L, 301L, 401L),
      "the serving copy must equal sink truth after the automated close-out")

    // the retention contract: after day 01 expires, a late row for it is
    // REFUSED (never resurrected) and REPORTED — and keeps being
    // reported at every close-out until an operator acts, because a
    // refusal publishes nothing and so never advances the bookmark
    VersionedServing.expire(spark, root, "2024-03-02")
    ingest((103L, ts("2024-03-01 23:59:00")))
    val s4 = VersionedServing.sealTouched(spark, sink, root,
      keepFrom = Some("2024-03-02"))
    assert(s4.days.isEmpty && s4.beyondHorizon == Seq("2024-03-01"), s"got $s4")
    assert(!VersionedServing.servedDays(spark, root).contains("2024-03-01"),
      "an expired day must never be resurrected by the close-out")
    val s5 = VersionedServing.sealTouched(spark, sink, root,
      keepFrom = Some("2024-03-02"))
    assert(s5.beyondHorizon == Seq("2024-03-01"),
      "the alert must persist until handled — the bookmark only advances on publish")
  }

  test("a reader that outlives the grace window fails loudly at the boundary — and the window is a conf") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsgrace").toString
    val (sink, root, wide) = (s"$base/sink", s"$base/serving", s"$base/wide")
    def appendRows(n: Int, tag: Int): Unit =
      (1 to n).map(i => ((tag * 1000 + i).toLong, ts("2024-03-01 10:00:00")))
        .toDF("event_id", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode("append").partitionBy("ts_date").parquet(sink)

    s.conf.set(VersionedServing.KeepManifestsKey, "2")
    try {
      appendRows(4, 1)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v1
      val v1 = VersionedServing.currentVersion(spark, root)
      val pinned = VersionedServing.read(spark, root)
      assert(pinned.count() == 4)

      // publish #2: still inside the window (keep=2 retains v1+v2)
      appendRows(3, 2)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v2
      assert(pinned.count() == 4, "inside the window the pinned scan survives")

      // publish #3: v1 ages out, its generation's files are reclaimed —
      // the outlived reader fails LOUDLY mid-flight on deleted files
      // (never a silent wrong answer: the files are gone, not replaced)
      appendRows(2, 3)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v3
      val thrown = quietly(intercept[Throwable](pinned.count()))
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
          .map(x => s"${x.getClass.getName}: ${x.getMessage}").toSeq
      assert(chain(thrown).exists(m =>
          m.contains("FileNotFound") || m.contains("does not exist") ||
          m.contains("FILE_NOT_EXIST") || m.contains("MISSING_FILE")),
        s"expected the outlived-grace deleted-file failure, got: ${chain(thrown)}")
      // time travel to the aged-out version refuses BY NAME, citing the
      // conf key an operator would size
      val e = intercept[IllegalArgumentException](
        VersionedServing.readAt(spark, root, v1))
      assert(e.getMessage.contains(VersionedServing.KeepManifestsKey), e.getMessage)

      // the same three publishes under a WIDER window keep v1 readable:
      // the reclaim respects the conf, not the compiled default
      s.conf.set(VersionedServing.KeepManifestsKey, "4")
      (1 to 3).foreach { _ =>
        VersionedServing.sealDays(spark, sink, wide, Seq("2024-03-01")) }
      assert(VersionedServing.versions(spark, wide).size == 3 &&
        VersionedServing.readAt(spark, wide, 1L).count() == 9,
        "a widened window must retain what the default would have reclaimed")
    } finally s.conf.unset(VersionedServing.KeepManifestsKey)
  }

  test("seal under a live ingest: a batch committed between bookmark and snapshot is sealed now AND re-discovered next close-out") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("vsrace").toString
    val (sink, ckpt, root) = (s"$base/sink", s"$base/ckpt", s"$base/serving")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
    val q = graft.streaming.PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      in.addData((1L, ts("2024-03-01 10:00:00"))); q.processAllAvailable() // batch 0
      // the race: a live micro-batch commits AFTER seal() reads its
      // bookmark and BEFORE it pins the sink snapshot
      VersionedServing.preSealSnapshotHook = () => {
        in.addData((2L, ts("2024-03-02 10:00:00"))); q.processAllAvailable() // batch 1
      }
      try VersionedServing.seal(spark, sink, root)
      finally VersionedServing.preSealSnapshotHook = () => ()
      // the mid-gap commit is IN the sealed data (snapshot pinned after)…
      assert(VersionedServing.read(spark, root)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      // …and the bookmark is BELOW it (read before), so the next
      // close-out re-discovers its day instead of skipping it forever —
      // the invariant the old argument-evaluation order violated
      assert(VersionedServing.sealedThrough(spark, root) == Some(0L))
      val t = VersionedServing.sealTouched(spark, sink, root)
      assert(t.days == Seq("2024-03-02") && t.sealedThrough == Some(1L),
        s"the mid-seal commit's day must be re-sealed, got $t")
      // idempotent re-seal: same rows, nothing lost, nothing doubled
      assert(VersionedServing.read(spark, root)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("keepManifestsMs: a publish burst cannot reclaim manifests younger than the time floor") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsgracems").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    def appendRows(n: Int, tag: Int): Unit =
      (1 to n).map(i => ((tag * 1000 + i).toLong, ts("2024-03-01 10:00:00")))
        .toDF("event_id", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .write.mode("append").partitionBy("ts_date").parquet(sink)

    // the hostile shape: count window 1 (every publish would reclaim its
    // predecessor) + a per-batch publish burst — the exact compression
    // the floor exists for. One hour floor: every manifest in this test
    // is younger than it, so ALL must survive the burst.
    s.conf.set(VersionedServing.KeepManifestsKey, "1")
    s.conf.set(VersionedServing.KeepManifestsMsKey, "3600000")
    try {
      appendRows(4, 1)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v1
      val pinned = VersionedServing.read(spark, root)
      assert(pinned.count() == 4)
      appendRows(3, 2)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v2
      appendRows(2, 3)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v3
      assert(VersionedServing.versions(spark, root) == Seq(1L, 2L, 3L),
        "manifests younger than the floor must survive a count-1 burst")
      assert(pinned.count() == 4,
        "the pinned scan survives the burst — the floor is the wall-clock guarantee")
      assert(VersionedServing.readAt(spark, root, 1L).count() == 4)

      // floor disabled → the very next publish reclaims down to the
      // count window (the historical behavior, untouched by default)
      s.conf.set(VersionedServing.KeepManifestsMsKey, "0")
      appendRows(1, 4)
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v4
      assert(VersionedServing.versions(spark, root) == Seq(4L),
        "with the floor off, the count window alone governs reclaim")
    } finally {
      s.conf.unset(VersionedServing.KeepManifestsKey)
      s.conf.unset(VersionedServing.KeepManifestsMsKey)
    }
  }

  test("archive verification: a corrupted copy refuses to publish; the healed retry serves the pin") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsverify").toString
    val (sink, root, arch) = (s"$base/sink", s"$base/serving", s"$base/archive")
    (1 to 6).map(i => (i.toLong, ts("2024-03-01 10:00:00")))
      .toDF("event_id", "ts")
      .withColumn("ts_date", Layout.utcDate(col("ts")))
      .write.partitionBy("ts_date").parquet(sink)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01"))
    val v1 = VersionedServing.currentVersion(spark, root)

    // between copy and verification, one copied data file loses bytes
    // (an eventually-consistent store or partial multipart commit)
    def archivedParquet(): java.io.File = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$arch/data"))
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head
    }
    VersionedServing.postArchiveCopyHook = () => {
      val raf = new java.io.RandomAccessFile(archivedParquet(), "rw")
      try raf.setLength(raf.length() / 2) finally raf.close()
    }
    try {
      val e = quietly(intercept[IllegalArgumentException](
        VersionedServing.archive(spark, root, v1, arch)))
      assert(e.getMessage.contains("NOT publishing"), e.getMessage)
      assert(!VersionedServing.isVersioned(spark, arch),
        "a refused archive must leave no manifest — readers can never resolve it")
    } finally VersionedServing.postArchiveCopyHook = () => ()

    // the retry re-copies over the same root (no manifest yet, so it is
    // not "immutable" — the refusal left it unborn), verifies, publishes
    assert(VersionedServing.archive(spark, root, v1, arch) > 0)
    assert(VersionedServing.read(spark, arch)
      .orderBy("event_id").collect().toSeq ==
      VersionedServing.readAt(spark, root, v1)
        .orderBy("event_id").collect().toSeq,
      "the healed archive must serve the pinned snapshot exactly")
  }
}
