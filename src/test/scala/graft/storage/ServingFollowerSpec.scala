package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The manifest-log consumer loop: each publish of the versioned
  * serving copy becomes one micro-batch of exactly its changed day
  * slices, feeding the ingest-twin dedup operator — and the maintained
  * artifact equals the batch recompute at every step. */
class ServingFollowerSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** 15 per-doc-unique tokens: distinct docs share NO shingles, so a
    * 'near' verdict can only come from a deliberately constructed
    * near-dup (and 'fresh' is deterministic for everything else). */
  private def text(seed: Int): String =
    (0 until 15).map(j => s"w${seed}x$j").mkString(" ")

  test("follower: two seals deliver exactly the changed day slices; the feed-maintained dedup index equals the batch recompute") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsfollow").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    def writeSink(rows: Seq[(Long, String, java.sql.Timestamp)], mode: String): Unit =
      rows.toDF("doc_id", "text", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .drop("ts")
        .write.mode(mode).partitionBy("ts_date").parquet(sink)

    // the INDEX the consumer maintains: day -> that day's (doc_id, text)
    // rows, replaced whole per feed batch (the documented discipline)
    val index = collection.mutable.Map[String, Seq[(Long, String)]]()
    def indexFrame(excludingDays: Set[String] = Set.empty): DataFrame =
      index.view.filterKeys(!excludingDays(_)).values.flatten.toSeq
        .toDF("doc_id", "text")
    val processed = collection.mutable.ArrayBuffer[(Long, Seq[String], Seq[Long])]()
    var lastDispositions: Map[Long, String] = Map.empty
    val follower = new ServingFollower(spark, root)
    def consume(version: Long, days: Seq[String], slices: DataFrame): Unit = {
      val rows = slices.select(col("doc_id"), col("text"),
          col("ts_date").cast("string").as("day"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // disposition the incoming docs against the index EXCLUDING the
      // re-served days (per-day replace: the old day is being superseded)
      lastDispositions = graft.ops.Dedup.incrementalDispositions(
          indexFrame(excludingDays = days.toSet),
          rows.map(r => (r._1, r._2)).toSeq.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.groupBy(_._3).foreach { case (day, rs) =>
        index(day) = rs.map(r => (r._1, r._2)).toSeq }
      processed += ((version, days, rows.map(_._1).sorted.toSeq))
    }

    // nothing published yet: a consumer may start before the first seal
    assert(follower.poll()(consume).isEmpty && processed.isEmpty)

    // day 01 is the initial corpus; the first poll bootstraps from the
    // full snapshot
    writeSink(Seq(
      (1L, text(1), ts("2024-03-01 09:00:00")),
      (2L, text(2), ts("2024-03-01 10:00:00")),
      (3L, text(3), ts("2024-03-01 11:00:00"))), "overwrite")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v1
    val p1 = follower.poll()(consume)
    assert(p1 == Some((1L, Seq("2024-03-01"))), s"got $p1")
    assert(processed.last._3 == Seq(1L, 2L, 3L))
    assert(follower.poll()(consume).isEmpty, "no new publish → no batch")

    // day 02 lands: an exact dup of doc 1, a near dup of doc 2 (same
    // tokens after lowercasing — identical shingles, different raw
    // bytes), and a fresh doc
    writeSink(Seq(
      (11L, text(1), ts("2024-03-02 09:00:00")),
      (12L, text(2).toUpperCase, ts("2024-03-02 10:00:00")),
      (13L, text(13), ts("2024-03-02 11:00:00"))), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02")) // v2
    val p2 = follower.poll()(consume)
    assert(p2 == Some((2L, Seq("2024-03-02"))), s"got $p2")
    assert(processed.last._3 == Seq(11L, 12L, 13L),
      "the second batch must hold exactly the day-02 slice")
    assert(lastDispositions == Map(11L -> "exact", 12L -> "near", 13L -> "fresh"),
      s"ingest-twin dedup over the feed batch, got $lastDispositions")

    // the close-out touches TWO days in one publish: a late fresh doc in
    // day 01 and a new day 03 whose doc exactly duplicates a DAY-02 doc
    // (proving the maintained index saw the previous feed batch)
    writeSink(Seq(
      (4L, text(4), ts("2024-03-01 23:00:00")),
      (21L, text(13), ts("2024-03-03 09:00:00"))), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01", "2024-03-03")) // v3
    val p3 = follower.poll()(consume)
    assert(p3 == Some((3L, Seq("2024-03-01", "2024-03-03"))), s"got $p3")
    assert(processed.last._3 == Seq(1L, 2L, 3L, 4L, 21L),
      "a re-sealed day is delivered WHOLE, plus the added day — nothing else")
    assert(lastDispositions(21L) == "exact" && lastDispositions(4L) == "fresh",
      s"day-03's dup of a day-02 doc must hit the maintained index, got $lastDispositions")
    // re-served day-01 docs disposition against the OTHER days' index:
    // doc 1 is now an exact hit on day-02's copy of it
    assert(lastDispositions(1L) == "exact" && lastDispositions(3L) == "fresh")

    // the maintained artifact equals the batch recompute at the head
    assert(indexFrame().collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      VersionedServing.read(spark, root).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq,
      "feed-maintained corpus must equal the full snapshot read")

    // an expire-only publish advances the bookmark without a batch
    VersionedServing.expire(spark, root, "2024-03-02") // v4
    val before = processed.size
    assert(follower.poll()(consume) == Some((4L, Seq())) && processed.size == before,
      "a metadata-only publish must advance the bookmark, not deliver")
    assert(follower.lastProcessed == Some(4L))

    // restart safety: a NEW follower resumed from the checkpointed
    // bookmark sees exactly what the continuous one would have — the
    // at-least-once contract's other half (the caller persists
    // lastProcessed with its artifact and resumes with startAfter)
    writeSink(Seq((22L, text(22), ts("2024-03-02 12:00:00"))), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02")) // v5
    val resumed = new ServingFollower(spark, root,
      startAfter = follower.lastProcessed)
    val got = collection.mutable.ArrayBuffer[(Long, Seq[String], Seq[Long])]()
    val pr = resumed.poll() { (v, days, df) =>
      got += ((v, days, df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)) }
    assert(pr == Some((5L, Seq("2024-03-02"))) &&
      got.head._3 == Seq(11L, 12L, 13L, 22L),
      s"a resumed follower must process exactly the publishes past its bookmark, got $got")
    follower.poll()(consume) // re-align the original follower for the loop leg below

    // the LOOP form: a fresh follower bootstraps, then notices the next
    // publish on its own thread
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val h = new ServingFollower(spark, root).follow(25) { (v, _, _) => seen.add(v) }
    try {
      val deadline = System.currentTimeMillis + 30000
      while (!seen.contains(5L) && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(seen.contains(5L), "the loop must bootstrap from the current snapshot")
      writeSink(Seq((31L, text(31), ts("2024-03-04 09:00:00"))), "append")
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-04")) // v6
      while (!seen.contains(6L) && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(seen.contains(6L), "the loop must deliver the publish it observed")
    } finally h.close()
  }

  test("follower feeds the SEMANTIC ingest-twin: changed-day vectors dispositioned against the maintained assigned index") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsfollowsem").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    // two far-apart quantized centroids — the index's shipped codebook
    val codebook: Seq[(Long, Seq[Long])] =
      Seq((0L, Seq(1000L, 0L, 0L, 0L)), (1L, Seq(0L, 1000L, 0L, 0L)))
    def writeSink(rows: Seq[(Long, Seq[Float], java.sql.Timestamp)], mode: String): Unit =
      rows.toDF("vec_id", "embedding", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .drop("ts")
        .write.mode(mode).partitionBy("ts_date").parquet(sink)
    def v(a: Float, b: Float, c: Float, d: Float) = Seq(a, b, c, d)

    // day 01: the corpus — one vector per cluster
    writeSink(Seq(
      (1L, v(1f, 0f, 0f, 0f), ts("2024-03-01 09:00:00")),
      (2L, v(0f, 1f, 0f, 0f), ts("2024-03-01 10:00:00"))), "overwrite")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v1

    // the consumer: maintained ASSIGNED index (vec_id, list_id, qv) per
    // day — what a deployment persists between ingests
    val index = collection.mutable.Map[String, org.apache.spark.sql.DataFrame]()
    var last: Map[Long, (Long, String)] = Map.empty
    val follower = new ServingFollower(spark, root)
    def consume(version: Long, days: Seq[String], slices: DataFrame): Unit = {
      val byDay = days.map { d =>
        d -> graft.ops.Similarity.assignedOf(
          slices.filter(col("ts_date") === lit(d).cast("date"))
            .select("vec_id", "embedding"), codebook)
          .select("vec_id", "list_id", "qv").localCheckpoint()
      }
      val idxBefore = index.view.filterKeys(!days.contains(_)).values
        .reduceOption(_ unionByName _)
      idxBefore.foreach { idx =>
        last = graft.ops.Similarity.semanticDispositions(idx,
            byDay.map(_._2).reduce(_ unionByName _))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      }
      byDay.foreach { case (d, df) => index(d) = df }
    }
    assert(follower.poll()(consume).isDefined) // bootstrap seeds the index

    // day 02: an exact re-embed of vec 1 (cosine 1 in cluster 0) and an
    // orthogonal fresh vector (assigned somewhere, no near neighbor)
    writeSink(Seq(
      (11L, v(1f, 0f, 0f, 0f), ts("2024-03-02 09:00:00")),
      (12L, v(0f, 0f, 1f, 0f), ts("2024-03-02 10:00:00"))), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02")) // v2
    assert(follower.poll()(consume) == Some((2L, Seq("2024-03-02"))))
    assert(last.view.mapValues(_._2).toMap == Map(11L -> "dup", 12L -> "fresh"),
      s"semantic twin over the feed batch, got $last")
    assert(last(11L)._1 == 0L, "the dup must land in its neighbor's cluster")

    // equality with the batch recompute: the same dispositions fall out
    // of assigning the WHOLE current snapshot from scratch
    val allAssigned = graft.ops.Similarity.assignedOf(
      VersionedServing.read(spark, root).select("vec_id", "embedding"), codebook)
      .select("vec_id", "list_id", "qv").localCheckpoint()
    val recompute = graft.ops.Similarity.semanticDispositions(
        allAssigned.filter(col("vec_id") < 10L),
        allAssigned.filter(col("vec_id") >= 10L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(recompute == last.view.mapValues(_._2).toMap,
      "feed-driven dispositions must equal the from-scratch recompute")
  }

  test("follower maintains the PERSISTED dedup sketch per-day; feed-built sketch equals the from-scratch re-sketch") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vssketch").toString
    val (sink, root, sketchRoot) = (s"$base/sink", s"$base/serving", s"$base/sketch")
    def writeSink(rows: Seq[(Long, String, java.sql.Timestamp)], mode: String): Unit =
      rows.toDF("doc_id", "text", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .drop("ts")
        .write.mode(mode).partitionBy("ts_date").parquet(sink)

    // the consumer's artifact is the PERSISTED sketch table, one
    // directory per day, replaced whole per feed batch — the corpus
    // text is sketched exactly once, at the feed batch that delivers it
    def sketchDays: Seq[String] = {
      val d = new java.io.File(sketchRoot)
      if (!d.exists()) Nil
      else d.listFiles().filter(_.getName.startsWith("ts_date="))
        .map(_.getName.stripPrefix("ts_date=")).sorted.toSeq
    }
    def readSketch(excluding: Set[String]): Option[DataFrame] = {
      val keep = sketchDays.filterNot(excluding)
      if (keep.isEmpty) None
      else Some(s.read.parquet(keep.map(d => s"$sketchRoot/ts_date=$d"): _*))
    }
    var last: Map[Long, String] = Map.empty
    def consume(version: Long, days: Seq[String], slices: DataFrame): Unit = {
      val byDay = days.map { d =>
        d -> graft.ops.Dedup.sketchOf(
          slices.filter(col("ts_date") === lit(d).cast("date"))
            .select("doc_id", "text")).localCheckpoint()
      }
      // disposition the batch against the index EXCLUDING the re-served
      // days (per-day replace: those days are being superseded) — from
      // the persisted artifact alone, no document text re-read
      readSketch(excluding = days.toSet).foreach { idx =>
        last = graft.ops.Dedup.sketchedDispositions(idx,
            byDay.map(_._2).reduce(_ unionByName _))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      }
      byDay.foreach { case (d, sk) =>
        sk.write.mode("overwrite").parquet(s"$sketchRoot/ts_date=$d") }
    }
    val follower = new ServingFollower(spark, root)

    // day 01 bootstraps the sketch; nothing to disposition against yet
    writeSink(Seq(
      (1L, text(1), ts("2024-03-01 09:00:00")),
      (2L, text(2), ts("2024-03-01 10:00:00")),
      (3L, text(3), ts("2024-03-01 11:00:00"))), "overwrite")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v1
    assert(follower.poll()(consume) == Some((1L, Seq("2024-03-01"))))
    assert(sketchDays == Seq("2024-03-01") && last.isEmpty)

    // day 02: exact dup of doc 1, near dup of doc 2 (same tokens after
    // lowercasing), and a fresh doc — dispositioned against the
    // persisted day-01 sketch
    writeSink(Seq(
      (11L, text(1), ts("2024-03-02 09:00:00")),
      (12L, text(2).toUpperCase, ts("2024-03-02 10:00:00")),
      (13L, text(13), ts("2024-03-02 11:00:00"))), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02")) // v2
    assert(follower.poll()(consume) == Some((2L, Seq("2024-03-02"))))
    assert(last == Map(11L -> "exact", 12L -> "near", 13L -> "fresh"),
      s"sketch-fed ingest-twin dedup, got $last")

    // a two-day close-out: late fresh doc in day 01 + a day 03 doc that
    // exactly duplicates a DAY-02 doc — the hit comes from sketch rows
    // written by the PREVIOUS feed batch, and the re-served day 01 is
    // excluded from its own index
    writeSink(Seq(
      (4L, text(4), ts("2024-03-01 23:00:00")),
      (21L, text(13), ts("2024-03-03 09:00:00"))), "append")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01", "2024-03-03")) // v3
    assert(follower.poll()(consume) ==
      Some((3L, Seq("2024-03-01", "2024-03-03"))))
    assert(last(21L) == "exact" && last(4L) == "fresh" &&
      last(1L) == "exact" && last(3L) == "fresh",
      s"day-03's dup of a day-02 doc must hit the persisted sketch, got $last")
    assert(sketchDays == Seq("2024-03-01", "2024-03-02", "2024-03-03"))

    // the feed-maintained sketch equals re-sketching the full current
    // snapshot from scratch — per-day replace loses nothing, keeps
    // nothing stale
    val fed = readSketch(Set.empty).get
      .select("doc_id", "ch", "band", "bsig")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq
    val scratch = graft.ops.Dedup.sketchOf(
        VersionedServing.read(spark, root).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq
    assert(fed == scratch,
      "feed-maintained sketch must equal the from-scratch re-sketch")
  }

  test("follower: bootstrap against an all-expired snapshot delivers nothing and advances") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("vsempty").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    Seq((1L, text(1), ts("2024-03-01 09:00:00")))
      .toDF("doc_id", "text", "ts")
      .withColumn("ts_date", Layout.utcDate(col("ts"))).drop("ts")
      .write.partitionBy("ts_date").parquet(sink)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v1
    VersionedServing.expire(spark, root, "2024-03-02")              // v2: zero days
    assert(VersionedServing.servedDays(spark, root).isEmpty)

    // a FRESH consumer's first poll sees a current snapshot with zero
    // readable days: nothing to deliver, but the bookmark must advance
    // (crashing here would wedge every new consumer of an idle root)
    var called = 0
    val follower = new ServingFollower(spark, root)
    val p = follower.poll() { (_, _, _) => called += 1 }
    assert(p == Some((2L, Seq())) && called == 0, s"got $p after $called calls")
    assert(follower.lastProcessed == Some(2L))

    // and the next publish is delivered normally from that bookmark
    Seq((2L, text(2), ts("2024-03-03 09:00:00")))
      .toDF("doc_id", "text", "ts")
      .withColumn("ts_date", Layout.utcDate(col("ts"))).drop("ts")
      .write.mode("append").partitionBy("ts_date").parquet(sink)
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-03")) // v3
    val got = collection.mutable.ArrayBuffer[Long]()
    val p2 = follower.poll() { (_, _, df) =>
      got ++= df.select("doc_id").collect().map(_.getLong(0)) }
    assert(p2 == Some((3L, Seq("2024-03-03"))) && got.toSeq == Seq(2L))
  }
}
