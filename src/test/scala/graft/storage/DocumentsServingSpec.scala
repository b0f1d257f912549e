package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The versioned DOCUMENTS corpus: the table the dedup index tracks
  * gets the same snapshot isolation / time travel / version pin the
  * events table has — "which exact corpus did training run X read" —
  * and the manifest-log follower feeds the persisted sketch index from
  * THIS root's changed days. */
class DocumentsServingSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  /** Per-doc-unique tokens: distinct docs share no shingles. */
  private def text(seed: Int): String =
    (0 until 15).map(j => s"w${seed}x$j").mkString(" ")
  private def docRow(id: Long, txt: String, day: String) =
    (id, txt, "en", "web", txt.length.toLong, ts(s"$day 10:00:00"))

  test("documents served from a versioned root: one dataset for every accessor, time-travel pin, follower-fed sketch index") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("docserve").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    def writeSink(rows: Seq[(Long, String, String, String, Long, java.sql.Timestamp)],
        mode: String): Unit =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .drop("ts")
        .write.mode(mode).partitionBy("ts_date").parquet(sink)
    def servedDocs(): Seq[(Long, String)] =
      graft.Tables.documents(s, "/nonexistent") // dir ignored: the root IS the corpus
        .select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    // ingest days 01+02, bootstrap seal → v1
    writeSink(Seq(
      docRow(1L, text(1), "2024-03-01"),
      docRow(2L, text(2), "2024-03-01"),
      docRow(3L, text(3), "2024-03-02")), "overwrite")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01", "2024-03-02")) // v1

    s.conf.set(Layout.DocsServingDirKey, root)
    try {
      // both accessors serve the snapshot, raw schema, values identical
      // to the sink — the one-dataset rule
      assert(graft.Tables.documents(s, "/nonexistent").schema.fieldNames.toSeq ==
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      assert(servedDocs() == Seq((1L, text(1)), (2L, text(2)), (3L, text(3))))
      assert(graft.Tables.documentsRaw(s, "/nonexistent")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L), "documentsRaw must serve the same dataset")
      val v1 = VersionedServing.currentVersion(spark, root)

      // the follower feeds the persisted sketch index from THIS root's
      // changed days: day 03 lands (one exact dup of doc 1, one fresh),
      // the feed batch is dispositioned against the maintained sketch
      val sketchRoot = s"$base/sketch"
      var last: Map[Long, String] = Map.empty
      val follower = new ServingFollower(spark, root)
      def consume(version: Long, days: Seq[String],
          slices: org.apache.spark.sql.DataFrame): Unit = {
        val byDay = days.map { d =>
          d -> graft.ops.Dedup.sketchOf(
            slices.filter(col("ts_date") === lit(d).cast("date"))
              .select("doc_id", "text")).localCheckpoint()
        }
        val have = new java.io.File(sketchRoot)
        val kept = (if (have.exists()) have.listFiles().toSeq else Nil)
          .map(_.getName.stripPrefix("ts_date="))
          .filterNot(days.contains(_))
        if (kept.nonEmpty)
          last = graft.ops.Dedup.sketchedDispositions(
              s.read.parquet(kept.map(d => s"$sketchRoot/ts_date=$d"): _*),
              byDay.map(_._2).reduce(_ unionByName _))
            .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        byDay.foreach { case (d, sk) =>
          sk.write.mode("overwrite").parquet(s"$sketchRoot/ts_date=$d") }
      }
      assert(follower.poll()(consume) ==
        Some((v1, Seq("2024-03-01", "2024-03-02")))) // bootstrap seeds the sketch

      writeSink(Seq(
        docRow(11L, text(1), "2024-03-03"),
        docRow(12L, text(12), "2024-03-03")), "append")
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-03")) // v2
      assert(follower.poll()(consume).map(_._2) == Some(Seq("2024-03-03")))
      assert(last == Map(11L -> "exact", 12L -> "fresh"),
        s"the corpus root's changed days feed the sketch index, got $last")

      // the CURRENT snapshot now serves all three days...
      assert(servedDocs().map(_._1) == Seq(1L, 2L, 3L, 11L, 12L))
      // ...and the VERSION PIN re-reads exactly the corpus run X saw
      s.conf.set(Layout.DocsServingVersionKey, v1.toString)
      assert(servedDocs().map(_._1) == Seq(1L, 2L, 3L),
        "a pinned version must serve the exact corpus it published")
      s.conf.unset(Layout.DocsServingVersionKey)
      assert(servedDocs().map(_._1) == Seq(1L, 2L, 3L, 11L, 12L))
    } finally {
      s.conf.unset(Layout.DocsServingDirKey)
      s.conf.unset(Layout.DocsServingVersionKey)
    }
    // conf off → the batch accessor is untouched (reads the named dir)
    val tmp = s"$base/batch"
    Seq((9L, text(9), "en", "web", 15L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    assert(graft.Tables.documents(s, tmp).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("time-travel replay: a past run's dispositions reproduce against its pinned corpus version") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("docreplay").toString
    val (sink, root) = (s"$base/sink", s"$base/serving")
    def writeSink(rows: Seq[(Long, String, String, String, Long, java.sql.Timestamp)],
        mode: String): Unit =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars", "ts")
        .withColumn("ts_date", Layout.utcDate(col("ts")))
        .drop("ts")
        .write.mode(mode).partitionBy("ts_date").parquet(sink)

    writeSink(Seq(
      docRow(1L, text(1), "2024-03-01"),
      docRow(2L, text(2), "2024-03-01")), "overwrite")
    VersionedServing.sealDays(spark, sink, root, Seq("2024-03-01")) // v1
    val v1 = VersionedServing.currentVersion(spark, root)

    // "run X": one ingest batch dispositioned against the then-current
    // corpus; a deployment records (results, corpus version v1)
    val batch = Seq((21L, text(1)), (22L, text(22))).toDF("doc_id", "text")
    s.conf.set(Layout.DocsServingDirKey, root)
    try {
      def dispositionsNow(): Map[Long, String] =
        graft.ops.Dedup.incrementalDispositions(
            graft.Tables.documents(s, "/nonexistent").select("doc_id", "text"),
            batch)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val runX = dispositionsNow()
      assert(runX == Map(21L -> "exact", 22L -> "fresh"), s"run X: $runX")

      // the corpus evolves: a later day carries doc 22's exact text, so
      // the same batch dispositions DIFFERENTLY against corpus head
      writeSink(Seq(docRow(3L, text(22), "2024-03-02")), "append")
      VersionedServing.sealDays(spark, sink, root, Seq("2024-03-02")) // v2
      val head = dispositionsNow()
      assert(head == Map(21L -> "exact", 22L -> "exact"),
        s"the evolved corpus must change the verdict on doc 22, got $head")

      // replay under run X's recorded pin: the ingest twin reads the
      // EXACT corpus run X saw and reproduces its dispositions — the
      // "which corpus did run X read" story closed for the ingest loop,
      // not just ad-hoc reads
      s.conf.set(Layout.DocsServingVersionKey, v1.toString)
      assert(dispositionsNow() == runX,
        "pinned replay must reproduce run X's dispositions exactly")
    } finally {
      s.conf.unset(Layout.DocsServingDirKey)
      s.conf.unset(Layout.DocsServingVersionKey)
    }
  }
}
