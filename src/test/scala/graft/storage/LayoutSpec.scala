package graft.storage

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the planner guarantees the Layout module exists to buy:
  * bucketed joins/aggregations plan WITHOUT shuffle exchanges, and
  * partition-column filters prune directories at planning time. Each
  * assertion is against the physical plan, not just the result — the
  * failure mode (a silent extra Exchange / a full-table scan) is
  * invisible in small-scale results. */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(name: String) = s"/tmp/graft_layout/$name"

  private def exchanges(plan: String): Int =
    graft.ops.PlanGuardSpec.shuffleExchanges(plan)

  private def leafScan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.FileSourceScanExec = {
    // AQE wraps the physical plan; collectLeaves on the wrapper never
    // descends into it — unwrap to the initial plan for scan inspection
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    plan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  private def withNoBroadcast[T](body: => T): T = {
    // the exchange-free claim must hold on the SortMergeJoin path (at
    // 100 TB neither fact side broadcasts); disable auto-broadcast so
    // fixture-sized tables can't cheat the assertion
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed⋈bucketed on the bucket key: zero exchanges, no re-sort") {
    Layout.writeBucketed(Tables.lineitem(spark, dir), "layout_li",
      tmp("li_bucketed"), "l_orderkey", 8)
    Layout.writeBucketed(Tables.orders(spark, dir), "layout_ord",
      tmp("ord_bucketed"), "o_orderkey", 8)
    try withNoBroadcast {
      val joined = Layout.table(spark, "layout_li")
        .join(Layout.table(spark, "layout_ord"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(exchanges(plan) == 0,
        s"bucketed join must not shuffle either side:\n$plan")
      // Spark ≥3.0 distrusts per-bucket sort order by default (a bucket
      // split across files has none); with single-file buckets — which
      // writeBucketed guarantees via its pre-write repartition — the
      // legacy knob lets the planner trust sortBy and drop the SMJ
      // re-sorts too
      val prevOrd = spark.conf
        .get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val orderedPlan =
        try Layout.table(spark, "layout_li")
          .join(Layout.table(spark, "layout_ord"),
            col("l_orderkey") === col("o_orderkey"))
          .queryExecution.executedPlan.toString
        finally spark.conf
          .set("spark.sql.legacy.bucketedTableScan.outputOrdering", prevOrd)
      assert(!orderedPlan.linesIterator.exists(_.trim.matches("[:+]- Sort \\[.*")),
        s"single-file-bucket sortBy order should elide the SMJ re-sort:\n$orderedPlan")
      assert(exchanges(orderedPlan) == 0, s"still no shuffles:\n$orderedPlan")
      // same join against the RAW path (no catalog metadata) must shuffle
      // both sides — pins that the guarantee lives in the catalog read
      val rawPlan = spark.read.parquet(tmp("li_bucketed"))
        .join(spark.read.parquet(tmp("ord_bucketed")),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(exchanges(rawPlan) == 2,
        s"path read must NOT see bucket metadata:\n$rawPlan")
      // and the result is the plain join's result
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS layout_li")
      spark.sql("DROP TABLE IF EXISTS layout_ord")
      graft.HarnessUtil.releaseAll(spark)
    }
  }

  test("aggregation on the bucket key: zero exchanges") {
    Layout.writeBucketed(Tables.lineitem(spark, dir), "layout_li_agg",
      tmp("li_agg"), "l_orderkey", 8)
    try {
      val agg = Layout.table(spark, "layout_li_agg")
        .groupBy("l_orderkey")
        .agg(sum(graft.ops.Prims.dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(exchanges(plan) == 0,
        s"groupBy(bucket key) must aggregate in place:\n$plan")
      assert(agg.count() == Tables.lineitem(spark, dir)
        .select("l_orderkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS layout_li_agg")
      graft.HarnessUtil.releaseAll(spark)
    }
  }

  test("partitioned layout: a date filter prunes directories at planning time") {
    val events = Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
    Layout.writePartitioned(events, tmp("events_by_day"), Seq("event_date"))
    try {
      val read = spark.read.parquet(tmp("events_by_day"))
      val allDays = read.select("event_date").distinct().count()
      assert(allDays > 1, "fixture must span multiple days for pruning to mean anything")
      val oneDay = read.filter(col("event_date") === lit("2024-01-02").cast("date"))
      val scan = leafScan(oneDay)
      assert(scan.partitionFilters.nonEmpty,
        "the date predicate must be a partition filter, not a data filter")
      // planning-time pruning: the scan's selected partitions are 1 of N
      assert(scan.selectedPartitions.partitionCount == 1,
        s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount} of $allDays")
      // and the pruned read still returns exactly that day's rows
      assert(oneDay.count() ==
        events.filter(col("event_date") === lit("2024-01-02").cast("date")).count())
    } finally graft.HarnessUtil.releaseAll(spark)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // static pruning (previous test) needs the literal in the query;
    // DPP covers the warehouse case where the date set comes from a
    // filtered dimension — the broadcast join's build side seeds a
    // runtime IN-filter on the fact's partition column
    val events = Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
    Layout.writePartitioned(events, tmp("events_dpp"), Seq("event_date"))
    try {
      val fact = spark.read.parquet(tmp("events_dpp"))
      // the dim must come from storage: a literal dim constant-folds into
      // a STATIC partition filter and DPP never needs to fire
      events.select(col("event_date").as("d_date")).distinct()
        .withColumn("d_tag",
          when(col("d_date") === lit("2024-01-02").cast("date"), lit("target"))
            .otherwise(lit("other")))
        .write.mode("overwrite").parquet(tmp("dpp_dim"))
      val dim = spark.read.parquet(tmp("dpp_dim"))
      val joined = fact.join(broadcast(dim.filter(col("d_tag") === "target")),
        col("event_date") === col("d_date"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"partition-column join with a filtered dim must plan DPP:\n$plan")
      assert(joined.count() ==
        events.filter(col("event_date") === lit("2024-01-02").cast("date")).count())
    } finally graft.HarnessUtil.releaseAll(spark)
  }

  test("overwritePartitions replaces only the partitions present in the batch") {
    import java.nio.file.{Files, Paths}
    val events = Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
    val path = tmp("events_incr")
    Layout.writePartitioned(events, path, Seq("event_date"))
    def fileListing(day: String): Map[String, Long] = {
      val d = Paths.get(s"$path/event_date=$day")
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val day2Before = fileListing("2024-01-02")
    val day3Before = fileListing("2024-01-03")
    // recompute day 3 only: values doubled, day 2 must stay byte-level untouched
    val day3Fixed = events
      .filter(col("event_date") === lit("2024-01-03").cast("date"))
      .withColumn("value", col("value") * 2)
    Layout.overwritePartitions(day3Fixed, path, Seq("event_date"))
    try {
      assert(fileListing("2024-01-02") == day2Before,
        "untouched partition's files must not be rewritten")
      assert(fileListing("2024-01-03") != day3Before,
        "target partition must be replaced")
      val reread = spark.read.parquet(path)
      assert(reread.filter(col("event_date") === lit("2024-01-03").cast("date")).count() ==
        day3Fixed.count())
      assert(reread.count() == events.count(), "row count preserved across the swap")
      // and the conf scoping restored the session default
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        .equalsIgnoreCase("static"))
    } finally graft.HarnessUtil.releaseAll(spark)
  }

  test("compact rewrites a fragmented directory to the sized file count") {
    val frag = tmp("frag")
    val events = Tables.events(spark, dir).select("event_id", "user_id", "value")
    events.repartition(64).write.mode("overwrite").parquet(frag)
    def parquetFiles(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag).size == 64, "fixture must start fragmented")
    val staged = tmp("frag_compacted")
    val n = Layout.compact(spark, frag, staged, targetBytes = 256L * 1024)
    try {
      assert(parquetFiles(staged).size == n, s"expected $n output files")
      assert(n < 64, "compaction must reduce the file count")
      assert(spark.read.parquet(staged).count() == events.count())
      // staging, not in-place: the source survives for the caller's swap
      assert(parquetFiles(frag).size == 64)
    } finally graft.HarnessUtil.releaseAll(spark)
  }

  test("corpus layout: doc_id-bucketed documents build the shingle index and minhash signatures with zero exchanges") {
    val docs = Tables.documents(spark, dir)
    Layout.writeBucketed(docs, "layout_docs", tmp("docs_bucketed"), "doc_id", 8)
    try {
      // raw corpus: the index's per-doc distinct pays one exchange per run
      val rawIdx = graft.ops.Dedup.shingleIndexFromDocs(docs)
      assert(exchanges(rawIdx.queryExecution.executedPlan.toString) == 1,
        "raw shingle-index build is expected to shuffle exactly once")
      // bucketed corpus: HashPartitioning(doc_id) satisfies the
      // distinct's ClusteredDistribution(doc_id, hs) — the first
      // exchange is gone; write-time shuffle replaced the per-run one
      val bucketedDocs = Layout.table(spark, "layout_docs")
      val idx = graft.ops.Dedup.shingleIndexFromDocs(bucketedDocs)
      assert(exchanges(idx.queryExecution.executedPlan.toString) == 0,
        s"bucketed shingle-index build must not shuffle:\n${idx.queryExecution.executedPlan}")
      // same for the minhash signature's groupBy(doc_id)
      val sig = graft.ops.Dedup.minhashSig(bucketedDocs)
      assert(exchanges(sig.queryExecution.executedPlan.toString) == 0,
        s"bucketed minhash signature must not shuffle:\n${sig.queryExecution.executedPlan}")
      // layout changes the plan, never the result
      val s = spark; import s.implicits._
      assert(idx.as[(Long, Long)].collect().sorted.toSeq ==
        rawIdx.as[(Long, Long)].collect().sorted.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS layout_docs")
      graft.HarnessUtil.releaseAll(spark)
    }
  }

  test("serving path: layout.enabled routes Tables.documents onto the bucketed copy, exchange-free front half, identical results") {
    val s = spark
    val name = "dedup_near_minhash"
    val raw = graft.SparkEntry.queries(name)(s, dir).toJSON.collect().toSeq
    // raw serving path shuffles to build the shingle index
    assert(exchanges(graft.ops.Dedup.shingleIndexFromDocs(
      Tables.documents(s, dir)).queryExecution.executedPlan.toString) == 1)
    s.conf.set(Layout.EnabledKey, "true")
    try {
      // Tables.documents now serves the catalog bucket table...
      val docs = Tables.documents(s, dir)
      assert(exchanges(graft.ops.Dedup.shingleIndexFromDocs(docs)
          .queryExecution.executedPlan.toString) == 0,
        "the serving path must inherit the bucketed zero-exchange plan")
      assert(exchanges(graft.ops.Dedup.minhashSig(docs)
          .queryExecution.executedPlan.toString) == 0)
      // ...and a full dedup query through SparkEntry is result-identical
      val laid = graft.SparkEntry.queries(name)(s, dir).toJSON.collect().toSeq
      assert(laid == raw, s"$name diverged under the laid-out corpus")
      assert(raw.nonEmpty, "vacuous comparison")
    } finally {
      s.conf.set(Layout.EnabledKey, "false")
      graft.HarnessUtil.releaseAll(s)
    }
  }

  test("hs-keyed pair family opts OUT of the serving layout (reads raw under layout.enabled)") {
    val s = spark
    val raw = graft.SparkEntry.queries("ngram_jaccard")(s, dir).toJSON.collect().toSeq
    s.conf.set(Layout.EnabledKey, "true")
    try {
      // build the bucketed table so a mis-route WOULD find it in the catalog
      Layout.bucketedDocuments(s, dir)
      val q = graft.SparkEntry.queries("ngram_jaccard")(s, dir)
      // the pair core's exchanges are shingle-hash-keyed: a doc_id layout
      // is neutral at best and pins doc_id-clustered steps to bucket-count
      // parallelism at worst (Tables.documentsRaw scaladoc) — so the plan
      // must scan the raw parquet, not the catalog bucket table
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("SelectedBucketsCount"),
        s"ngram_jaccard must not route through the bucketed serving table:\n$plan")
      assert(q.toJSON.collect().toSeq == raw, "opt-out changed the result")
    } finally {
      s.conf.set(Layout.EnabledKey, "false")
      graft.HarnessUtil.releaseAll(s)
    }
  }

  test("co-bucketed facts: lineitem⋈orders joins and orderkey aggs plan exchange-free, results identical") {
    val s = spark
    val rawQ18 = graft.SparkEntry.queries("tpch_q18")(s, dir).toJSON.collect().toSeq
    val rawQ12 = graft.SparkEntry.queries("tpch_q12")(s, dir).toJSON.collect().toSeq
    s.conf.set(Layout.TpchEnabledKey, "true")
    try {
      val (li, ord) = Layout.bucketedFacts(s, dir)
      // the fact⋈fact equi-join: no shuffle exchange on EITHER side
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val jplan = joined.queryExecution.executedPlan.toString
      assert(exchanges(jplan) == 0,
        s"co-bucketed fact join must not shuffle:\n$jplan")
      // the serving path routes Tables.lineitem/orders onto the pair
      // (asserted by catalog table name: a BARE scan of a bucketed table
      // rightly plans "Bucketed: false — disabled by query planner" when
      // no operator needs the distribution, so bucket-scan markers only
      // appear in plans like `joined` above)
      assert(Tables.lineitem(s, dir).queryExecution.executedPlan.toString
          .contains("graft_lineitem_"),
        "Tables.lineitem must serve the bucketed copy under the tpch layout conf")
      // ...and the orderkey-clustered query family is result-identical
      assert(graft.SparkEntry.queries("tpch_q18")(s, dir).toJSON.collect().toSeq == rawQ18,
        "tpch_q18 diverged under the co-bucketed fact layout")
      assert(graft.SparkEntry.queries("tpch_q12")(s, dir).toJSON.collect().toSeq == rawQ12,
        "tpch_q12 diverged under the co-bucketed fact layout")
      assert(rawQ18.nonEmpty && rawQ12.nonEmpty, "vacuous comparison")
    } finally {
      s.conf.set(Layout.TpchEnabledKey, "false")
      graft.HarnessUtil.releaseAll(s)
    }
  }

  test("composed layout: partition pruning and bucket-key aggregation together") {
    val events = Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
    Layout.writePartitionedBucketed(events, "layout_ev", tmp("ev_composed"),
      Seq("event_date"), "user_id", 8)
    try {
      val perUser = Layout.table(spark, "layout_ev")
        .filter(col("event_date") === lit("2024-01-02").cast("date"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val plan = perUser.queryExecution.executedPlan.toString
      assert(exchanges(plan) == 0,
        s"bucketed user_id aggregation must not shuffle:\n$plan")
      val scan = leafScan(perUser)
      assert(scan.partitionFilters.nonEmpty && scan.selectedPartitions.partitionCount == 1,
        "date filter must prune to one partition directory")
      val expected = events
        .filter(col("event_date") === lit("2024-01-02").cast("date"))
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      assert(perUser.count() == expected.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS layout_ev")
      graft.HarnessUtil.releaseAll(spark)
    }
  }

  test("events layout: ts-range predicates prune day directories through Tables.events, identical results") {
    val s = spark
    val name = "events_incremental_rollup"
    val raw = graft.SparkEntry.queries(name)(s, dir).toJSON.collect().toSeq
    val rawWeeks = graft.SparkEntry.queries("events_week_compare")(s, dir)
      .toJSON.collect().toSeq
    s.conf.set(Layout.EventsEnabledKey, "true")
    try {
      val q = graft.SparkEntry.queries(name)(s, dir)
      val scan = leafScan(q)
      // PartitionDateInference must turn the ts bounds into ts_date
      // partition filters: [2024-01-08, 2024-01-15) = exactly 7 of the
      // fixture's 30 day directories listed (sharp midnight upper), the
      // rest never opened
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "ts_date")),
        s"no derived ts_date partition filter in: ${scan.partitionFilters}")
      assert(scan.selectedPartitions.partitionCount == 7,
        s"expected 7 of 30 day directories, scanned ${scan.selectedPartitions.partitionCount}")
      assert(q.toJSON.collect().toSeq == raw,
        "events layout serving path diverged from the raw read")
      assert(raw.nonEmpty, "vacuous comparison")
      // an UNfiltered time query must still see every partition (the
      // conservative-widening contract: inference never over-prunes)
      val all = leafScan(graft.SparkEntry.queries("events_rollup")(s, dir))
      assert(all.selectedPartitions.partitionCount == 30)
      // the OR-of-ranges dashboard query prunes to the UNION of both
      // weeks' exact days (7 + 7, sharp midnight uppers) and SKIPS the
      // gap week — derive(l) OR derive(r) end to end
      val weeks = graft.SparkEntry.queries("events_week_compare")(s, dir)
      val wScan = leafScan(weeks)
      assert(wScan.selectedPartitions.partitionCount == 14,
        s"expected 14 of 30 day directories for the two-week OR, scanned ${wScan.selectedPartitions.partitionCount}")
      assert(weeks.toJSON.collect().toSeq == rawWeeks && rawWeeks.nonEmpty,
        "events_week_compare diverged under the events layout")
    } finally {
      s.conf.set(Layout.EventsEnabledKey, "false")
      graft.HarnessUtil.releaseAll(s)
    }
  }

  test("composed events layout: user buckets remove the user_id exchange, date pruning still applies, identical results") {
    val s = spark
    val rawSess = graft.SparkEntry.queries("sessionize")(s, dir).toJSON.collect().toSeq
    s.conf.set(Layout.EventsEnabledKey, "true")
    s.conf.set(Layout.EventsBucketsKey, "8")
    try {
      // user-keyed aggregation over the composed table: bucket metadata
      // makes the scan HashPartitioning(user_id), so no exchange —
      // partition directories do not break bucket co-location
      val perUser = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      assert(exchanges(perUser.queryExecution.executedPlan.toString) == 0,
        "user_id aggregation must be exchange-free on the composed layout")
      // the date-inference pruning leg is unchanged by composing buckets
      val pruned = graft.SparkEntry.queries("events_incremental_rollup")(s, dir)
      assert(leafScan(pruned).selectedPartitions.partitionCount == 7,
        "composed layout must still prune day directories")
      // sessionize is the member the composed layout exists FOR (the
      // per-user session window) — identity through the serving route
      assert(graft.SparkEntry.queries("sessionize")(s, dir).toJSON.collect().toSeq == rawSess,
        "sessionize diverged under the composed events layout")
      assert(rawSess.nonEmpty, "vacuous comparison")
      // funnel/cohort opt OUT (whole-table, no ts predicate — no arm
      // they ever win, SCALEPROBE_r16 §2/§5): their scans must read the
      // raw source parquet, not the layout copy, under BOTH arms
      for (q <- Seq("funnel", "cohort_retention")) {
        val roots = leafScan(graft.SparkEntry.queries(q)(s, dir))
          .relation.location.rootPaths.map(_.toString)
        assert(roots.exists(_.contains("events.parquet")),
          s"$q must opt out of the events layout, scanned: $roots")
      }
    } finally {
      s.conf.set(Layout.EventsEnabledKey, "false")
      s.conf.set(Layout.EventsBucketsKey, "0")
      graft.HarnessUtil.releaseAll(s)
    }
  }

  test("serve cache: steady-state serving is a map lookup, not a relisting; a regenerated source invalidates") {
    val s = spark
    val src = java.nio.file.Files.createTempDirectory("layout_cache").toString
    Tables.documents(s, dir).limit(50)
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    try {
      val before = Layout.relistings.get()
      val first = Layout.bucketedDocuments(s, src)
      val n1 = first.count()
      val builds = Layout.relistings.get() - before
      assert(builds >= 1, "the first serve must fingerprint the source")
      // steady state: the full recursive listing + SHA must NOT re-run
      // per access (it used to, under the global lock, inside Bench's
      // timed layout samples — the first-touch bias the r14 verdict
      // flagged); the cheap per-access check is two dir-mtime stats
      Layout.bucketedDocuments(s, src).count()
      Layout.bucketedDocuments(s, src).count()
      assert(Layout.relistings.get() == before + builds,
        s"cache hit still relisted (${Layout.relistings.get() - before - builds} extra listings)")
      // regenerating the source flips the dir mtime + file names: the
      // cache must invalidate, re-fingerprint, and serve the NEW content
      Tables.documents(s, dir).limit(80)
        .write.mode("overwrite").parquet(s"$src/documents.parquet")
      val second = Layout.bucketedDocuments(s, src)
      assert(Layout.relistings.get() > before + builds,
        "regenerated source served the stale resolution without re-fingerprinting")
      assert(second.count() == 80 && n1 == 50,
        "regenerated source must serve the new content")
    } finally graft.HarnessUtil.releaseAll(s)
  }
}
