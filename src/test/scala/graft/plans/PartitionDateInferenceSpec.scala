package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit coverage for the partition-predicate inference rule beyond the
  * end-to-end serving-path assertions in LayoutSpec: predicate
  * spellings (literal-first, strict bounds, equality), the TimestampNTZ
  * day conversion, and the naming-convention guard. Each case checks
  * the EXECUTED plan's selected partition count — the same decision
  * FileSourceStrategy makes at listing time, so a regression here is a
  * full-table scan at 100 TB, invisible in results. */
class PartitionDateInferenceSpec extends SparkSpec {

  /** 4-day fixture (2024-02-01..04, 24 hourly rows each), written
    * date-partitioned by the `<col>_date` convention; `ntz` controls
    * the timestamp flavor so both day conversions are exercised. */
  private def fixture(ntz: Boolean): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pdi").toString
    val tsType = if (ntz) "timestamp_ntz" else "timestamp"
    (0 until 96).map(i => (i.toLong, f"2024-02-${1 + i / 24}%02dT${i % 24}%02d:30:00"))
      .toDF("id", "ts_s")
      .select(col("id"), col("ts_s").cast(tsType).as("ts"))
      .withColumn("ts_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("ts_date").parquet(dir)
    // the fixture honors the UTC contract (to_date under the UTC test
    // session = UTC days); assert its provenance like any user table
    graft.storage.Layout.markUtcDays(s, dir)
    dir
  }

  private def partitionsScanned(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    plan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("range bounds prune: ts >= L AND ts < U lists only the covered days") {
    val df = spark.read.parquet(fixture(ntz = false))
      .filter(col("ts") >= lit("2024-02-02").cast("timestamp") &&
        col("ts") < lit("2024-02-04").cast("timestamp"))
    // lower day 02; the strict upper lands on an exact midnight, so the
    // sharp bound excludes day 04 entirely -> 2 of 4
    assert(partitionsScanned(df) == 2)
    assert(df.count() == 48) // rows stay exact: 02 and 03 only
  }

  test("equality prunes to one day") {
    val df = spark.read.parquet(fixture(ntz = false))
      .filter(col("ts") === lit("2024-02-03 05:30:00").cast("timestamp"))
    assert(partitionsScanned(df) == 1)
    assert(df.count() == 1)
  }

  test("literal-first spelling derives the same bound") {
    val df = spark.read.parquet(fixture(ntz = false))
      .filter(lit("2024-02-03").cast("timestamp") <= col("ts"))
    assert(partitionsScanned(df) == 2) // days 03, 04
    assert(df.count() == 48)
  }

  test("TimestampNTZ columns convert days in UTC and prune identically") {
    val df = spark.read.parquet(fixture(ntz = true))
      .filter(col("ts") >= lit("2024-02-04").cast("timestamp_ntz"))
    assert(partitionsScanned(df) == 1)
    assert(df.count() == 24)
  }

  test("non-UTC session: the UTC-pinned day contract prunes without dropping rows") {
    // the failure this guards: session-tz day derivation on either side
    // makes a writer/reader tz mismatch prune off-by-one-day — silently
    // WRONG results. With Layout.utcDate (write) and the rule's UTC
    // conversion (read) both tz-independent, an America/Los_Angeles
    // session writes dirs and derives bounds consistently.
    val s = spark
    import s.implicits._
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    s.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val dir = java.nio.file.Files.createTempDirectory("pdi_tz").toString
      (0 until 96).map(i => (i.toLong, f"2024-02-${1 + i / 24}%02dT${i % 24}%02d:30:00"))
        .toDF("id", "ts_s")
        .select(col("id"), col("ts_s").cast("timestamp").as("ts")) // LA wall times
        .withColumn("ts_date", graft.storage.Layout.utcDate(col("ts")))
        .write.mode("overwrite").partitionBy("ts_date").parquet(dir)
      graft.storage.Layout.markUtcDays(s, dir)
      // LA evenings spill into the NEXT UTC day directory: 5 dirs total
      val bound = lit("2024-02-03").cast("timestamp") // LA midnight instant
      val pruned = spark.read.parquet(dir).filter(col("ts") >= bound)
      // ground truth via a form the rule cannot prune on (full scan)
      val boundMicros = s.sql(
        "SELECT unix_micros(TIMESTAMP '2024-02-03 00:00:00')").head.getLong(0)
      val truth = spark.read.parquet(dir)
        .filter(unix_micros(col("ts")) >= boundMicros).count()
      assert(truth == 48)
      assert(pruned.count() == truth,
        "tz-mismatched day derivation dropped qualifying rows")
      assert(partitionsScanned(pruned) == 3,
        "UTC days 03..05 of 5 — pruning must still engage under a non-UTC session")
    } finally s.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("IN-list derives ts_date IN (its days) — the pivoted-dashboard spelling") {
    val df = spark.read.parquet(fixture(ntz = false))
      .filter(col("ts").isin(
        java.sql.Timestamp.valueOf("2024-02-01 03:30:00"),
        java.sql.Timestamp.valueOf("2024-02-03 17:30:00")))
    assert(partitionsScanned(df) == 2, "IN-list must prune to exactly its days")
    assert(df.count() == 2)
  }

  test("IN-list under a non-UTC session prunes to UTC days without dropping rows") {
    val s = spark
    import s.implicits._
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    s.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val dir = java.nio.file.Files.createTempDirectory("pdi_in_tz").toString
      (0 until 96).map(i => (i.toLong, f"2024-02-${1 + i / 24}%02dT${i % 24}%02d:30:00"))
        .toDF("id", "ts_s")
        .select(col("id"), col("ts_s").cast("timestamp").as("ts")) // LA wall times
        .withColumn("ts_date", graft.storage.Layout.utcDate(col("ts")))
        .write.mode("overwrite").partitionBy("ts_date").parquet(dir)
      graft.storage.Layout.markUtcDays(s, dir)
      // 20:30 LA = 04:30 NEXT UTC day — the instant whose UTC day differs
      // from its session day, the exact off-by-one the contract pins;
      // the second literal sits on a distinct UTC day (01) so the derived
      // set is {01, 03} of the 5 directories. Literals parsed under the
      // SESSION tz, like the fixture's rows.
      val df = spark.read.parquet(dir)
        .filter(col("ts").isin(
          lit("2024-02-02 20:30:00").cast("timestamp"), // UTC day 02-03
          lit("2024-02-01 10:30:00").cast("timestamp"))) // UTC day 02-01
      assert(df.count() == 2,
        "tz-mismatched IN-day derivation dropped qualifying rows")
      assert(partitionsScanned(df) == 2, "IN-list must prune under any session tz")
    } finally s.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("long IN-list survives OptimizeIn's InSet conversion and still prunes") {
    // > spark.sql.optimizer.inSetConversionThreshold (10) literals, so the
    // optimizer rewrites In -> InSet; the rule must derive from that form
    val hours = (0 until 12).map(h => java.sql.Timestamp.valueOf(f"2024-02-02 $h%02d:30:00"))
    val df = spark.read.parquet(fixture(ntz = false))
      .filter(col("ts").isin(hours: _*))
    assert(partitionsScanned(df) == 1, "InSet form must prune to its one day")
    assert(df.count() == 12)
  }

  test("OR of disjoint ranges derives the union of day bounds — the week-vs-week spelling") {
    val df = spark.read.parquet(fixture(ntz = false))
      .filter((col("ts") >= lit("2024-02-01").cast("timestamp") &&
          col("ts") < lit("2024-02-02").cast("timestamp")) ||
        (col("ts") >= lit("2024-02-04").cast("timestamp")))
    // branch 1: day 01 exactly (the strict midnight upper sharpens away
    // day 02), branch 2: day 04 -> dirs {01, 04} of 4; the gap is skipped
    assert(partitionsScanned(df) == 2, "OR of ranges must prune to the exact union")
    assert(df.count() == 48) // days 01 and 04 only
  }

  test("OR with an underivable branch derives nothing (stays correct, full scan)") {
    val df = spark.read.parquet(fixture(ntz = false))
      .filter((col("ts") >= lit("2024-02-04").cast("timestamp")) ||
        col("id") === 5L)
    assert(partitionsScanned(df) == 4,
      "an OR whose other branch admits any day must not prune")
    assert(df.count() == 25) // day 04 (24 rows) + id 5
  }

  test("null-safe equality derives like equality") {
    val df = spark.read.parquet(fixture(ntz = false))
      .filter(col("ts") <=> lit("2024-02-02 07:30:00").cast("timestamp"))
    assert(partitionsScanned(df) == 1)
    assert(df.count() == 1)
  }

  test("provenance gate: an unmarked <col>_date table is NOT inferred on (tz-safety), unless the session trusts the convention") {
    val s = spark
    import s.implicits._
    // the lakehouse idiom the gate defends against: partition values from
    // session-tz to_date — only safe because this session is UTC, but the
    // rule cannot know that, so without the marker it must stay silent
    val dir = java.nio.file.Files.createTempDirectory("pdi_unmarked").toString
    (0 until 96).map(i => (i.toLong, f"2024-02-${1 + i / 24}%02dT${i % 24}%02d:30:00"))
      .toDF("id", "ts_s")
      .select(col("id"), col("ts_s").cast("timestamp").as("ts"))
      .withColumn("ts_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("ts_date").parquet(dir)
    def q = spark.read.parquet(dir)
      .filter(col("ts") >= lit("2024-02-03").cast("timestamp"))
    assert(partitionsScanned(q) == 4,
      "no marker, no trust conf -> the rule must not derive partition bounds")
    assert(q.count() == 48)
    // explicit session-level trust restores the convention-only behavior
    s.conf.set(PartitionDateInference.TrustConventionKey, "true")
    try {
      assert(partitionsScanned(q) == 2, "trusted convention must prune")
      assert(q.count() == 48)
    } finally s.conf.unset(PartitionDateInference.TrustConventionKey)
    // and marking the path afterwards takes effect on the next query
    // (negative checks are not cached)
    graft.storage.Layout.markUtcDays(s, dir)
    assert(partitionsScanned(q) == 2, "marking a path must enable pruning immediately")
  }

  test("cast-to-date spellings derive exactly: to_date(ts) = D prunes to one day, ranges keep strict bounds") {
    val dir = fixture(ntz = false)
    // the dashboard spelling: a CAST compared to a date, not a ts range
    val eq = spark.read.parquet(dir)
      .filter(to_date(col("ts")) === lit("2024-02-03").cast("date"))
    assert(partitionsScanned(eq) == 1, "cast equality must prune to the exact day")
    assert(eq.count() == 24)
    // strict bound carries over EXACTLY (no inclusive widening: the cast
    // IS the partition value): > day 02 lists days 03..04 only
    val gt = spark.read.parquet(dir)
      .filter(to_date(col("ts")) > lit("2024-02-02").cast("date"))
    assert(partitionsScanned(gt) == 2, "cast strict bound must stay strict")
    assert(gt.count() == 48)
    // IN over the cast
    val in = spark.read.parquet(dir)
      .filter(to_date(col("ts")).isin(
        java.sql.Date.valueOf("2024-02-01"), java.sql.Date.valueOf("2024-02-04")))
    assert(partitionsScanned(in) == 2)
    assert(in.count() == 48)
  }

  test("cast-to-date under a non-UTC session: TimestampType derives NOTHING (different day function), NTZ still derives") {
    val s = spark
    val dirTs = fixture(ntz = false)
    val dirNtz = fixture(ntz = true)
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    s.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      // an LA-zoned cast is a DIFFERENT day function than the UTC
      // directory values; Spark's own cast-unwrap lowers it to a range
      // of LA-midnight INSTANTS, and the instant-based derivations cover
      // that range conservatively (2 UTC-day directories straddle one LA
      // day) — correct rows, no exact single-day prune, by design
      val ts = spark.read.parquet(dirTs)
        .filter(to_date(col("ts")) === lit("2024-02-03").cast("date"))
      assert(partitionsScanned(ts) == 2,
        "a session-tz cast must prune only to the instants' conservative UTC-day cover")
      assert(ts.count() == 24)
      // NTZ cast is tz-free (wall-clock day == the write contract's day
      // basis): derives under ANY session zone
      val ntz = spark.read.parquet(dirNtz)
        .filter(to_date(col("ts")) === lit("2024-02-03").cast("date"))
      assert(partitionsScanned(ntz) == 1, "an NTZ cast derives under any session zone")
      assert(ntz.count() == 24)
    } finally s.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("positive marker cache revalidates: a vanished marker revokes trust after the window") {
    val s = spark
    val dir = fixture(ntz = false) // marked; first query caches the positive
    def q = spark.read.parquet(dir)
      .filter(col("ts") >= lit("2024-02-03").cast("timestamp"))
    assert(partitionsScanned(q) == 2, "marked fixture must prune")
    // a NON-contract writer deletes and recreates the table at the same
    // path (marker gone): a forever-positive cache would keep deriving
    // bounds against what may now be session-tz directories
    assert(new java.io.File(dir, graft.storage.Layout.UtcDaysMarker).delete())
    // the window is a conf per deployment (the pruning trust bound):
    // expire it through the key, not the compiled default
    s.conf.set(PartitionDateInference.MarkerRevalidateKey, "0")
    try assert(partitionsScanned(q) == 4,
      "a vanished marker must revoke trust once the revalidation window expires")
    finally s.conf.unset(PartitionDateInference.MarkerRevalidateKey)
    // re-marking restores pruning immediately (negatives are never cached)
    graft.storage.Layout.markUtcDays(s, dir)
    assert(partitionsScanned(q) == 2)
  }

  test("no inference without the <col>_date naming pair") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pdi_neg").toString
    (0 until 48).map(i => (i.toLong, f"2024-02-${1 + i / 24}%02dT${i % 24}%02d:30:00"))
      .toDF("id", "ts_s")
      .select(col("id"), col("ts_s").cast("timestamp").as("ts"))
      .withColumn("other_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("other_date").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("ts") >= lit("2024-02-02").cast("timestamp"))
    // convention not met -> rule must stay silent; every partition listed
    assert(partitionsScanned(df) == 2)
    assert(df.count() == 24)
  }
}
