package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Prims._

/** Event-analytics extensions over the `events` stream table — the
  * product-analytics queries a user of the reference (a real-time event
  * analytics engine) runs beside the funnel: cohort retention and
  * debounce. Both are compositions of audited primitives (keyed
  * aggregation, keyed window lag), all integer-exact.
  */
object EventAnalytics {

  private val DayUs = 86400000000L

  /** cohort_retention: the classic retention matrix — users cohorted by
    * FIRST-signup day, counted (distinct) on each later day they
    * purchased. `days_since` 0 means a purchase on the cohort day
    * itself; `n_cohort` rides along so a consumer derives the retention
    * rate from two exact integers instead of a pre-divided double.
    *
    * Scale shape: first-signup is a map-side-combinable min per user;
    * the activity join shuffles both sides on user_id (billions of
    * users — the natural key); the (cohort, day) matrix is
    * date-range-sized. The per-(cohort, days_since) distinct goes
    * through a plain distinct-then-count (two map-combinable
    * aggregations), never a countDistinct over a skewed window. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    // whole-table, no ts predicate: opts OUT of the date layout
    // (Tables.eventsRaw scaladoc — the documentsRaw discipline)
    val ev = Tables.eventsRaw(s, dir)
      .select(col("user_id"), col("event_type"),
        epochUs(col("ts")).as("ts_us"))
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_us").as("s_ts"))
      .select(col("user_id"), expr(s"s_ts div ${DayUs}L").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_cohort")) // user_id already unique here
    val active = cohorts
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), expr(s"ts_us div ${DayUs}L").as("p_day")),
        "user_id")
      .filter(col("p_day") >= col("cohort_day"))
      .select(col("cohort_day"), (col("p_day") - col("cohort_day")).as("days_since"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "days_since").agg(count(lit(1)).as("n_active"))
    active.join(sizes, "cohort_day")
      .select("cohort_day", "days_since", "n_active", "n_cohort")
      .orderBy("cohort_day", "days_since")
  }

  def cohortRetentionSql: String =
    s"""WITH e AS (SELECT user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
       |cohorts AS (SELECT user_id, min(ts_us) // $DayUs AS cohort_day
       |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
       |sizes AS (SELECT cohort_day, count(*) AS n_cohort
       |  FROM cohorts GROUP BY cohort_day),
       |active AS (SELECT cohort_day, p_day - cohort_day AS days_since,
       |    count(DISTINCT c.user_id) AS n_active
       |  FROM cohorts c JOIN (
       |    SELECT user_id, ts_us // $DayUs AS p_day FROM e
       |    WHERE event_type = 'purchase') p
       |  ON c.user_id = p.user_id
       |  WHERE p_day >= cohort_day
       |  GROUP BY 1, 2)
       |SELECT cohort_day, days_since, n_active, n_cohort
       |FROM active JOIN sizes USING (cohort_day)
       |ORDER BY cohort_day, days_since""".stripMargin

  /** events_rollup: the multi-level aggregate surface — event counts
    * and exact value sums by (event_type, day) with ROLLUP subtotals
    * (per-type totals and the grand total in the same result). Spark's
    * `rollup` and DuckDB's `GROUP BY ROLLUP` both emit NULL for
    * rolled-up group columns; the ORDER BY pins NULLS FIRST explicitly
    * on both engines (Spark's ascending default; DuckDB defaults NULLS
    * LAST) so the row order — and therefore the driver's hash — can
    * never depend on an engine default. Scale: rollup is one
    * aggregation with a grouping-set expand (×3 here), map-side
    * combinable; day cardinality bounds the result. */
  def eventsRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div ${DayUs}L").as("day"),
        col("value"))
      .rollup("event_type", "day")
      .agg(count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))

  def eventsRollupSql: String =
    s"""SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day,
       |  count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |GROUP BY ROLLUP (event_type, day)
       |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  /** Bounds of [[incrementalRollup]]'s time slice — one mid-fixture
    * week, the "re-run last week" incremental workload. */
  val IncrementalFrom = "2024-01-08"
  val IncrementalUntil = "2024-01-15"

  /** events_incremental_rollup: the INCREMENTAL-job form of the rollup
    * surface — per-(event_type, day) counts and exact value sums over a
    * one-week ts slice. This is the time-family query whose 100 TB
    * behavior is owned by the serving LAYOUT, not the plan: under the
    * date-partitioned events copy (`spark.graft.layout.events.enabled`,
    * `storage/Layout.partitionedEvents`) the ts-range predicate becomes
    * a partition-directory filter via
    * [[graft.plans.PartitionDateInference]], so the scan lists exactly
    * the 7 covered day directories of 30 here (the strict midnight
    * upper is sharp) — and yesterday's directory out of thousands
    * at warehouse scale — instead of reading the full table and
    * discarding 77% of it post-scan. On the raw path the same predicate
    * is an ordinary parquet pushdown (row-group min/max skipping): same
    * result, file-listing cost proportional to the whole table.
    * Aggregation itself is map-side combinable, (type, day)-bounded. */
  def incrementalRollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("ts") >= lit(IncrementalFrom).cast("timestamp") &&
        col("ts") < lit(IncrementalUntil).cast("timestamp"))
      .select(col("event_type"), expr(s"unix_micros(ts) div ${DayUs}L").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .orderBy("event_type", "day")

  def incrementalRollupSql: String =
    s"""SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day,
       |  count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$IncrementalFrom'
       |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '$IncrementalUntil'
       |GROUP BY event_type, day
       |ORDER BY event_type, day""".stripMargin

  /** Bounds of [[weekCompare]]'s two disjoint slices — the dashboard
    * "this week vs an earlier week" comparison. */
  val WeekAFrom = "2024-01-08"; val WeekAUntil = "2024-01-15"
  val WeekBFrom = "2024-01-22"; val WeekBUntil = "2024-01-29"

  /** events_week_compare: per-event_type counts and exact value sums
    * for two DISJOINT one-week ts slices, labeled and compared side by
    * side — the week-over-week dashboard query whose filter is an OR of
    * ranges. The 100 TB point is the same as [[incrementalRollup]]'s,
    * one connective deeper: under the date-partitioned events layout,
    * [[graft.plans.PartitionDateInference]] derives the UNION of both
    * branches' day bounds from the OR (derive(l) OR derive(r)), so the
    * scan lists the two week ranges' directories and SKIPS the gap week
    * entirely — the exact 14 of 30 directories here, two weeks of thousands at
    * warehouse scale. Aggregation is map-side combinable and
    * (week, type)-bounded. Reference anchor: the per-window keyed
    * aggregation reporting of `test/EventTimeTest.java:86` (tumbling
    * event-time windows), re-expressed as a batch two-window
    * comparison. */
  def weekCompare(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter((col("ts") >= lit(WeekAFrom).cast("timestamp") &&
          col("ts") < lit(WeekAUntil).cast("timestamp")) ||
        (col("ts") >= lit(WeekBFrom).cast("timestamp") &&
          col("ts") < lit(WeekBUntil).cast("timestamp")))
      .select(
        when(col("ts") < lit(WeekBFrom).cast("timestamp"), "wk1")
          .otherwise("wk2").as("week"),
        col("event_type"), col("value"))
      .groupBy("week", "event_type")
      .agg(count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .orderBy("week", "event_type")

  def weekCompareSql: String =
    s"""SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '$WeekBFrom'
       |  THEN 'wk1' ELSE 'wk2' END AS week,
       |  event_type, count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |WHERE (CAST(ts AS TIMESTAMP) >= TIMESTAMP '$WeekAFrom'
       |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '$WeekAUntil')
       |  OR (CAST(ts AS TIMESTAMP) >= TIMESTAMP '$WeekBFrom'
       |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '$WeekBUntil')
       |GROUP BY week, event_type
       |ORDER BY week, event_type""".stripMargin

  /** The calendar day [[daySlice]] reads — one mid-fixture day. */
  val DaySliceDay = "2024-01-10"

  /** events_day_slice: per-event_type daily active users + volume for
    * ONE calendar day, spelled the way dashboards actually spell it —
    * `to_date(ts) = DATE '...'` (a CAST of the timestamp compared to a
    * date, not a half-open ts range). The 100 TB point: this spelling
    * used to be un-prunable — the cast hides the timestamp from the
    * range derivations — so the most common BI predicate form scanned
    * every directory. [[graft.plans.PartitionDateInference]] now
    * derives `ts_date = DATE` from the UTC-zoned cast EXACTLY (the cast
    * IS the partition value under the UTC write contract), and the scan
    * lists 1 of 30 day directories here — yesterday's directory out of
    * thousands at warehouse scale. countDistinct is the two-phase
    * (type, user)-bounded expand; everything else map-side combines. */
  def daySlice(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(to_date(col("ts")) === lit(DaySliceDay).cast("date"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("dau"),
        count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .orderBy("event_type")

  def daySliceSql: String =
    s"""SELECT event_type, count(DISTINCT user_id) AS dau, count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '$DaySliceDay'
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** Bounds of [[boxSlice]]'s two-sided slice — a two-day window × a
    * pinned user band (ids exist at every SF; the band is a cohort
    * selector, e.g. an A/B bucket or an allowlist range). */
  val BoxFrom = "2024-01-10"; val BoxUntil = "2024-01-12"
  val BoxUserLo = 0L; val BoxUserHi = 9L

  /** events_box_slice: per-event_type actives + volume for a TIME ×
    * USER box — the drill-down every dashboard runs after the day
    * slice ("these users, this window"). The 100 TB story has two
    * independent layers, one per box side: the ts range prunes day
    * DIRECTORIES at planning time ([[graft.plans.PartitionDateInference]]
    * — 2 of 30 here, two of thousands at warehouse scale), and the
    * user band prunes WITHIN each selected day when the serving copy
    * is sealed Z-ordered on (user_id, ts)
    * ([[graft.storage.VersionedServing.sealDays]]'s `zorder`;
    * SCALEPROBE_r17 §7 measures 4-of-37-files touched for exactly this
    * box shape) — on an unclustered layout the band is still a pushed
    * parquet filter, just one with nothing to skip. Aggregation is the
    * day-slice shape: two-phase (type, user)-bounded countDistinct,
    * everything else map-side combinable. */
  def boxSlice(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("ts") >= lit(BoxFrom).cast("timestamp") &&
        col("ts") < lit(BoxUntil).cast("timestamp") &&
        col("user_id").between(BoxUserLo, BoxUserHi))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("actives"),
        count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .orderBy("event_type")

  def boxSliceSql: String =
    s"""SELECT event_type, count(DISTINCT user_id) AS actives, count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$BoxFrom'
       |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '$BoxUntil'
       |  AND user_id BETWEEN $BoxUserLo AND $BoxUserHi
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** [[userLookup]]'s subject (exists at every SF). */
  val LookupUser = 7L

  /** events_user_lookup: ONE user's complete history in time order —
    * the audit/debug/support query (and the per-subject extract every
    * privacy regime requires). The third member of the slice family:
    * day slice cuts time, box slice cuts time × a band, this cuts a
    * POINT on a non-partition key across all time. At 100 TB the plan
    * is a pushed `user_id = x` parquet filter plus a narrow ReadSchema
    * — and the serving copy gives it three independent skip layers:
    * day directories bound the user's active window when the caller
    * adds a ts range, the Z-order curve ([[graft.storage
    * .VersionedServing.sealDays]] `zorder`) clusters the user's rows
    * into few files per day, and a bloom filter on the `user_id`
    * column — `bloomOptions(Map("user_id" -> ndv))`, the COLUMN THIS
    * QUERY FILTERS; the probes/bench bloom `event_id` for the id-lookup
    * shape, and copying those options verbatim gives this query no skip
    * ([[graft.storage.Layout.bloomOptions]] blooms exactly the columns
    * named) — proves the user OUT of every row group of days they never
    * touched, the dominant case for one user over a long history
    * (SCALEPROBE_r17 prices the filter and its skip). One exchange: the
    * final time sort. */
  def userLookup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("user_id") === LookupUser)
      .select(col("event_id"), epochUs(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy("ts_us", "event_id")

  def userLookupSql: String =
    s"""SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value
       |FROM events
       |WHERE user_id = $LookupUser
       |ORDER BY ts_us, event_id""".stripMargin

  /** Debounce gap: a repeat of the same (user, event_type) within 6 h
    * of its predecessor is suppressed. */
  private val DebounceUs = 21600000000L

  /** debounce: keep each (user, event_type)'s event only when it starts
    * a new session — i.e. arrives more than [[DebounceUs]] after the
    * PREVIOUS event of that key in (ts, id) order (Flink session-window
    * semantics, gap = [[DebounceUs]]; the kept rows are exactly the
    * session heads, so suppression chains: a burst of repeats within
    * the gap keeps only its first event). One keyed window lag — a
    * single hash exchange + sort; per-(user, type) partitions are
    * human-activity-bounded, the same posture as the as-of window. */
  def debounce(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochUs(col("ts")).as("ts_us"), col("value"))
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    ev.withColumn("prev_ts", lag("ts_us", 1).over(w))
      .filter(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > DebounceUs)
      .select("event_id", "user_id", "event_type", "ts_us", "value")
      .orderBy("event_id")
  }

  def debounceSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
       |l AS (SELECT *, lag(ts_us) OVER (
       |    PARTITION BY user_id, event_type ORDER BY ts_us, event_id) AS prev_ts
       |  FROM e)
       |SELECT event_id, user_id, event_type, ts_us, value FROM l
       |WHERE prev_ts IS NULL OR ts_us - prev_ts > $DebounceUs
       |ORDER BY event_id""".stripMargin

  /** Session gap for [[sessionize]]: 8 h sits at the fixture's median
    * inter-event gap (~7.3 h per user at sf0.01), so sessions are
    * plural per user without collapsing to one-event singletons. */
  private val SessionGapUs = 28800000000L

  /** sessionize: gap-based session assignment — the batch formulation
    * of the reference's session windows (test/WindowTest.java withGap),
    * but surfacing the session ROWS (id, bounds, size, exact value sum)
    * instead of only an aggregate. Two keyed windows over one sort:
    * a lag marks session heads, a running sum of head-flags numbers the
    * sessions per user; then a (user, session) aggregate.
    *
    * Scale shape: ONE hash exchange on user_id feeds both window
    * functions (same partition+order) and the map-side partial of the
    * final aggregate — rows for a user are co-located, so the second
    * exchange moves only one pre-aggregated row per session. Per-user
    * partitions are human-activity-bounded, the skew posture of every
    * keyed window in this repo. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        epochUs(col("ts")).as("ts_us"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev.withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_s").over(w))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        max("ts_us").as("end_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        sumDec2(col("value")).as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  def sessionizeSql: String =
    s"""WITH e AS (SELECT event_id, user_id,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
       |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
       |      OR ts_us - lag(ts_us) OVER w > $SessionGapUs
       |      THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |x AS (SELECT *, CAST(sum(new_s) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |  min(ts_us) AS start_us, max(ts_us) AS end_us,
       |  max(ts_us) - min(ts_us) AS duration_us,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM x GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin

  /** user_journey: the event-type transition matrix — for each user's
    * (ts, id)-ordered timeline, count every consecutive (prev → next)
    * event-type pair corpus-wide, with each pair's share of all
    * transitions as two exact integers (n / n_total). The product-
    * analytics "where do users go next" surface, and the first-order
    * Markov estimate over the 5-type domain.
    *
    * Scale shape: one hash exchange on user_id for the lag; the
    * transition aggregate is map-side combinable onto a |types|²-sized
    * (25-row) result; the total is a global window sum over that
    * already-tiny aggregate (a deliberate single-partition move of 25
    * rows — NOT a scalar self-join, which would recompute the whole
    * pair subtree on both sides). */
  def userJourney(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochUs(col("ts")).as("ts_us"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      // single-partition WindowExec — BOUNDED BY CONSTRUCTION: the input
      // is the (prev_type, next_type) count matrix, ≤ |event_type|² rows
      // (event types are a closed enumeration, not data-volume-scaled),
      // so the "No Partition Defined" warning this emits is safe at any
      // corpus size. One of exactly two such sites (see moving_avg).
      .withColumn("n_total", sum("n").over(Window.partitionBy()))
      .select("prev_type", "next_type", "n", "n_total")
      .orderBy("prev_type", "next_type")
  }

  def userJourneySql: String =
    """WITH l AS (SELECT user_id, event_type, lag(event_type) OVER (
      |    PARTITION BY user_id
      |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_type
      |  FROM events),
      |p AS (SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |  CAST(sum(n) OVER () AS BIGINT) AS n_total
      |FROM p ORDER BY prev_type, next_type""".stripMargin

  /** events_pivot: the day × event-type count matrix as COLUMNS — the
    * `Dataset.pivot` surface. The type list is passed explicitly
    * (house rule for pivot at scale: an unlisted pivot forces an extra
    * distinct-values job AND an unbounded column explosion; a listed
    * one is a single map-combinable aggregate with |values| counters
    * per group). Missing (day, type) combos surface as 0, not null,
    * matching the oracle's CASE-sum formulation. */
  def eventsPivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, dir)
      .select(expr(s"unix_micros(ts) div ${DayUs}L").as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(pivoted) { (df, t) =>
      df.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t)
    }.orderBy("day")
  }

  def eventsPivotSql: String =
    s"""SELECT epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day,
       |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
       |FROM events GROUP BY day ORDER BY day""".stripMargin

  /** events_window_funcs: the full analytic window-function family over
    * one keyed ordered pass — lag/lead, row_number, ntile, percent_rank,
    * cume_dist, and a bounded-frame running sum, all on the SAME
    * (user_id) partition ordered by (ts, id). One hash exchange + one
    * sort serves every function (Catalyst plans a single Window
    * operator); the frame sum is decimal-exact and the rank ratios are
    * integer-derived doubles, so every column is bit-stable
    * cross-engine. Per-user partitions are human-activity-bounded —
    * the W12 posture at any corpus size. */
  def windowFuncs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val frame = w.rowsBetween(-2, 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"),
        col("value"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("next_value", lead("value", 1).over(w))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .withColumn("mov_sum", sum(dec2(col("value"))).over(frame).cast("double"))
      .select("event_id", "user_id", "ts_us", "value", "seq", "prev_value",
        "next_value", "quartile", "pct_rank", "cdist", "mov_sum")
      .orderBy("event_id")
  }

  def windowFuncsSql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
      |  CAST(row_number() OVER w AS BIGINT) AS seq,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cdist,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
      |ORDER BY event_id""".stripMargin

  /** user_overlap: distinct-user overlap for every event-type pair —
    * exact counts from a self-join of the deduped (type, user) set,
    * plus an HLL inclusion-exclusion estimate (est(A) + est(B) −
    * est(A∪B)) gated within tolerance of the exact value. The sketch
    * never crosses the oracle — only its gated boolean does (the
    * source_cardinality pattern), because HLL register layouts differ
    * between engines. Scale shape: the (type, user) dedup is one
    * map-combinable pass; the pair join runs on the DEDUPED set (≤
    * |types|·|users| rows, not event volume); all 10 union sketches
    * come from ONE 4×-expanded aggregation over the deduped set, never
    * 10 scans of the fact. At 100 TB the sketch path is the one you
    * keep (registers merge map-side; bytes per group are constant) and
    * the exact path is the audit. */
  def userOverlap(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pairs = for { a <- types; b <- types if a < b } yield (a, b)
    val rsd = 0.05
    // ONE keyed pass builds each user's type set (collect_set dedups
    // with map-side partials); every downstream number — exact overlap,
    // solo sketches, union sketches — derives from this user-sized
    // frame, never from event volume again
    val sets = Tables.events(s, dir)
      .groupBy("user_id").agg(collect_set("event_type").as("ts"))
    val pairRows = sets
      .select(col("user_id"), explode(array(pairs.map { case (a, b) =>
        when(array_contains(col("ts"), a) || array_contains(col("ts"), b),
          struct(lit(a).as("type_a"), lit(b).as("type_b"),
            (array_contains(col("ts"), a) && array_contains(col("ts"), b))
              .as("both")))
      }: _*)).as("p"))
      .filter(col("p").isNotNull)
      .select(col("user_id"), col("p.type_a"), col("p.type_b"), col("p.both"))
    val perPair = pairRows.groupBy("type_a", "type_b")
      .agg(count(when(col("both"), lit(1))).as("exact_overlap"),
        approx_count_distinct(col("user_id"), rsd).as("est_union"))
    val perType = sets
      .select(col("user_id"), explode(col("ts")).as("event_type"))
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("est_solo"))
    perPair
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("est_solo").as("est_a"))), Seq("type_a"))
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("est_solo").as("est_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("exact_overlap"),
        (abs((col("est_a") + col("est_b") - col("est_union")) - col("exact_overlap"))
          .cast("double") <= greatest(col("exact_overlap").cast("double") * 0.25,
            lit(16.0))).as("hll_ok"))
      .orderBy("type_a", "type_b")
  }

  def userOverlapSql: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  count(*) AS exact_overlap, TRUE AS hll_ok
      |FROM tu a JOIN tu b ON a.user_id = b.user_id
      |  AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** events_cube: CUBE over (event_type, day) — all four grouping sets
    * (both, each alone, grand total) in ONE aggregation pass; the
    * grouping id disambiguates a subtotal NULL from a data NULL (none
    * in this fixture, but the column is the capability). Spark plans
    * cube via Expand (4× the input rows into one combinable hash
    * aggregate) — still a single exchange, same as the rollup. */
  def eventsCube(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div ${DayUs}L").as("day"),
        col("value"))
      .cube("event_type", "day")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .orderBy(col("gid"), asc_nulls_first("event_type"), asc_nulls_first("day"))

  def eventsCubeSql: String =
    s"""SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day,
       |  CAST(GROUPING(event_type) * 2 + GROUPING(day) AS BIGINT) AS gid,
       |  count(*) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |GROUP BY CUBE (event_type, day)
       |ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  /** Match horizon for [[patternMatch]]. */
  private val PatternWithinUs = 3600L * 1000000L

  /** pattern_match: the CEP three-clause pattern — for every `view`,
    * the first `purchase` by the same user within one hour, PROVIDED no
    * `error` intervenes (Flink CEP's
    * `begin(view).notFollowedBy(error).followedBy(purchase).within(1h)`,
    * the library surface Spark has no native twin for).
    *
    * Spark-first form: not an NFA and not a self-join — ONE keyed
    * window pass. Under the per-user (ts, event_id) total order, two
    * conditional running minima over the strictly-following frame give
    * each anchor its next-purchase and next-error timestamps; the match
    * predicate is then a narrow filter (purchase within horizon, error
    * absent or later). A self-join form would re-shuffle the events per
    * clause and explode on hot users; this shape pays exactly one
    * exchange (the user keying) regardless of pattern length, and
    * every added clause is one more conditional window column. */
  def patternMatch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val following = Window.partitionBy("user_id")
      .orderBy("ts_us", "event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        epochUs(col("ts")).as("ts_us"))
      .withColumn("np",
        min(when(col("event_type") === "purchase", col("ts_us"))).over(following))
      .withColumn("ne",
        min(when(col("event_type") === "error", col("ts_us"))).over(following))
      .filter(col("event_type") === "view" && col("np").isNotNull &&
        col("np") - col("ts_us") <= PatternWithinUs &&
        (col("ne").isNull || col("ne") > col("np")))
      .select(col("user_id"), col("event_id").as("view_event_id"),
        col("ts_us").as("view_ts_us"), col("np").as("purchase_ts_us"),
        (col("np") - col("ts_us")).as("wait_us"))
      .orderBy("view_event_id")
  }

  def patternMatchSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
       |wn AS (SELECT *,
       |    min(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER
       |      (PARTITION BY user_id ORDER BY ts_us, event_id
       |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np,
       |    min(CASE WHEN event_type = 'error' THEN ts_us END) OVER
       |      (PARTITION BY user_id ORDER BY ts_us, event_id
       |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ne
       |  FROM e)
       |SELECT user_id, event_id AS view_event_id, ts_us AS view_ts_us,
       |  np AS purchase_ts_us, np - ts_us AS wait_us
       |FROM wn WHERE event_type = 'view' AND np IS NOT NULL
       |  AND np - ts_us <= $PatternWithinUs
       |  AND (ne IS NULL OR ne > np)
       |ORDER BY view_event_id""".stripMargin
}
