package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Prims._

/** Joins and stateful-enrichment oracles — SURVEY.md §2.6 (J1–J4) and the
  * E3 enrichment DAG (reference: test/StateTest.java:638-873). The streaming
  * state machines live in graft.streaming; these are their exact batch
  * formulations (outer joins + coalesce), which are what the driver's DuckDB
  * oracle can check.
  */
object EnrichJoin {

  /** J1: window inner join — per-window equi-join (reference:
    * test/WindowTest.java:410-425 C⋈E; two-stage :577-622). Both sides are
    * bucketed to the same tumbling window, then equi-joined on
    * (key, bucket): Catalyst plans a shuffled hash/sort-merge join
    * partitioned by the join key — the scalable shape; neither side here is
    * a small dim, so no broadcast is forced. */
  def windowJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("window_start", (epochUs(col("ts")) / lit(3600000000L)).cast("long") * 3600)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("window_start"), col("event_id").as("view_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("window_start"), col("event_id").as("click_id"))
    views.join(clicks, Seq("user_id", "window_start"), "inner")
      .select("user_id", "window_start", "view_id", "click_id")
      .orderBy("user_id", "window_start", "view_id", "click_id")
  }

  /** J2: connect + CoProcessFunction with shared ValueState — merge two
    * typed streams field-wise per key (reference:
    * test/HelloWorldFlinkTest.java:239-352). Batch oracle: per-key latest
    * value of each stream + counts, null-coalesced into one wide row. */
  def coProcessMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def lastOf(t: String) = coalesce(
      max_by(when(col("event_type") === t, col("value")),
             when(col("event_type") === t, col("event_id"))),
      lit(-1.0)).as(s"last_$t")
    def cntOf(t: String) =
      count(when(col("event_type") === t, lit(1))).as(s"n_$t")
    ev.filter(col("event_type").isin("click", "view"))
      .groupBy("user_id")
      .agg(lastOf("click"), cntOf("click"), lastOf("view"), cntOf("view"))
      .orderBy("user_id")
  }

  /** J4: the keyed state kinds — Value/List/Map/Reducing/Aggregating
    * (reference: test/StateTest.java:53-527) — as one batch row per key:
    *   value_state      = last value by arrival order      (ValueState)
    *   list_state       = ids of 'error' events, sorted    (ListState)
    *   map_state        = per-type counts "type:n" sorted  (MapState)
    *   reducing_state   = exact running sum, final value   (ReducingState)
    *   aggregating_state= mean via (sum, count) accumulator (AggregatingState)
    * Three partial aggregates co-partitioned on user_id, then joined —
    * AQE collapses these into local joins since partitioning matches. */
  def stateKinds(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val base = ev.groupBy("user_id").agg(
      max_by(col("value"), col("event_id")).as("value_state"),
      coalesce(joinedSortedLongs(
        collect_list(when(col("event_type") === "error", col("event_id")))),
        lit("")).as("list_state"),
      sumDec2(col("value")).as("reducing_state"),
      (sum(dec2(col("value"))).cast("double") / count(lit(1))).as("aggregating_state"))
    val mapState = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_list(
        concat(col("event_type"), lit(":"), col("cnt")))), ",").as("map_state"))
    base.join(mapState, Seq("user_id"), "inner")
      .select("user_id", "value_state", "list_state", "map_state",
              "reducing_state", "aggregating_state")
      .orderBy("user_id")
  }

  /** Ordered funnel: per user, did signup → view → click → purchase
    * happen in timestamp order? One aggregation pass (min event time per
    * stage via conditional min), then pure epoch comparisons — the
    * sessionization-adjacent analytic the reference's keyed-state demos
    * build towards. funnel_depth = number of stages completed in order. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    // whole-table, no ts predicate: opts OUT of the date layout
    // (Tables.eventsRaw scaladoc — the documentsRaw discipline)
    val ev = Tables.eventsRaw(s, dir)
    def firstOf(t: String) =
      min(when(col("event_type") === t, epochUs(col("ts")))).as(s"t_$t")
    ev.groupBy("user_id")
      .agg(firstOf("signup"), firstOf("view"), firstOf("click"), firstOf("purchase"))
      .select(col("user_id"),
        (col("t_signup").isNotNull).as("s1"),
        (col("t_signup").isNotNull && col("t_view").isNotNull &&
          col("t_signup") <= col("t_view")).as("s2"),
        (col("t_signup").isNotNull && col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_signup") <= col("t_view") && col("t_view") <= col("t_click")).as("s3"),
        (col("t_signup").isNotNull && col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_purchase").isNotNull && col("t_signup") <= col("t_view") &&
          col("t_view") <= col("t_click") && col("t_click") <= col("t_purchase")).as("s4"))
      .select(col("user_id"),
        (col("s1").cast("long") + col("s2").cast("long") +
          col("s3").cast("long") + col("s4").cast("long")).as("funnel_depth"))
      .orderBy("user_id")
  }

  def funnelSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_signup,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT user_id,
      |  CAST(t_signup IS NOT NULL AS BIGINT) +
      |  CAST(coalesce(t_signup <= t_view, FALSE) AS BIGINT) +
      |  CAST(coalesce(t_signup <= t_view AND t_view <= t_click, FALSE) AS BIGINT) +
      |  CAST(coalesce(t_signup <= t_view AND t_view <= t_click AND t_click <= t_purchase, FALSE) AS BIGINT)
      |  AS funnel_depth
      |FROM f ORDER BY user_id""".stripMargin

  /** As-of join (extension): last-touch ATTRIBUTION — each 'purchase'
    * event joined to the most recent PRECEDING 'view'/'click' ("touch")
    * of the same user. The as-of join is the classic operator neither
    * engine surfaces natively (the reference's join API is equi-only —
    * SURVEY §4; Spark has no asof relation either), and the one the
    * 100 TB brief names explicitly.
    *
    * "Preceding" is the (ts_us, event_id) TOTAL order: a touch at the
    * same microsecond as the purchase counts when its id is smaller.
    * Ids are unique, so the order is total and tie-handling is
    * bit-identical on both engines — the reason the oracle mirrors this
    * window form rather than DuckDB's native ASOF JOIN, whose
    * same-timestamp tie choice is unspecified.
    *
    * Spark-first shape: NOT a join at all. Union is already present in
    * the one events scan; tag touches, then
    * `last(touch-attr, ignoreNulls) OVER (PARTITION BY user ORDER BY
    * ts, id ROWS UNBOUNDED PRECEDING .. 1 PRECEDING)` carries the
    * latest touch forward and the purchase filter keeps the joined
    * rows. ONE hash exchange on user_id + one within-partition sort —
    * the same cost as the keyed-state pass a Flink CoProcess
    * attribution pays, and strictly less than a literal as-of join
    * plan (range sort-merge + per-row backward scan). At 100 TB users
    * number in the billions (parallelism is free) and one user's event
    * history is human-bounded, so no partition funnels a corpus share
    * into one task; all three touch attributes ride ONE window node
    * (one sort, three running values). */
  def asofAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochUs(col("ts")).as("ts_us"), col("value"))
    val isTouch = col("event_type") =!= "purchase"
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("touch_id", last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("touch_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_ts_us", last(when(isTouch, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("purchase_ts_us"), col("value").as("purchase_value"),
        col("touch_id"), col("touch_type"), col("touch_ts_us"),
        (col("ts_us") - col("touch_ts_us")).as("lag_us"))
      .orderBy("purchase_id")
  }

  /** Interval-join horizon: purchases within ONE HOUR after a click. */
  private val IntervalUs = 3600000000L

  /** Interval join (extension): every (click, purchase) pair of the
    * same user with `click.ts <= purchase.ts <= click.ts + 1h` — the
    * DataStream `intervalJoin` semantics Flink offers but the
    * reference never exercises (SURVEY §4: equi-only), and the "range
    * join" of the 100 TB brief. A literal range-predicate join is a
    * cartesian per user; the scalable shape BUCKETS time by the
    * interval length and equi-joins on (user, bucket): a click in
    * bucket b can only pair with purchases in [b, b+1], so the
    * purchase side probes its own bucket and the one below via a
    * 2-element explode, the join is pure equi (Catalyst shuffles on
    * the compound key, never a theta-join), and the exact range filter
    * prunes the candidates. Each pair matches in EXACTLY one probe
    * (the click's own bucket), so no dedup pass is needed. The
    * interval length = the bucket width is the skew knob: candidates
    * per task are bounded by per-user-per-hour activity, not corpus
    * volume. */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochUs(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("click_ts_us"),
        expr(s"ts_us div ${IntervalUs}L").as("b"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us"),
        explode(expr(s"array(ts_us div ${IntervalUs}L, ts_us div ${IntervalUs}L - 1)")).as("b"))
    clicks.join(purchases, Seq("user_id", "b"))
      .filter(col("purchase_ts_us") >= col("click_ts_us") &&
        col("purchase_ts_us") <= col("click_ts_us") + IntervalUs)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_ts_us") - col("click_ts_us")).as("gap_us"))
      .orderBy("click_id", "purchase_id")
  }

  def intervalJoinSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
       |SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       |  p.ts_us - c.ts_us AS gap_us
       |FROM e c JOIN e p
       |  ON c.user_id = p.user_id
       | AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + $IntervalUs
       |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
       |ORDER BY click_id, purchase_id""".stripMargin

  /** multitouch_attribution: LINEAR (equal-credit) attribution — each
    * purchase looks back one [[IntervalUs]] horizon and splits its value
    * equally across every view/click touch inside it, the multi-touch
    * complement of [[asofAttribution]]'s last-touch rule. Built from
    * audited shapes end to end: the (touch, purchase) candidate pairs
    * come from the SAME interval-length bucketing as [[intervalJoin]]
    * (pure equi-join, 2-probe explode, range residual — never a
    * per-user cartesian), and the per-purchase touch count is one
    * purchase-keyed window so the credit division is a narrow
    * projection. Credit = dec2(value)/n — identical operand shapes on
    * both engines, so the doubles match bit-for-bit. */
  def multitouchAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochUs(col("ts")).as("ts_us"), col("value"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("ts_us").as("touch_ts_us"),
        expr(s"ts_us div ${IntervalUs}L").as("b"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us"), dec2(col("value")).as("pv"),
        explode(expr(s"array(ts_us div ${IntervalUs}L, ts_us div ${IntervalUs}L - 1)")).as("b"))
    touches.join(purchases, Seq("user_id", "b"))
      .filter(col("touch_ts_us") < col("purchase_ts_us") &&
        col("touch_ts_us") >= col("purchase_ts_us") - IntervalUs)
      .withColumn("n_touches", count(lit(1)).over(
        Window.partitionBy("purchase_id")).cast("long"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts_us"),
        col("touch_id"), col("touch_type"), col("touch_ts_us"),
        col("n_touches"),
        (col("pv").cast("double") / col("n_touches")).as("credit"))
      .orderBy("purchase_id", "touch_id")
  }

  def multitouchAttributionSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
       |prs AS (SELECT t.user_id, p.event_id AS purchase_id,
       |    p.ts_us AS purchase_ts_us, t.event_id AS touch_id,
       |    t.event_type AS touch_type, t.ts_us AS touch_ts_us,
       |    CAST(p.value AS DECIMAL(18,2)) AS pv
       |  FROM e t JOIN e p
       |    ON t.user_id = p.user_id
       |   AND t.ts_us < p.ts_us AND t.ts_us >= p.ts_us - $IntervalUs
       |  WHERE t.event_type IN ('view', 'click') AND p.event_type = 'purchase'),
       |n AS (SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n_touches
       |  FROM prs)
       |SELECT user_id, purchase_id, purchase_ts_us, touch_id, touch_type,
       |  touch_ts_us, CAST(n_touches AS BIGINT) AS n_touches,
       |  CAST(pv AS DOUBLE) / n_touches AS credit
       |FROM n ORDER BY purchase_id, touch_id""".stripMargin

  def asofAttributionSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |w AS (SELECT *,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
      |      OVER win AS touch_id,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER win AS touch_type,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END IGNORE NULLS)
      |      OVER win AS touch_ts_us
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us,
      |  value AS purchase_value, touch_id, touch_type, touch_ts_us,
      |  ts_us - touch_ts_us AS lag_us
      |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin

  /** Date literal splitting the order/ship timeline for [[tpchQ3]]
    * (orders span 1995-2001 in the fixture; mid-range keeps both filter
    * sides selective). */
  private val Q3Cut = "1998-06-01"

  /** tpch_q3 (extension): the TPC-H Q3 "shipping priority" shape — top
    * 10 not-yet-shipped orders by revenue for one market segment. The
    * classic Catalyst showcase on the star schema: both filters push to
    * the parquet scans (`PushedFilters` on o_orderdate / l_shipdate /
    * c_mktsegment), the segment-thinned customer side broadcasts under
    * AQE, orders⋈lineitem shuffles on the orderkey (both huge at
    * 100 TB — the natural key), and the top-10 runs as
    * TakeOrderedAndProject (per-partition heaps + driver merge of 10
    * rows, never a global sort). Revenue aggregates in DECIMAL and
    * surfaces as double (house determinism rule); ties break on
    * l_orderkey so LIMIT is deterministic cross-engine. */
  def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit(Q3Cut).cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("o_custkey"),
        epochUs(col("o_orderdate").cast("timestamp")).as("o_date_us"),
        col("o_orderpriority"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit(Q3Cut).cast("timestamp_ntz"))
      .select(col("l_orderkey"),
        (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("rev"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_date_us", "o_orderpriority")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_date_us", "o_orderpriority")
  }

  def tpchQ3Sql: String =
    s"""SELECT l_orderkey,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_date_us, o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '$Q3Cut'
       |  AND l_shipdate > TIMESTAMP '$Q3Cut'
       |GROUP BY 1, 3, 4
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** tpch_q5 (extension): the TPC-H Q5 "local supplier volume" shape —
    * revenue per nation of one region, counted only where customer and
    * supplier share the nation. The dim chain (region → nation →
    * supplier) is explicitly broadcast — metadata-sized at any corpus
    * scale — so the only shuffles are the fact-side
    * lineitem⋈orders⋈customer equi-joins on their natural keys; the
    * same-nation constraint rides the broadcast supplier join as a
    * second equi-condition, never a post-join filter over a wider
    * cross. */
  def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("rev"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def tpchQ5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1998-01-01'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** E3/J2/J3 flagship: the six-source progressive enrichment into one wide
    * row (reference: test/StateTest.java:638-873 → BdWaybillOrder), mapped
    * onto the star schema: orders progressively widened with customer,
    * nation, region and a per-order lineitem rollup; every missing side is
    * null-coalesced exactly like the reference's Optional.ifPresent merge.
    *
    * Scale shape: nation/region are tiny dims → explicit broadcast;
    * customer⋈orders shuffles on the key (both huge at 100 TB); the
    * lineitem rollup partial-aggregates BEFORE its join so the big table is
    * reduced map-side first. */
  def enrichWideRow(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val liAgg = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
           sumDec2(col("l_quantity")).as("sum_qty"),
           sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
             .cast("double").as("revenue"))
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .join(liAgg, o("o_orderkey") === liAgg("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_orderstatus"),
        coalesce(col("c_name"), lit("UNKNOWN")).as("cust_name"),
        coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"),
        coalesce(col("r_name"), lit("UNKNOWN")).as("region_name"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("sum_qty"), lit(0.0)).as("sum_qty"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("o_orderkey")
  }
}
