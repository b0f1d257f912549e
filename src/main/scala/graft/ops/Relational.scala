package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Prims._

/** Stateless per-record transforms — SURVEY.md §2.3 (T1–T11).
  *
  * Everything here is a declarative DataFrame expression: Catalyst pushes the
  * filters and column pruning into the parquet scan, and the whole pipeline
  * stays inside one WholeStageCodegen span (no UDFs, no RDDs). At 100 TB these
  * are embarrassingly parallel map stages with zero shuffle except the final
  * aggregation where noted.
  */
object Relational {

  /** E1/T1/T3/A1/A2: word count — the reference's front-door example
    * (reference: src/test/java/com/mzq/usage/flink/HelloWorldFlinkTest.java:38-49,
    * fromElements → flatMap split → map (w,1) → keyBy → sum).
    * Spark-first form: explode(split) → groupBy → count; the only shuffle is
    * the hash exchange on `word`, with map-side partial aggregation.
    */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** T2: projection-style map (reference: test/StateTest.java:158-191,
    * WaybillC → partial WaybillCEM copy) — pure column pruning; the scan
    * reads only the three projected columns. */
  def projection(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey").as("cust_id"),
              col("c_name").as("cust_name"),
              col("c_mktsegment").as("segment"))
      .orderBy("cust_id")

  /** T4: filter (reference: test/HelloWorldFlinkTest.java:199,221 — drop
    * unwanted tokens). Predicate is pushed to the parquet scan. */
  def filterQuery(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  /** T7: string function family (reference: test/HelloWorldFlinkTest.java:42,60,195-200
    * — split/join/trim/leftPad/startsWith/format). */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        upper(trim(col("p_name"))).as("name_up"),
        format_string("%s#%04d", col("p_brand"), col("p_size")).as("tag"),
        col("p_name").like("%red%").as("has_red"))
      .orderBy("p_partkey")

  /** T8 (dates): date/part extraction and arithmetic (reference:
    * main/util/GenerateDomainUtils.java:23-52 — ZonedDateTime.plusDays etc). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"))
      .orderBy("o_orderkey")

  /** T8 (decimal/math): per-row revenue arithmetic (reference:
    * test/StateTest.java:602-621 — BigDecimal income×sale). Per-row double
    * IEEE arithmetic is deterministic, so no decimal detour is needed here. */
  def decimalArith(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
      .orderBy("l_orderkey", "l_linenumber")

  /** T9: JSON scalar decode (reference: main/HelloWorldFlink.java:154-160,183-185
    * — Jackson POJO↔JSON over the wire). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  /** T11: n-ary union of same-shaped streams (reference:
    * test/HelloWorldFlinkTest.java:192; 3-way test/StateTest.java:193,361).
    * `unionByName` is position-independent, matching Flink's typed union. */
  def unionStreams(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(lit("customer").as("src"), col("c_name").as("name"))
    val p = Tables.supplier(s, dir)
      .select(lit("supplier").as("src"), col("s_name").as("name"))
    c.unionByName(p).orderBy("src", "name")
  }

  /** T6/J8: side output — main + side split from one pass (reference:
    * test/HelloWorldFlinkTest.java:355-377, OutputTag for values <10).
    * Batch form: a route tag; streaming form: foreachBatch fan-out
    * (graft.streaming.SideOutputs). One scan, no shuffle. */
  def sideOutputSplit(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"), col("value"),
        when(col("value") < 10, "side").otherwise("main").as("route"))
      .orderBy("event_id")

  /** T10: iterate / closeWith (reference: test/HelloWorldFlinkTest.java:422-433
    * — feedback loop adding 1 until the value exceeds 5). Structured Streaming
    * has no iteration; the Spark-idiomatic batch form is a driver loop that
    * repeatedly filters the "feedback" set — each pass is a distributed map,
    * and the loop terminates on a driver-side emptiness check (an `isEmpty`
    * action, not a `collect`).
    */
  def iterateUntil(s: SparkSession, dir: String): DataFrame = {
    // iteration discipline: materialize the (shrinking) feedback set each
    // pass so the loop never re-runs accumulated lineage — the same
    // localCheckpoint pattern Dedup.dedupClusters uses
    val start = Tables.events(s, dir)
      .select(col("event_id"), pmod(col("event_id"), lit(10)).cast("int").as("x"))
      .materialized
    var done     = start.filter(col("x") > 5)
    var feedback = start.filter(col("x") <= 5).materialized
    var guard    = 0
    while (!feedback.isEmpty && guard < 12) {
      // per-round pin KEPT (r20 probed dropping it: the pin is what makes
      // each round's isEmpty/next-step scan the SHRINKING feedback set
      // instead of re-filtering the full pinned start every round — wall
      // rose 0.67 → 0.89 s at sf0.1 without it, and at corpus scale the
      // unpinned form re-scans the whole input once per iteration)
      val stepped = feedback.withColumn("x", col("x") + 1).materialized
      done = done.unionByName(stepped.filter(col("x") > 5))
      feedback = stepped.filter(col("x") <= 5)
      guard += 1
    }
    done.select(col("event_id"), col("x").as("x_final")).orderBy("event_id")
  }
}
