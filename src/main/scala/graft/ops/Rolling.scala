package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Prims._

/** Keyed rolling (non-windowed) aggregation — SURVEY.md §2.4 (A1–A5).
  *
  * Flink's KeyedStream aggregates emit one output PER INPUT with the running
  * value (reference: test/HelloWorldFlinkTest.java:78). The exact batch
  * equivalent is a window frame `rowsBetween(unboundedPreceding, currentRow)`
  * partitioned by the key — Spark executes it as a single hash exchange on
  * the key followed by an in-partition sort, which scales linearly as long
  * as single keys fit in an executor (true here: per-key cardinality is
  * bounded; for skewed keys at 100 TB one would salt the key).
  *
  * `event_id` is the arrival-order key: the testdata generator assigns ids
  * monotonically in `ts` (verified), mirroring Flink's arrival order.
  */
object Rolling {

  private def byUserArrival = Window.partitionBy("user_id").orderBy("event_id")

  /** A1+A2: keyBy → rolling sum (reference: test/HelloWorldFlinkTest.java:44-45,79).
    * Sum is accumulated in DECIMAL so the running value is exact and
    * order-independent across engines. */
  def rollingSum(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        sum(dec2(col("value")))
          .over(byUserArrival.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_sum"))
      .orderBy("user_id", "event_id")

  /** A1/A2 final-value form, flagship grouped aggregation (TPC-H Q1 shape):
    * keyBy → sum/count/avg (reference: test/HelloWorldFlinkTest.java:44-45;
    * decimal revenue test/StateTest.java:602-621). One shuffle with map-side
    * partial aggregation; sums in exact DECIMAL, surfaced as double. */
  def groupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        sumDec2(col("l_quantity")).as("sum_qty"),
        sumDec2(col("l_extendedprice")).as("sum_base"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A3: max/min family, final-value form (reference:
    * test/HelloWorldFlinkTest.java:156-175). Plain hash aggregation with
    * map-side partial min/max — one shuffle on the key. */
  def maxMin(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(max("value").as("max_value"),
           min("value").as("min_value"),
           count(lit(1)).as("n"))
      .orderBy("user_id")

  /** A4: fold — rolling aggregation with a DIFFERENT output type than the
    * input (reference: test/HelloWorldFlinkTest.java:381-418, fold at 409-415:
    * (cat, sale) → (cat, sale, runningTotal)). */
  def foldCumsum(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(byUserArrival).cast("long").as("seq"),
        sum(dec2(col("value")))
          .over(byUserArrival.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
      .orderBy("user_id", "event_id")

  /** A5: keyed reduce with null-coalescing wide-row merge — each non-null
    * field of the NEWER partial overwrites (reference: test/StateTest.java:683-698,
    * Optional.ofNullable(...).ifPresent). Batch form: per-field
    * last-non-null by arrival order via `max_by` over a conditional —
    * a single hash aggregation, no window sort needed. Nulls (user never saw
    * the event type) are surfaced as -1 so the output is null-free. */
  def lastNonNullMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def lastOf(t: String) = coalesce(
      max_by(when(col("event_type") === t, col("value")),
             when(col("event_type") === t, col("event_id"))),
      lit(-1.0)).as(s"last_$t")
    ev.groupBy("user_id")
      .agg(lastOf("click"), lastOf("view"), lastOf("purchase"),
           lastOf("signup"), lastOf("error"))
      .orderBy("user_id")
  }
}
