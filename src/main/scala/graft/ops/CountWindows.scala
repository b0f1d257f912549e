package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import Prims._

/** Count windows, triggers, evictors — SURVEY.md §2.5 (W1–W3), batch forms.
  * Streaming forms (flatMapGroupsWithState counters) live in graft.streaming.
  *
  * Flink count windows only fire when FULL (reference:
  * test/HelloWorldFlinkTest.java:100-103) — hence the `n === N` filters.
  */
object CountWindows {

  /** W1: countWindowAll(5) + AllWindowFunction concat (reference:
    * test/HelloWorldFlinkTest.java:52-66). A GLOBAL count window needs a
    * total order, but NOT a single-partition sort — it rides
    * [[Prims.globalRowNumber]]'s two-phase ranking over the unique
    * event_id, so no partition holds more than its range slice at any
    * scale. */
  def countWindowAll(s: SparkSession, dir: String): DataFrame =
    Prims.globalRowNumber(
        Tables.events(s, dir).select(col("event_id"), col("value")),
        "rn", col("event_id"))
      .groupBy(((col("rn") - 1) / 5).cast("long").as("win_id"))
      .agg(count(lit(1)).as("n"),
           joinedSortedLongs(collect_list(col("event_id"))).as("ids"),
           sumDec2(col("value")).as("sum_value"))
      .filter(col("n") === 5)
      .select("win_id", "ids", "sum_value")
      .orderBy("win_id")

  /** W2: keyed countWindow(3) + reduce (reference:
    * test/HelloWorldFlinkTest.java:98-104,120-123). Partitioned by key —
    * one shuffle + per-key sort, fully parallel across keys. */
  def countWindowKeyed(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(W.partitionBy("user_id").orderBy("event_id")).as("rn"))
      .groupBy(col("user_id"), ((col("rn") - 1) / 3).cast("long").as("win_id"))
      .agg(count(lit(1)).as("n"),
           joinedSortedLongs(collect_list(col("event_id"))).as("ids"),
           sumDec2(col("value")).as("sum_value"))
      .filter(col("n") === 3)
      .select("user_id", "win_id", "ids", "sum_value")
      .orderBy("user_id", "win_id")

  /** W3: GlobalWindows + CountTrigger(2) + CountEvictor(5) (reference:
    * test/WindowTest.java:79-94): fire on every 2nd element, aggregate over
    * the last ≤5 retained elements. Batch form: a bounded window frame
    * `rowsBetween(-4, 0)` sampled at every 2nd row — keyed by user for
    * scale (the reference's global form is the parallelism-1 special case). */
  def triggerEvictor(s: SparkSession, dir: String): DataFrame = {
    val byUser = W.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(byUser).cast("long").as("rn"),
        sum(dec2(col("value"))).over(byUser.rowsBetween(-4, 0))
          .cast("double").as("buf_sum"))
      .filter(pmod(col("rn"), lit(2)) === 0)
      .select("user_id", "rn", "buf_sum")
      .orderBy("user_id", "rn")
  }
}
