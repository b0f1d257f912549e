package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import Prims._

/** Time & session windows — SURVEY.md §2.5 (W4–W11), batch forms on
  * `events.ts`. Streaming forms live in graft.streaming.
  *
  * All window starts/ends are emitted as epoch SECONDS (bigint) so the
  * DuckDB oracle compares integers, never engine-native timestamps.
  * `groupBy(window(...))` is a single hash exchange on the bucket — the
  * same shuffle shape as any keyed agg, so it scales like one.
  */
object Windows {

  /** W4/W6/W7: tumbling window + reduce (reference: test/WindowTest.java:112-144;
    * event-time variant test/EventTimeTest.java:86,229). */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
              col("n"), col("sum_value"))
      .orderBy("window_start")

  /** W5: sliding window — each element lands in duration/slide = 4 buckets
    * (reference: test/WindowTest.java:152-203). */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("window_start"),
              col("event_type"), col("n"))
      .orderBy("window_start", "event_type")

  /** W8: session windows with gap merge (reference: test/WindowTest.java:205-261,
    * EventTimeSessionWindows.withGap). `session_window` (Spark 3.2+) merges
    * events of a key whose gaps are < 30 min; end = last event + gap. */
  def session(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
      .select(col("user_id"),
              col("session_window.start").cast("long").as("session_start"),
              col("session_window.end").cast("long").as("session_end"),
              col("n"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** W10 (batch form): late-data split — an element is "late" if an element
    * with a timestamp more than `delay` ahead of it already arrived on the
    * same key (reference: test/EventTimeTest.java:329-428,
    * sideOutputLateData + getSideOutput). The streaming form is
    * graft.streaming.EventWindowState. */
  def lateSplit(s: SparkSession, dir: String): DataFrame = {
    val arrival = W.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(W.unboundedPreceding, -1)
    val delayUs = 30L * 60 * 1000 * 1000 // 30 min out-of-orderness bound
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        (epochUs(col("ts")) < max(epochUs(col("ts"))).over(arrival) - delayUs)
          .as("lateFlag"))
      .select(col("user_id"), col("event_id"),
        coalesce(col("lateFlag"), lit(false)).as("is_late"))
      .orderBy("user_id", "event_id")
  }
}
