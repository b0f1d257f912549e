package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic waybill generators — the Spark form of the
  * reference's AbstractSourceFunction family (S3–S5, reference:
  * main/func/source/AbstractSourceFunction.java:8-42 — init, one element
  * per interval until cancel; concrete rules per
  * main/func/source/WaybillCSource.java:22-32 etc., FIXTURES.md §2).
  *
  * Streaming: `spark.readStream.format("rate")` supplies the monotone
  * counter (`value`) and timestamp; a pure projection synthesizes the
  * entity — so the generator is a narrow, rate-limited, parallel source
  * (rate's `numPartitions` = RichParallelSourceFunction parallelism, S5).
  * Batch: the same projection over `spark.range(n)`, which is how the
  * tests pin generator output deterministically.
  *
  * "Randomness" is hash-derived from the counter (no rand()), so batch
  * and streaming emit identical entities for the same counter value —
  * Flink's per-subtask IntCounter becomes the global monotone `value`.
  */
object Synth {

  /** code = "JD" + lpad(n, 10, '0') (reference: WaybillCSource.java:26). */
  private def waybillCode(n: org.apache.spark.sql.Column) =
    concat(lit("JD"), lpad(n.cast("string"), 10, "0"))
  /** hash-derived pseudo-random int in [lo, hi] (stand-in for Random). */
  private def pseudo(c: org.apache.spark.sql.Column, lo: Int, hi: Int) =
    (pmod(abs(hash(c)), lit(hi - lo + 1)) + lo)

  /** S4: WaybillC — site events. */
  def waybillC(counter: DataFrame): DataFrame =
    counter.select(
      waybillCode(col("value")).as("waybillCode"),
      lpad(conv(abs(hash(col("value"), lit("sign"))).cast("string"), 10, 2), 30, "0").as("waybillSign"),
      pseudo(col("value"), 1, 9).cast("string").as("siteCode"),
      concat(lit("site_"), pseudo(col("value"), 1, 9)).as("siteName"),
      col("value").as("timeStamp"))

  /** S4: WaybillE — merchant events. */
  def waybillE(counter: DataFrame): DataFrame =
    counter.select(
      waybillCode(col("value")).as("waybillCode"),
      pseudo(col("value"), 1, 99).cast("string").as("busiNo"),
      concat(lit("merchant_"), pseudo(col("value"), 1, 99)).as("busiName"),
      lpad(conv(abs(hash(col("value"), lit("pay"))).cast("string"), 10, 2), 50, "0").as("sendPay"))

  /** S4: WaybillRouteLink — fan-out 5 packages per waybill
    * (reference: WaybillRouteLinkSource.java:22-35). */
  def waybillRouteLink(counter: DataFrame): DataFrame =
    counter
      .select(col("value"), explode(sequence(lit(1), lit(5))).as("i"))
      .select(
        waybillCode(col("value")).as("waybillCode"),
        concat(waybillCode(col("value")), lit("-"), col("i")).as("packageCode"),
        (col("value") * 1000 + col("i")).as("staticDeliveryTs"))

  /** S4: WaybillOrder — order↔waybill link (same n links both codes). */
  def waybillOrder(counter: DataFrame): DataFrame =
    counter.select(
      concat(lit("Order"), lpad(col("value").cast("string"), 10, "0")).as("orderId"),
      waybillCode(col("value")).as("waybillCode"))

  /** S3/S5 streaming counter: rate source, `rowsPerSecond` = 1/interval,
    * `numPartitions` = the reference's setParallelism. */
  def rateCounter(spark: SparkSession, rowsPerSecond: Int, numPartitions: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", numPartitions)
      .load()
      .select(col("value"), col("timestamp"))

  /** Batch counter for deterministic tests: value = 0..n-1. */
  def batchCounter(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("value"),
      timestamp_millis(col("id") * 1000).as("timestamp"))
}
