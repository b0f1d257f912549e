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
  /** hash-derived pseudo-random int in [lo, hi] (stand-in for Random).
    * pmod alone normalizes negatives — no abs(), which would raise
    * ARITHMETIC_OVERFLOW under ANSI mode when hash() lands exactly on
    * Int.MinValue (a certainty eventually on a long-running stream). */
  private def pseudo(c: org.apache.spark.sql.Column, lo: Int, hi: Int) =
    (pmod(hash(c), lit(hi - lo + 1)) + lo)

  /** S4: WaybillC — site events. */
  def waybillC(counter: DataFrame): DataFrame =
    counter.select(
      waybillCode(col("value")).as("waybillCode"),
      lpad(conv(abs(hash(col("value"), lit("sign")).cast("long")).cast("string"), 10, 2), 30, "0").as("waybillSign"),
      pseudo(col("value"), 1, 9).cast("string").as("siteCode"),
      concat(lit("site_"), pseudo(col("value"), 1, 9)).as("siteName"),
      col("value").as("timeStamp"))

  /** S4: WaybillE — merchant events. */
  def waybillE(counter: DataFrame): DataFrame =
    counter.select(
      waybillCode(col("value")).as("waybillCode"),
      pseudo(col("value"), 1, 99).cast("string").as("busiNo"),
      concat(lit("merchant_"), pseudo(col("value"), 1, 99)).as("busiName"),
      lpad(conv(abs(hash(col("value"), lit("pay")).cast("long")).cast("string"), 10, 2), 50, "0").as("sendPay"))

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

  /** seeded variant of [[pseudo]] so two fields of one row don't correlate. */
  private def pseudoS(c: org.apache.spark.sql.Column, seed: String, lo: Int, hi: Int) =
    (pmod(hash(c, lit(seed)), lit(hi - lo + 1)) + lo)

  /** product name = "类别" + one of A..G (reference: ProductSource.java:21,
    * ProductSaleSource.java:17 — RandomStringUtils.random(1, "ABCDEFG")). */
  private def productName(c: org.apache.spark.sql.Column, seed: String) =
    concat(lit("类别"),
      element_at(split(lit("A,B,C,D,E,F,G"), ","),
        (pseudoS(c, seed, 0, 6) + 1).cast("int")))

  /** S4: WaybillM — pickup/delivery dates relative to the counter's tick
    * timestamp (reference: WaybillMSource.java:21-31 — now + 1..9 days
    * pickup, now + 1..4 days delivery). */
  def waybillM(counter: DataFrame): DataFrame =
    counter.select(
      waybillCode(col("value")).as("waybillCode"),
      timestamp_seconds(unix_seconds(col("timestamp"))
        + pseudoS(col("value"), "pickup", 1, 9) * 86400L).as("pickupDate"),
      timestamp_seconds(unix_seconds(col("timestamp"))
        + pseudoS(col("value"), "delivery", 1, 4) * 86400L).as("deliveryDate"))

  /** S4: Order — "Order" + lpad(n) at the tick time (reference:
    * OrderSource.java:14-22). */
  def orderSrc(counter: DataFrame): DataFrame =
    counter.select(
      concat(lit("Order"), lpad(col("value").cast("string"), 10, "0")).as("orderCode"),
      col("timestamp").as("createTime"))

  /** S4: ProductIncome — category name + income in [100, 2999]
    * (reference: ProductSource.java:19-24; summary/detail stay unset at
    * the source — they're filled by downstream aggregation). */
  def productIncome(counter: DataFrame): DataFrame =
    counter.select(
      productName(col("value"), "pname_i").as("productName"),
      pseudoS(col("value"), "income", 100, 2999).cast("int").as("income"))

  /** S4: ProductSale — category name + sale rate in [0.5, 1) with 1e-4
    * resolution (reference: ProductSaleSource.java:16-26 —
    * RandomUtils.nextDouble(0.5, 1)). Reference interval is 5 s vs the
    * 1 s base tick: feed `every(counter, 5)` to model that. */
  def productSale(counter: DataFrame): DataFrame =
    counter.select(
      productName(col("value"), "pname_s").as("productName"),
      (lit(0.5) + pseudoS(col("value"), "sale", 0, 4999).cast("double") / 10000.0)
        .as("sale"))

  /** Interval thinning: a generator whose reference interval is n× the
    * base tick (e.g. ProductSaleSource's 5 s vs 1 s) keeps every n-th
    * counter value — a narrow filter, works on batch and rate streams. */
  def every(counter: DataFrame, n: Int): DataFrame =
    counter.filter(pmod(col("value"), lit(n)) === 0)

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
