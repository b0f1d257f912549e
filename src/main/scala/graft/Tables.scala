package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md): TPC-H-ish star schema +
  * `events` stream table + `documents`/`embeddings` for the LLM-pipeline ops
  * (the latter two are fixture additions beyond TESTDATA.md's TPC-H-ish list).
  *
  * All readers are plain parquet scans so Catalyst predicate pushdown and
  * column pruning reach the file scan (check `.explain("formatted")` for
  * `PushedFilters` / narrow `ReadSchema`). At 100 TB these tables would be
  * partitioned/bucketed; the API takes a directory so the same code reads a
  * partitioned layout unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name (expected one of ${names.mkString(", ")})")
    // self-register graft's native functions so queries work under any
    // session, including harness-owned ones built without GraftExtensions
    graft.functions.GraftExtensions.ensure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects natively
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a long of nanos via the legacy conf
    * and convert to a microsecond TimestampType here, so every downstream
    * operator sees a normal timestamp column. Truncation (ns -> us) matches
    * DuckDB's `epoch_us(CAST(ts AS TIMESTAMP))` used by the oracles.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // NOTE: this flips a session-wide legacy conf and leaves it set (the
    // flag is consulted lazily at scan time, so a set/restore around the
    // read would race with execution). Side effect: other TIMESTAMP(NANOS)
    // parquet reads in the session also come back as BIGINT nanos.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
