package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkSpec, Tables}

/** `Tables.events` must normalize whatever physical type `events.ts` shipped
  * with (the driver's testdata generator has already switched between parquet
  * TIMESTAMP(NANOS) and timestamp[us] across rounds) to one downstream shape:
  * microsecond TimestampType with identical epoch values under the UTC
  * session timezone. TIMESTAMP(NANOS) can't be written from Spark 4, so that
  * leg is covered by reading the live testdata when it happens to be nanos;
  * here we pin the NTZ and LTZ legs with synthetic files.
  */
class TablesSchemaSpec extends SparkSpec {
  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, 1723500000000000L), (2L, 1723500001500000L))
      .toDF("id", "us")
      .select($"id", tsCol.as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events.ts: TIMESTAMP_NTZ parquet normalizes to TimestampType, same epoch micros") {
    val dir = Files.createTempDirectory("tables-ntz").toString
    writeEvents(dir, timestamp_micros(col("us")).cast(TimestampNTZType))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).orderBy("ts").collect().map(_.getLong(0)).toSeq
      == Seq(1723500000000000L, 1723500001500000L))
  }

  test("events.ts: TimestampType parquet passes through unchanged") {
    val dir = Files.createTempDirectory("tables-ltz").toString
    writeEvents(dir, timestamp_micros(col("us")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).orderBy("ts").collect().map(_.getLong(0)).toSeq
      == Seq(1723500000000000L, 1723500001500000L))
  }

  test("events.ts: live testdata reads as TimestampType regardless of generation") {
    val got = Tables.events(spark, "/root/testdata/sf0.001")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.limit(1).count() == 1)
  }
}
