package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Exercise ALL THREE `Tables.events` loader branches on synthetic
  * parquet, not just whichever physical type the driver's current
  * testdata generation happens to use (TestDataContractSpec pins that
  * one). The round-10 breakage was exactly a branch nobody could run:
  * the on-disk type flipped and the single hardcoded path killed 18
  * queries. Every branch must normalize to TimestampType with the SAME
  * epoch micros. */
class EventsLoaderBranchSpec extends SparkSpec {

  /** One reference row: 2024-03-01 12:34:56.789012 UTC. */
  private val RefUs = 1709296496789012L

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
                          extraConf: (String, String)*): Unit = {
    val s = spark
    extraConf.foreach { case (k, v) => s.conf.set(k, v) }
    try s.range(1).select(
        col("id").as("event_id"), tsCol.as("ts"), lit(7L).as("user_id"),
        lit("click").as("event_type"), lit(1.5).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally extraConf.foreach { case (k, _) => s.conf.unset(k) }
  }

  private def loadedMicros(dir: String): (org.apache.spark.sql.types.DataType, Long) = {
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType, df.select(unix_micros(col("ts"))).head().getLong(0))
  }

  test("TimestampType on disk: passed through, micros exact") {
    val dir = "/tmp/graft_events_tz"
    writeEvents(dir, timestamp_micros(lit(RefUs)))
    val (dt, us) = loadedMicros(dir)
    assert(dt == TimestampType && us == RefUs, s"got $dt / $us")
  }

  test("TIMESTAMP_NTZ on disk: cast to TimestampType, micros exact under UTC") {
    val dir = "/tmp/graft_events_ntz"
    writeEvents(dir, timestamp_micros(lit(RefUs)).cast(TimestampNTZType))
    // premise guard: the file really is NTZ (a silent tz write would
    // make this test a duplicate of the one above)
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType)
    val (dt, us) = loadedMicros(dir)
    assert(dt == TimestampType && us == RefUs, s"got $dt / $us")
  }

  test("legacy BIGINT-nanos on disk (nanosAsLong sessions): ns div 1000, micros exact") {
    // The TIMESTAMP(NANOS) physical type itself cannot be written from
    // Spark; what the legacy branch actually SEES (with nanosAsLong set
    // by the loader after the probe read fails, or pre-set by a legacy
    // session) is a LongType ts column carrying nanoseconds — write
    // that directly and assert the div-1000 normalization.
    val dir = "/tmp/graft_events_ns"
    writeEvents(dir, lit(RefUs * 1000L + 999L)) // sub-us noise truncates
    val (dt, us) = loadedMicros(dir)
    assert(dt == TimestampType && us == RefUs, s"got $dt / $us")
  }
}
