package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka JSON source surface — S6 + the S8 offset-control matrix
  * (reference: main/HelloWorldFlink.java:164-193 consumer + JSON→POJO;
  * test/KafKaTest.java — subscribe/assign/seek/offsetsForTimes).
  *
  * Interface-level (no broker in the build container): these builders
  * produce the exact reader configuration; the JSON decode stage is the
  * engine part and is testable on any DataFrame with (key, value) binary
  * columns — which is what the spec does.
  *
  * Offset-control mapping (S8 → Spark options):
  *   subscribe(topics)        → .option("subscribe", "t1,t2")
  *   assign(partitions)       → .option("assign", """{"t":[0,1]}""")
  *   seek(offsets)            → .option("startingOffsets", """{"t":{"0":42}}""")
  *   seekToBeginning/End      → "earliest" / "latest"
  *   offsetsForTimes          → .option("startingOffsetsByTimestamp", ...)
  *   commitSync/position      → checkpointLocation (progress lives in the
  *                              checkpoint, not the consumer group —
  *                              documented semantic delta)
  */
object KafkaJson {

  def reader(spark: SparkSession, brokers: String, topics: String,
             startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .load()

  /** The engine stage: Kafka's (key, value) binary pair → typed columns
    * via permissive from_json (reference decodes with Jackson,
    * FAIL_ON_UNKNOWN_PROPERTIES disabled → PERMISSIVE mode matches). */
  def decode(kafkaDf: DataFrame, schema: StructType): DataFrame =
    kafkaDf.select(
        col("key").cast("string").as("msg_key"),
        from_json(col("value").cast("string"), schema,
          Map("mode" -> "PERMISSIVE")).as("v"))
      .select(col("msg_key"), col("v.*"))
}
