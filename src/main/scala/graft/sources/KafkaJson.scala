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
  * Offset control (S8) is CODE, not comments: each builder below maps one
  * reference consumer idiom to the exact Spark kafka-reader option map
  * (pure, deterministically ordered → assertable broker-free). The one
  * non-option mapping: commitSync/position → checkpointLocation (progress
  * lives in the checkpoint, not the consumer group — documented semantic
  * delta).
  */
object KafkaJson {

  def reader(spark: SparkSession, brokers: String, topics: String,
             startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .load()

  // ---- S8 offset-control builders ----------------------------------

  /** A concrete (topic, partition) — the reference's TopicPartition. */
  final case class TopicPartition(topic: String, partition: Int)

  /** {"t":[0,1]} — topics and partitions sorted so the rendering is
    * canonical and assertable. */
  private def partsJson(parts: Seq[TopicPartition]): String =
    parts.groupBy(_.topic).toSeq.sortBy(_._1).map { case (t, ps) =>
      s""""$t":[${ps.map(_.partition).distinct.sorted.mkString(",")}]"""
    }.mkString("{", ",", "}")

  /** {"t":{"0":42}} — per-partition longs (offsets or timestamps). */
  private def perPartJson(m: Map[TopicPartition, Long]): String =
    m.groupBy(_._1.topic).toSeq.sortBy(_._1).map { case (t, byTp) =>
      val inner = byTp.toSeq.map { case (tp, v) => (tp.partition, v) }
        .sortBy(_._1).map { case (p, v) => s""""$p":$v""" }.mkString(",")
      s""""$t":{$inner}"""
    }.mkString("{", ",", "}")

  /** consumer.assign(partitions) — fixed partition set, no group
    * rebalancing (reference: test/KafKaTest.java:78). */
  def assignOptions(brokers: String, parts: Seq[TopicPartition]): Map[String, String] =
    Map("kafka.bootstrap.servers" -> brokers, "assign" -> partsJson(parts))

  /** assign + seek(tp, offset) — resume each partition from an explicit
    * offset; Spark reads FROM the given offset, exactly like seek
    * (reference: test/KafKaTest.java:479). -2L/-1L mean
    * earliest/latest for that partition, per the reader's json contract. */
  def seekOptions(brokers: String, offsets: Map[TopicPartition, Long]): Map[String, String] =
    assignOptions(brokers, offsets.keys.toSeq) +
      ("startingOffsets" -> perPartJson(offsets))

  /** assign + seekToBeginning (reference: test/KafKaTest.java:653). */
  def seekToBeginningOptions(brokers: String, parts: Seq[TopicPartition]): Map[String, String] =
    assignOptions(brokers, parts) + ("startingOffsets" -> "earliest")

  /** assign + seekToEnd (reference: test/KafKaTest.java:657). */
  def seekToEndOptions(brokers: String, parts: Seq[TopicPartition]): Map[String, String] =
    assignOptions(brokers, parts) + ("startingOffsets" -> "latest")

  /** offsetsForTimes + seek — start each partition at the first record
    * whose timestamp is ≥ the given epoch-millis (reference:
    * test/KafKaTest.java:721-725); Spark resolves the timestamp→offset
    * lookup broker-side via startingOffsetsByTimestamp. */
  def offsetsForTimesOptions(brokers: String,
                             times: Map[TopicPartition, Long]): Map[String, String] =
    assignOptions(brokers, times.keys.toSeq) +
      ("startingOffsetsByTimestamp" -> perPartJson(times))

  /** Apply a builder's option map to an actual kafka readStream. */
  def readWith(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.readStream.format("kafka").options(options).load()

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
