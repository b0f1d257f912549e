package graft.io

import graft.SparkSpec
import graft.sinks.Sinks
import graft.sources.{KafkaJson, Synth}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Source/sink machinery: deterministic generators (S3–S5), the Kafka
  * JSON decode stage (S6), and ES bulk batching (K3) against an
  * in-memory transport. */
class IoSpec extends SparkSpec {

  test("synth generators are deterministic and follow the reference rules") {
    val c = Synth.batchCounter(spark, 10)
    val wc1 = Synth.waybillC(c).collect()
    val wc2 = Synth.waybillC(c).collect()
    assert(wc1 sameElements wc2) // hash-derived, not rand(): reproducible
    assert(wc1.forall(_.getString(0).matches("JD\\d{10}")))
    assert(wc1.forall(r => (1 to 9).contains(r.getString(2).toInt)))
    // route-link fan-out: 5 packages per waybill (WaybillRouteLinkSource:22-35)
    val rl = Synth.waybillRouteLink(c)
    assert(rl.count() == 50)
    assert(rl.groupBy("waybillCode").count().filter("count <> 5").count() == 0)
  }

  test("kafka JSON decode: permissive from_json round-trips the producer format") {
    val s = spark
    import s.implicits._
    val schema = StructType(Seq(
      StructField("waybillCode", StringType), StructField("siteCode", StringType),
      StructField("timeStamp", LongType)))
    // producer side: key = waybillCode, value = to_json(struct(*))
    val src = Seq(("JD1", "7", 42L), ("JD2", "3", 43L))
      .toDF("waybillCode", "siteCode", "timeStamp")
    val wire = src.select(
      col("waybillCode").cast("binary").as("key"),
      to_json(struct(src.columns.map(col): _*)).cast("binary").as("value"))
    val decoded = KafkaJson.decode(wire, schema).orderBy("waybillCode")
    val rows = decoded.as[(String, String, String, Long)].collect()
    assert(rows.toSeq == Seq(("JD1", "JD1", "7", 42L), ("JD2", "JD2", "3", 43L)))
    // malformed payload → nulls, no exception (PERMISSIVE, like the
    // reference's FAIL_ON_UNKNOWN_PROPERTIES=false Jackson config)
    val bad = Seq(("k1", "not json")).toDF("k", "v")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"))
    val badRows = KafkaJson.decode(bad, schema).collect()
    assert(badRows.length == 1 && badRows.head.isNullAt(1))
  }

  test("ES bulk sink groups a batch into <=N-action bulks keyed by id") {
    val s = spark
    import s.implicits._
    val bulks = mutable.ArrayBuffer[Seq[Sinks.Upsert]]()
    val sink = new Sinks.EsBulkSink("bd_waybill", "waybillCode", 100,
      b => bulks.synchronized { bulks += b })
    val batch = (1 to 250).map(i => (s"JD$i", s"site_$i")).toDF("waybillCode", "siteName")
    sink.write(batch)
    assert(bulks.map(_.size).sorted.toSeq == Seq(50, 100, 100))
    val all = bulks.flatten
    assert(all.map(_.id).toSet.size == 250) // idempotent docAsUpsert keying
    assert(all.forall(_.index == "bd_waybill"))
    assert(all.head.docJson.contains("\"waybillCode\""))
  }
}
