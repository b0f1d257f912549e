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

  test("S4 generator tail: waybillM / order / productIncome / productSale rules") {
    val s = spark
    import s.implicits._
    val c = Synth.batchCounter(spark, 20)
    // waybillM: pickup +1..9 days, delivery +1..4 days from the tick
    // (WaybillMSource.java:21-31); recover the tick from the code's counter
    val wm = Synth.waybillM(c)
      .withColumn("n", expr("CAST(substr(waybillCode, 3) AS BIGINT)"))
      .withColumn("base", timestamp_millis(col("n") * 1000))
      .select(
        col("waybillCode"),
        datediff(to_date(col("pickupDate")), to_date(col("base"))).as("pd"),
        datediff(to_date(col("deliveryDate")), to_date(col("base"))).as("dd"))
      .collect()
    assert(wm.length == 20 && wm.forall(_.getString(0).matches("JD\\d{10}")))
    assert(wm.forall(r => (1 to 9).contains(r.getInt(1)) && (1 to 4).contains(r.getInt(2))))
    // order: "Order" + lpad(n, 10, '0'), createTime = tick (OrderSource.java:14-22)
    val ord = Synth.orderSrc(c).collect()
    assert(ord.forall(_.getString(0).matches("Order\\d{10}")))
    assert(ord.forall(r => r.getTimestamp(1) != null))
    // productIncome: 类别[A-G], income ∈ [100, 2999] (ProductSource.java:19-24)
    val pi1 = Synth.productIncome(c).as[(String, Int)].collect()
    val pi2 = Synth.productIncome(c).as[(String, Int)].collect()
    assert(pi1.toSeq == pi2.toSeq) // hash-derived, reproducible
    assert(pi1.forall(_._1.matches("类别[A-G]")))
    assert(pi1.forall(p => p._2 >= 100 && p._2 <= 2999))
    // productSale: 类别[A-G], sale ∈ [0.5, 1); 5 s interval = every 5th tick
    // (ProductSaleSource.java:16-26)
    val ps = Synth.productSale(Synth.every(c, 5)).as[(String, Double)].collect()
    assert(ps.length == 4) // ticks 0, 5, 10, 15
    assert(ps.forall(_._1.matches("类别[A-G]")))
    assert(ps.forall(p => p._2 >= 0.5 && p._2 < 1.0))
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

  test("K2 producer wire format round-trips through the S6 consumer decode") {
    val s = spark
    import s.implicits._
    // producer side (K2): the reference ships key = waybillCode, value =
    // full-row JSON; consumer side (S6) decodes the same pair — composing
    // the two must be the identity on the row, broker-free
    val src = Synth.waybillC(Synth.batchCounter(s, 5))
    val wire = Sinks.kafkaPayload(src, "waybillCode")
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
    val schema = StructType(Seq(
      StructField("waybillCode", StringType), StructField("waybillSign", StringType),
      StructField("siteCode", StringType), StructField("siteName", StringType),
      StructField("timeStamp", LongType)))
    val back = KafkaJson.decode(wire, schema)
      .select(src.columns.map(col): _*).orderBy("waybillCode")
    assert(back.collect().toSeq == src.orderBy("waybillCode").collect().toSeq)
    // writer options: canonical map, checkpoint-tracked progress
    assert(Sinks.kafkaOptions("b:9092", "waybill-c", "/tmp/ck") == Map(
      "kafka.bootstrap.servers" -> "b:9092", "topic" -> "waybill-c",
      "checkpointLocation" -> "/tmp/ck"))
  }

  test("ES bulk sink default path builds executor-side per-partition bulks") {
    val s = spark
    import s.implicits._
    IoSpec.esBulks.synchronized { IoSpec.esBulks.clear() }
    // transport references the companion statically — nothing driver-only
    // is captured, exactly the contract write() documents
    val sink = new Sinks.EsBulkSink("bd_waybill", "waybillCode", 100,
      b => IoSpec.esBulks.synchronized { IoSpec.esBulks += b })
    val batch = (1 to 250).map(i => (s"JD$i", s"site_$i"))
      .toDF("waybillCode", "siteName").repartition(4)
    sink.write(batch)
    val bulks = IoSpec.esBulks.synchronized { IoSpec.esBulks.toVector }
    assert(bulks.forall(_.size <= 100)) // per-partition flush cap
    assert(bulks.size >= 4)             // at least one bulk per partition
    val all = bulks.flatten
    assert(all.map(_.id).toSet.size == 250) // idempotent docAsUpsert keying
    assert(all.forall(_.index == "bd_waybill"))
    assert(all.head.docJson.contains("\"waybillCode\""))
  }

  test("ES small-batch driver helper groups into <=N-action bulks") {
    val s = spark
    import s.implicits._
    val bulks = mutable.ArrayBuffer[Seq[Sinks.Upsert]]()
    val sink = new Sinks.EsBulkSink("bd_waybill", "waybillCode", 100,
      b => bulks.synchronized { bulks += b })
    val batch = (1 to 250).map(i => (s"JD$i", s"site_$i")).toDF("waybillCode", "siteName")
    sink.writeSmallBatchOnDriver(batch)
    assert(bulks.map(_.size).sorted.toSeq == Seq(50, 100, 100))
  }

  test("retrying transport: constant backoff, eventual success, give-up routing") {
    // flaky transport: fails 3 times, then succeeds → delivered on the
    // 4th attempt with exactly 3 constant-backoff sleeps (reference
    // policy: CONSTANT 3 s × 5, main/HelloWorldFlink.java:227-234)
    val bulk = Seq(Sinks.Upsert("idx", "1", "{}"))
    var calls = 0; val sleeps = mutable.ArrayBuffer[Long]()
    val delivered = mutable.ArrayBuffer[Seq[Sinks.Upsert]]()
    val flaky = new Sinks.RetryingTransport(
      b => { calls += 1; if (calls <= 3) sys.error(s"boom $calls") else delivered += b },
      sleeper = sleeps += _)
    flaky(bulk)
    assert(calls == 4 && delivered == Seq(bulk))
    assert(sleeps.toSeq == Seq(3000L, 3000L, 3000L))

    // always-failing transport: 1 initial + 5 retries, then the bulk and
    // the LAST error route to onGiveUp (no silent drop, no rethrow here)
    var attempts = 0; val sleeps2 = mutable.ArrayBuffer[Long]()
    val gaveUp = mutable.ArrayBuffer[(Seq[Sinks.Upsert], String)]()
    new Sinks.RetryingTransport(
      _ => { attempts += 1; sys.error(s"down $attempts") },
      onGiveUp = (b, e) => gaveUp += ((b, e.getMessage)),
      sleeper = sleeps2 += _)(bulk)
    assert(attempts == 6 && sleeps2.size == 5)
    assert(gaveUp.toSeq == Seq((bulk, "down 6")))

    // default give-up rethrows so the Spark task fails (task retry takes over)
    val ex = intercept[RuntimeException](new Sinks.RetryingTransport(
      _ => sys.error("hard down"), sleeper = _ => ())(bulk))
    assert(ex.getMessage == "hard down")
  }

  test("retrying transport: rejections retry without consuming the budget") {
    // 7 consecutive queue-full rejections (> maxRetries=5) then success:
    // the RetryRejectedExecutionFailureHandler semantics re-queue without
    // touching the retry budget, so the bulk still lands
    val bulk = Seq(Sinks.Upsert("idx", "2", "{}"))
    var calls = 0; var slept = 0
    val delivered = mutable.ArrayBuffer[Seq[Sinks.Upsert]]()
    new Sinks.RetryingTransport(
      b => { calls += 1
        if (calls <= 7) throw new Sinks.RejectedExecutionFailure("queue full")
        else delivered += b },
      sleeper = _ => slept += 1)(bulk)
    assert(calls == 8 && slept == 7 && delivered == Seq(bulk))

    // the JDK RejectedExecutionException is recognized as a rejection too,
    // and rejections + real failures keep separate accounting
    var calls2 = 0
    val gaveUp = mutable.ArrayBuffer[String]()
    new Sinks.RetryingTransport(
      _ => { calls2 += 1
        if (calls2 % 2 == 1) throw new java.util.concurrent.RejectedExecutionException("q")
        else sys.error("real failure") },
      onGiveUp = (_, e) => gaveUp += e.getMessage,
      sleeper = _ => ())(bulk)
    // alternating rejection/real: gives up after the 6th REAL failure
    assert(calls2 == 12 && gaveUp.toSeq == Seq("real failure"))
  }

  test("EsBulkSink.apply composes the retry policy into the executor path") {
    val s = spark
    import s.implicits._
    IoSpec.esBulks.synchronized { IoSpec.esBulks.clear() }
    IoSpec.flakyCount.set(0)
    // companion factory: transport rejects the first call per-JVM, then
    // delivers — write() must still land every bulk (executor-side retry)
    val sink = Sinks.EsBulkSink("bd_waybill", "waybillCode", 100,
      b => {
        if (IoSpec.flakyCount.incrementAndGet() == 1)
          throw new Sinks.RejectedExecutionFailure("queue full")
        IoSpec.esBulks.synchronized { IoSpec.esBulks += b }
      })
    val batch = (1 to 40).map(i => (s"JD$i", s"site_$i"))
      .toDF("waybillCode", "siteName").repartition(2)
    sink.write(batch)
    val all = IoSpec.esBulks.synchronized { IoSpec.esBulks.toVector }.flatten
    assert(all.map(_.id).toSet.size == 40) // nothing dropped by the rejection
  }

  test("S8 offset-control builders render the exact Spark reader options") {
    import KafkaJson.TopicPartition
    val tps = Seq(TopicPartition("hello-world", 2), TopicPartition("hello-world", 0),
      TopicPartition("waybill-c", 1))
    // assign: canonical sorted {"t":[p,...]} (KafKaTest.java:78)
    assert(KafkaJson.assignOptions("b:9092", tps) == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "assign" -> """{"hello-world":[0,2],"waybill-c":[1]}"""))
    // seek: explicit offsets, -1 = latest for that partition (KafKaTest.java:479)
    val seek = KafkaJson.seekOptions("b:9092", Map(
      TopicPartition("hello-world", 2) -> 42L, TopicPartition("hello-world", 0) -> -1L))
    assert(seek("assign") == """{"hello-world":[0,2]}""")
    assert(seek("startingOffsets") == """{"hello-world":{"0":-1,"2":42}}""")
    // seekToBeginning / seekToEnd (KafKaTest.java:653-657)
    assert(KafkaJson.seekToBeginningOptions("b:9092", tps)("startingOffsets") == "earliest")
    assert(KafkaJson.seekToEndOptions("b:9092", tps)("startingOffsets") == "latest")
    // offsetsForTimes + seek (KafKaTest.java:721-725)
    val byTime = KafkaJson.offsetsForTimesOptions("b:9092",
      Map(TopicPartition("hello-world", 2) -> 1700000000000L))
    assert(byTime("startingOffsetsByTimestamp") == """{"hello-world":{"2":1700000000000}}""")
    assert(byTime("assign") == """{"hello-world":[2]}""")
  }
}

object IoSpec {
  /** Static collector for the executor-side sink test: in local mode the
    * task closure is serialized, so a captured buffer would mutate a
    * copy — a companion field is resolved statically on the worker. */
  val esBulks: mutable.ArrayBuffer[Seq[Sinks.Upsert]] = mutable.ArrayBuffer()

  /** Per-JVM failure injector for the composed-retry test (static for the
    * same closure-serialization reason as [[esBulks]]). */
  val flakyCount = new java.util.concurrent.atomic.AtomicInteger(0)
}
