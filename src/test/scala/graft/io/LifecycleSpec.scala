package graft.io

import graft.SparkSpec
import graft.sinks.Sinks
import graft.sources.Synth
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The remaining lifecycle/config surface: ForeachWriter (K4),
  * checkpointing (J7), parallelism knobs (T12), accumulators (T13),
  * readTextFile (S2), and state TTL config (J6). */
class LifecycleSpec extends SparkSpec {

  test("K4/J7: ForeachWriter sink runs open/process/close under a checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val input = MemoryStream[Int]
    val q = input.toDS().toDF("v")
      .writeStream
      .foreach(new Sinks.LifecycleWriter)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      assert(q.lastProgress.sink.numOutputRows == 3)
      // checkpoint directory materialized offsets (progress source of
      // truth — the Spark analogue of Flink's enableCheckpointing)
      assert(Files.list(java.nio.file.Paths.get(ckpt, "offsets")).count() >= 1)
    } finally q.stop()
  }

  test("T12: repartition/coalesce control physical parallelism") {
    val df = Synth.batchCounter(spark, 1000)
    assert(df.repartition(8).rdd.getNumPartitions == 8)
    assert(df.repartition(8).coalesce(2).rdd.getNumPartitions == 2)
  }

  test("T13: longAccumulator counts per-row work like Flink's IntCounter") {
    val acc = spark.sparkContext.longAccumulator("rows-seen")
    Synth.batchCounter(spark, 500).foreach { _ => acc.add(1) }
    assert(acc.value == 500L)
  }

  test("S2: readTextFile equivalent — line-per-record scan") {
    val s = spark
    import s.implicits._
    val f = Files.createTempFile("graft-text", ".txt")
    Files.writeString(f, "to be or not to be\nthat is the question\n")
    val lines = s.read.textFile(f.toString)
    assert(lines.count() == 2)
    // the reference's first use: flatMap split into words (E1)
    val words = lines.flatMap(_.split(" ")).groupByKey(identity).count().collect().toMap
    assert(words("be") == 2L && words("to") == 2L && words("question") == 1L)
  }

  test("J6: state TTL — timed-out enrichment state is dropped") {
    import org.apache.spark.sql.streaming.{GroupState, TestGroupState}
    import org.apache.spark.api.java.{Optional => JOpt}
    import graft.streaming.EnrichState._
    // TTL variant of the enrichment handler: on timeout the buffered
    // state is removed (Flink StateTtlConfig OnCreateAndWrite +
    // NeverReturnExpired ≈ this mapping, J6). Driven through Spark's
    // TestGroupState harness — deterministic clock control.
    def ttlHandle(key: String, events: Iterator[In], state: GroupState[Buf]): Iterator[Out] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val out = handle(key, events, state)
        state.setTimeoutDuration(1000) // 1 s TTL
        out
      }
    }
    // batch 1: link arrives, gets buffered, TTL timer registered
    val st1 = TestGroupState.create[Buf](JOpt.empty[Buf](),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = JOpt.empty[Long](), hasTimedOut = false)
    val out1 = ttlHandle("JD1",
      Iterator(In("JD1", 1, None, Some(RouteLink("JD1", "JD1-1", 100L)))), st1).toSeq
    assert(out1.isEmpty && st1.get.links.nonEmpty)
    assert(st1.getTimeoutTimestampMs.get() == 2000L)

    // batch 2: the timer fires (no data for the key) → state removed
    val st2 = TestGroupState.create[Buf](JOpt.of(st1.get),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 3000L, eventTimeWatermarkMs = JOpt.empty[Long](), hasTimedOut = true)
    assert(ttlHandle("JD1", Iterator.empty, st2).isEmpty)
    assert(st2.isRemoved)

    // batch 3: CEM arrives post-expiry → bare CEM row, buffered link GONE
    val st3 = TestGroupState.create[Buf](JOpt.empty[Buf](),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 4000L, eventTimeWatermarkMs = JOpt.empty[Long](), hasTimedOut = false)
    val out3 = ttlHandle("JD1",
      Iterator(In("JD1", 2, Some(Cem("JD1", "s", "1", "n", "9", "m", "p", None, None)), None)), st3).toSeq
    assert(out3.length == 1 && out3.head.packageCode.isEmpty)
  }
}
