package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import CountWindowState._

/** The streaming state machines and the batch window-frame formulations
  * are two implementations of the same operator — feed both the same
  * data and require identical results. */
class CrossFormSpec extends SparkSpec {

  test("countWindow(3): streaming state machine == batch row_number formulation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val data = (1 to 20).map(i => KV(s"u${i % 3}", i.toLong * 7 % 13, i.toLong))

    // streaming form across several micro-batches
    val input = MemoryStream[KV]
    val q = countWindow(input.toDS(), 3)
      .writeStream.format("memory").queryName("cf1")
      .outputMode(OutputMode.Append()).start()
    try {
      data.grouped(7).foreach { chunk => input.addData(chunk: _*); q.processAllAvailable() }
      val streaming = s.table("cf1").as[WindowOut].collect()
        .map(w => (w.key, w.windowId, w.sum)).toSet

      // batch form: the count_window_keyed arithmetic
      val batch = data.toDS()
        .withColumn("rn", row_number().over(W.partitionBy("key").orderBy("seq")))
        .groupBy(col("key"), (((col("rn") - 1) / 3).cast("long")).as("win_id"))
        .agg(sum("value").as("s"), count(lit(1)).as("n"))
        .filter(col("n") === 3)
        .select($"key", $"win_id", $"s").as[(String, Long, Long)]
        .collect().map { case (k, w, v) => (k, w, v) }.toSet

      assert(streaming == batch,
        s"forms diverged:\nstreaming=$streaming\nbatch=$batch")
    } finally q.stop()
  }

  test("per-record rolling sum: streaming state machine == batch window frame") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val data = (1 to 25).map(i => RollingState.KV(s"u${i % 4}", (i * 3 % 11).toDouble, i.toLong))

    val input = MemoryStream[RollingState.KV]
    val q = RollingState(input.toDS())
      .writeStream.format("memory").queryName("cf2")
      .outputMode(OutputMode.Append()).start()
    try {
      data.grouped(9).foreach { chunk => input.addData(chunk: _*); q.processAllAvailable() }
      val streaming = s.table("cf2").as[RollingState.RollOut].collect()
        .map(r => (r.key, r.seq, r.runningSum)).toSet

      val batch = data.toDS()
        .withColumn("runningSum", sum("value").over(
          W.partitionBy("key").orderBy("seq")
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select($"key", $"seq", $"runningSum").as[(String, Long, Double)]
        .collect().toSet

      assert(streaming == batch)
    } finally q.stop()
  }
}
