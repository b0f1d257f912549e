package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming as-of state machine fed the REAL sf0.001 events table
  * in event order across several micro-batches must reproduce the
  * shipped batch operator (`EnrichJoin.asofAttribution`) row for row —
  * the same cross-form contract CrossFormSpec pins for the rolling and
  * count-window families, here against the full fixture rather than a
  * synthetic stream. */
class AsofStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streaming state machine == batch window form on the ordered fixture") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = graft.Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"),
        graft.ops.Prims.epochUs(col("ts")).as("tsUs"), col("value"))
      .as[AsofState.Ev]
      .collect().sortBy(e => (e.tsUs, e.eventId)) // stream arrives in event order

    val input = MemoryStream[AsofState.Ev]
    val q = AsofState(input.toDS())
      .writeStream.format("memory").queryName("asof_cf")
      .outputMode(OutputMode.Append()).start()
    val streaming = try {
      evs.grouped(97).foreach { chunk => input.addData(chunk.toSeq: _*); q.processAllAvailable() }
      s.table("asof_cf").as[AsofState.Attribution].collect()
        .map(a => (a.purchaseId, a.userId, a.purchaseTsUs, a.purchaseValue,
          a.touchId, a.touchType, a.touchTsUs, a.lagUs)).toSet
    } finally q.stop()

    val batch = graft.ops.EnrichJoin.asofAttribution(s, dir)
      .collect().map { r =>
        def optLong(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          optLong(4), Option(r.getString(5)), optLong(6), optLong(7))
      }.toSet

    assert(streaming.size == batch.size && streaming == batch,
      s"forms diverged: streaming=${streaming.size} rows, batch=${batch.size} rows, " +
        s"symmetric diff=${(streaming diff batch) ++ (batch diff streaming)}")
    assert(batch.exists(_._5.isEmpty), "fixture premise: some purchase unattributed")
  }
}
