package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The event-time as-of operator fed the sf0.001 events DELIBERATELY
  * OUT OF ORDER (deterministic ±15 min arrival jitter, inside the 1 h
  * watermark delay) across micro-batches must still reproduce the
  * batch operator exactly — the guarantee the in-order twin
  * ([[AsofState]], AsofStreamSpec) explicitly does not make. */
class AsofEventTimeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("out-of-order arrival within the watermark horizon == batch as-of") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = graft.Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"), col("ts"), col("value"))
      .as[AsofEventTime.Ev].collect()
    def us(e: AsofEventTime.Ev) =
      e.ts.toInstant.getEpochSecond * 1000000L + e.ts.toInstant.getNano / 1000L
    // arrival = event time + deterministic jitter in (-15 min, +15 min)
    val disordered = evs.sortBy(e =>
      us(e) + math.floorMod(e.eventId * 2654435761L, 1800000000L) - 900000000L)
    assert(disordered.map(us).zip(disordered.map(us).sorted).exists(p => p._1 != p._2),
      "fixture premise: the jitter actually disorders the stream")
    val maxUs = evs.map(us).max

    val input = MemoryStream[AsofEventTime.Ev]
    val q = AsofEventTime(input.toDS().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("asof_et")
      .outputMode("append").start()
    val streaming = try {
      disordered.grouped(97).foreach { chunk =>
        input.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      // flush: two far-future sentinels for an unused key drive the
      // watermark past every real event (watermark advances one batch
      // behind data, hence two)
      Seq(2L, 4L).foreach { h =>
        input.addData(AsofEventTime.Ev(-h, -1L, "view",
          java.sql.Timestamp.from(java.time.Instant.EPOCH
            .plusNanos((maxUs + h * 3600000000L) * 1000L)), 0.0))
        q.processAllAvailable()
      }
      s.table("asof_et").as[AsofState.Attribution].collect()
        .map(a => (a.purchaseId, a.userId, a.purchaseTsUs, a.purchaseValue,
          a.touchId, a.touchType, a.touchTsUs, a.lagUs)).toSet
    } finally q.stop()

    val batch = graft.ops.EnrichJoin.asofAttribution(s, dir)
      .collect().map { r =>
        def optLong(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          optLong(4), Option(r.getString(5)), optLong(6), optLong(7))
      }.toSet

    assert(streaming == batch,
      s"forms diverged: streaming=${streaming.size} batch=${batch.size} " +
        s"diff=${((streaming diff batch) ++ (batch diff streaming)).take(5)}")
  }
}
