package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming multi-touch attributor fed the sf0.001 events
  * deliberately out of order must reproduce the batch
  * multitouch_attribution exactly; designed sequences pin the
  * equal-split arithmetic and the each-conversion-looks-back-
  * independently rule. */
class MultiTouchStateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def ts(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L))

  test("pure core: equal split, strict window, repeat crediting") {
    import MultiTouchState._
    def run(evs: Seq[Ev]): Seq[Credit] = {
      val st = new graft.streaming.TestBatchGroupState[Buf]
      handle(1L, evs.iterator, st).toSeq
    }
    val M = 1000000L
    // two touches split a 10.00 purchase 5.00 each
    val r1 = run(Seq(Ev(1, 1, "view", ts(0), 0), Ev(2, 1, "click", ts(60 * M), 0),
      Ev(3, 1, "purchase", ts(120 * M), 10.0)))
    assert(r1.map(c => (c.touchId, c.credit)).sorted == Seq((1L, 5.0), (2L, 5.0)))
    assert(r1.forall(_.nTouches == 2))
    // a touch outside the horizon does not credit
    val r2 = run(Seq(Ev(1, 1, "view", ts(0), 0),
      Ev(2, 1, "purchase", ts(HorizonUs + 1), 8.0)))
    assert(r2.isEmpty)
    // two purchases both credit the same in-horizon touch
    val r3 = run(Seq(Ev(1, 1, "view", ts(0), 0),
      Ev(2, 1, "purchase", ts(10 * M), 4.0),
      Ev(3, 1, "purchase", ts(20 * M), 6.0)))
    assert(r3.map(c => (c.purchaseId, c.credit)).sorted == Seq((2L, 4.0), (3L, 6.0)))
  }

  test("out-of-order arrival within the watermark horizon == batch multitouch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = graft.Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"), col("ts"), col("value"))
      .as[MultiTouchState.Ev].collect()
    def us(e: MultiTouchState.Ev) =
      e.ts.toInstant.getEpochSecond * 1000000L + e.ts.toInstant.getNano / 1000L
    assert(evs.groupBy(_.userId).forall { case (_, es) =>
      es.map(us).distinct.length == es.length }, "unique per-user ts premise")
    val disordered = evs.sortBy(e =>
      us(e) + math.floorMod(e.eventId * 2654435761L, 1800000000L) - 900000000L)
    val maxUs = evs.map(us).max

    val input = MemoryStream[MultiTouchState.Ev]
    val q = MultiTouchState(input.toDS().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("mt_et")
      .outputMode("append").start()
    val streaming = try {
      disordered.grouped(97).foreach { chunk =>
        input.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      Seq(2L, 4L).foreach { h =>
        input.addData(MultiTouchState.Ev(-h, -1L, "view",
          ts(maxUs + h * 3600000000L), 0.0))
        q.processAllAvailable()
      }
      s.table("mt_et").as[MultiTouchState.Credit].collect()
        .map(c => (c.userId, c.purchaseId, c.touchId, c.nTouches, c.credit))
        .toSet
    } finally q.stop()

    val batch = graft.ops.EnrichJoin.multitouchAttribution(s, dir)
      .select("user_id", "purchase_id", "touch_id", "n_touches", "credit")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    assert(streaming == batch,
      s"forms diverged: streaming=${streaming.size} batch=${batch.size} " +
        s"diff=${((streaming diff batch) ++ (batch diff streaming)).take(3)}")
  }
}

/** Minimal batch-mode GroupState shared by pure-core streaming tests
  * (no watermark — the getter throws, as in a real batch run). */
class TestBatchGroupState[T] extends org.apache.spark.sql.streaming.GroupState[T] {
  private var v: Option[T] = None
  override def exists: Boolean = v.isDefined
  override def get: T = v.get
  override def getOption: Option[T] = v
  override def update(s: T): Unit = v = Some(s)
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, a: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
  override def getCurrentWatermarkMs(): Long =
    throw new UnsupportedOperationException("no watermark in batch mode")
  override def getCurrentProcessingTimeMs(): Long = 0L
}
