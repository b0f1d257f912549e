package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming CEP operator fed the sf0.001 events deliberately out
  * of order (inside the watermark delay) must reproduce the batch
  * pattern_match exactly; pure-core tests pin the veto, the horizon,
  * and the first-purchase-resolves-all rule on designed sequences. */
class PatternStateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def ts(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L))

  test("pure core (batch mode): veto, horizon, and first-purchase resolution") {
    import PatternState._
    def run(evs: Seq[Ev]): Seq[Match] = {
      // batch-mode semantics: no watermark, everything ripe
      val st = new TestGroupState
      handle(1L, evs.iterator, st).toSeq
    }
    val M = 1000000L
    // view → purchase inside horizon: match
    assert(run(Seq(Ev(1, 1, "view", ts(0)), Ev(2, 1, "purchase", ts(60 * M))))
      == Seq(Match(1, 1, 0, 60 * M, 60 * M)))
    // error between: veto
    assert(run(Seq(Ev(1, 1, "view", ts(0)), Ev(2, 1, "error", ts(10 * M)),
      Ev(3, 1, "purchase", ts(60 * M)))).isEmpty)
    // purchase past horizon: no match, and the anchor is CLOSED by it
    assert(run(Seq(Ev(1, 1, "view", ts(0)),
      Ev(2, 1, "purchase", ts(HorizonUs + 1)),
      Ev(3, 1, "purchase", ts(HorizonUs + 2)))).isEmpty)
    // two anchors, one purchase resolves both (both in horizon)
    assert(run(Seq(Ev(1, 1, "view", ts(0)), Ev(2, 1, "view", ts(5 * M)),
      Ev(3, 1, "purchase", ts(60 * M)))).map(_.viewEventId).sorted == Seq(1L, 2L))
    // error after the purchase does not veto
    assert(run(Seq(Ev(1, 1, "view", ts(0)), Ev(2, 1, "purchase", ts(30 * M)),
      Ev(3, 1, "error", ts(40 * M)))).size == 1)
  }

  test("out-of-order arrival within the watermark horizon == batch pattern_match") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = graft.Tables.events(s, dir)
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"), col("ts"))
      .as[PatternState.Ev].collect()
    def us(e: PatternState.Ev) =
      e.ts.toInstant.getEpochSecond * 1000000L + e.ts.toInstant.getNano / 1000L
    // premise for exact equality: per-user event times are unique
    assert(evs.groupBy(_.userId).forall { case (_, es) =>
      es.map(us).distinct.length == es.length })
    val disordered = evs.sortBy(e =>
      us(e) + math.floorMod(e.eventId * 2654435761L, 1800000000L) - 900000000L)
    val maxUs = evs.map(us).max

    val input = MemoryStream[PatternState.Ev]
    val q = PatternState(input.toDS().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("cep_et")
      .outputMode("append").start()
    val streaming = try {
      disordered.grouped(97).foreach { chunk =>
        input.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      Seq(2L, 4L).foreach { h =>
        input.addData(PatternState.Ev(-h, -1L, "view",
          ts(maxUs + h * 3600000000L)))
        q.processAllAvailable()
      }
      s.table("cep_et").as[PatternState.Match].collect()
        .map(m => (m.userId, m.viewEventId, m.viewTsUs, m.purchaseTsUs, m.waitUs))
        .toSet
    } finally q.stop()

    val batch = graft.ops.EventAnalytics.patternMatch(s, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streaming == batch,
      s"forms diverged: streaming=${streaming.size} batch=${batch.size}")
  }

  private def ts2(us: Long): java.sql.Timestamp = ts(us)

  /** Minimal batch-mode GroupState: no watermark (getter throws, as in a
    * real batch run), supporting get/update/remove only. */
  private class TestGroupState
      extends org.apache.spark.sql.streaming.GroupState[PatternState.Buf] {
    private var v: Option[PatternState.Buf] = None
    override def exists: Boolean = v.isDefined
    override def get: PatternState.Buf = v.get
    override def getOption: Option[PatternState.Buf] = v
    override def update(s: PatternState.Buf): Unit = v = Some(s)
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
}
