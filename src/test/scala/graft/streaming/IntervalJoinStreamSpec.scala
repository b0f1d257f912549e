package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming interval join fed the REAL sf0.001 events in time
  * order across micro-batches must reproduce the batch bucketed form
  * (`EnrichJoin.intervalJoin`) pair for pair — same cross-form contract
  * as AsofStreamSpec, for the two-sided-buffer join. */
class IntervalJoinStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streaming interval join == batch bucketed form on the ordered fixture") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val evs = graft.Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        graft.ops.Prims.epochUs(col("ts")).as("ts_us"))
      .as[(Long, Long, String, Long)]
      .collect().sortBy(e => (e._4, e._1))

    val clicks = MemoryStream[(Long, Long, Long)]    // (event_id, user_id, ts_us)
    val purchases = MemoryStream[(Long, Long, Long)]
    def shape(ms: MemoryStream[(Long, Long, Long)],
              id: String, key: String, ts: String) =
      ms.toDS().select(col("_1").as(id), col("_2").as(key),
        timestamp_micros(col("_3")).as(ts))
    val joined = StreamJoins.intervalJoin(
        shape(clicks, "click_id", "c_user", "c_ts"), "c_user", "c_ts",
        shape(purchases, "purchase_id", "p_user", "p_ts"), "p_user", "p_ts",
        lowerUs = 0L, upperUs = 3600000000L, delay = "10 minutes")
      .select(col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    val q = joined.writeStream.format("memory").queryName("ivj_cf")
      .outputMode("append").start()
    val streaming = try {
      evs.grouped(97).foreach { chunk =>
        val (c, p) = chunk.partition(_._3 == "click")
        if (c.nonEmpty) clicks.addData(c.map(e => (e._1, e._2, e._4)).toSeq: _*)
        if (p.nonEmpty) purchases.addData(p.map(e => (e._1, e._2, e._4)).toSeq: _*)
        q.processAllAvailable()
      }
      s.table("ivj_cf").as[(Long, Long, Long)].collect().toSet
    } finally q.stop()

    val batch = graft.ops.EnrichJoin.intervalJoin(s, dir)
      .select("click_id", "purchase_id", "gap_us")
      .as[(Long, Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture premise: some click-purchase pair within 1h")
    assert(streaming == batch,
      s"forms diverged: streaming=${streaming.size} batch=${batch.size} " +
        s"diff=${(streaming diff batch) ++ (batch diff streaming)}")
  }
}
