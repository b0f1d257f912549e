package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import EnrichState._

/** Sustained-load invariant check: thousands of interleaved events
  * through the enrichment state machine across many micro-batches —
  * nothing lost, nothing duplicated, per-key outputs exactly as the
  * reference semantics dictate regardless of batch boundaries. */
class SoakSpec extends SparkSpec {

  test("enrichment state machine under 5k events across 20 micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val nWaybills = 500
    // per waybill: 5 links (seq 1..5) then 1 CEM (seq 6) → 5 joined rows
    val events = (0 until nWaybills).flatMap { w =>
      val code = f"JD$w%05d"
      (1 to 5).map(i => In(code, i.toLong,
        None, Some(RouteLink(code, s"$code-$i", i * 100L)))) :+
        In(code, 6L, Some(Cem(code, "sig", "1", "s", "9", "m", "p", None, None)), None)
    }
    // interleave across keys, then split into 20 arrival chunks
    val interleaved = events.groupBy(_.seq).toSeq.sortBy(_._1).flatMap(_._2)
    val input = MemoryStream[In]
    val q = EnrichState(input.toDS())
      .writeStream.format("memory").queryName("soak1")
      .outputMode(OutputMode.Append()).start()
    try {
      interleaved.grouped(interleaved.size / 20 + 1).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val out = s.table("soak1")
      assert(out.count() == nWaybills * 5L) // exactly 5 joined rows per waybill
      val perKey = out.groupBy("waybillCode").count()
        .filter("count <> 5").count()
      assert(perKey == 0)
      // every output row is fully joined (link present, CEM fields present)
      assert(out.filter("packageCode IS NULL OR busiNo IS NULL").count() == 0)
    } finally q.stop()
  }
}
