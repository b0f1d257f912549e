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

  test("curation verdicts under 2k docs across 30 micro-batches: nothing lost, nothing doubled") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val nGroups = 200
    def text(g: Int) = s"group$g alpha$g beta$g gamma$g delta$g epsilon$g"
    // index: one owner per group (ids 0..199)
    val index = (0 until nGroups).map(g => (g.toLong, text(g)))
    // stream: 5 exact copies per group + 1000 fresh singletons, shuffled
    // deterministically and replayed in 30 chunks (group members split
    // across chunk boundaries — state must carry)
    val copies = for (g <- 0 until nGroups; r <- 0 until 5)
      yield (1000L + g * 10 + r, text(g))
    val fresh = (0 until 1000).map(i =>
      (100000L + i, s"unique$i doc$i word${i * 7} tok${i * 13} tail$i pad$i"))
    val stream = new scala.util.Random(42).shuffle(copies ++ fresh)
    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.docVerdicts(
        input.toDF().toDF("doc_id", "text"), index.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("soak_cur")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.grouped(stream.size / 30 + 1).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val verdicts = s.table("soak_cur").as[(Long, String, Long)].collect()
      val exact = verdicts.filter(_._2 == "exact")
      // EXACT axis, exactly-once: one verdict per copy, none for fresh,
      // and every partner is the copy's own group owner (the index min)
      assert(exact.length == copies.size,
        s"expected ${copies.size} exact verdicts, got ${exact.length}")
      assert(exact.map(_._1).toSet == copies.map(_._1).toSet)
      exact.foreach { case (id, _, partner) =>
        assert(partner == (id - 1000L) / 10, s"doc $id attributed to $partner")
      }
      // NEAR axis sanity: an exact copy shares every shingle with its
      // owner, so each copy must also surface as a near candidate against
      // SOME index member (hub-star may reroute the partner, never drop it)
      val nearIds = verdicts
        .filter(v => v._2 == "near" && v._3 < nGroups).map(_._1).toSet
      assert(copies.map(_._1).forall(nearIds.contains))
    } finally q.stop()
  }
}
