package graft.streaming

import graft.SparkSpec
import graft.ops.{Dedup, Prims}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingNearDup.CandPair

/** Online LSH near-dup detection, checked against an INDEPENDENT
  * pure-Scala implementation of the minhash banding (not against the
  * Spark batch pipeline, so a shared bug can't self-certify). */
class StreamingNearDupSpec extends SparkSpec {

  private def hash60(x: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)

  /** Reference banding: same shingling/hash/band layout as Dedup. */
  private def refBands(text: String): Seq[(Int, String)] = {
    val ws = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    if (ws.length < 3) Nil
    else {
      val hm = ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
        .map(s => hash60(s) % Prims.P31)
      val mh = (0 until Dedup.NumHashes)
        .map(j => hm.map(h => (Dedup.aCoef(j) * h + Dedup.bCoef(j)) % Prims.P31).min)
      (0 until Dedup.NumBands).map(k =>
        k -> (0 until Dedup.BandRows).map(r => mh(Dedup.BandRows * k + r)).mkString(","))
    }
  }

  test("streaming pairs equal the reference implementation's bucket pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq // all 500: the fixture's near-dups guarantee collisions
    // expected: within each (band, bsig) bucket, all unordered pairs
    val expected = (for {
      (band, bucket) <- docs.flatMap { case (id, t) =>
          refBands(t).map { case (b, sig) => ((b, sig), id) }
        }.groupBy(_._1).toSeq // toSeq BEFORE dropping sig from the key —
                              // mapping a Map to (band, ids) would collapse
                              // every bucket of a band into one entry
        .map { case (k, v) => (k._1, v.map(_._2).sorted) }
      i <- bucket.indices; j <- 0 until i
    } yield CandPair(bucket(j), bucket(i), band)).toSet

    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("snd")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(250)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
      val got = s.table("snd").as[CandPair].collect().toSet
      assert(expected.nonEmpty, "fixture should produce at least one candidate pair")
      assert(got == expected)
    } finally q.stop()
  }

  test("bucket cap bounds membership and pair fan-out") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 6 identical texts: every band's bucket would hold all 6 without
    // the cap; with cap 3 membership stops at 3 → 3 pairs per band
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup(input.toDF().toDF("doc_id", "text"), cap = 3)
      .writeStream.format("memory").queryName("snd_cap")
      .outputMode("append").start()
    try {
      input.addData((1L to 6L).map(i => (i, "alpha beta gamma delta epsilon")))
      q.processAllAvailable()
      val got = s.table("snd_cap").as[CandPair].collect()
      val perBand = got.groupBy(_.band).view.mapValues(_.length).toMap
      assert(perBand.keySet == (0 until Dedup.NumBands).toSet)
      assert(perBand.values.forall(_ == 3)) // C(3,2), not C(6,2)
      assert(got.forall(p => p.docA <= 3 && p.docB <= 3))
    } finally q.stop()
  }
}
