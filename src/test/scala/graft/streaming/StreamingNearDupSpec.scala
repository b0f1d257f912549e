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

  test("index-primed stream: new docs pair against the index, index pairs stay silent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val fresh = "nothing here resembles the indexed corpus in any shingle at all ever"
    // index: docs 1 and 2 share every bucket (identical text) — but the
    // (1,2) pair must NEVER be emitted (it's pre-existing state)
    val index = Seq((1L, txt), (2L, txt)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.withIndex(input.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("snd_idx")
      .outputMode("append").start()
    try {
      input.addData((10L, txt), (11L, fresh))
      q.processAllAvailable()
      val got = s.table("snd_idx").as[CandPair].collect().toSet
      val gotPairs = got.map(p => (p.docA, p.docB))
      // doc 10 pairs with BOTH index members from its first micro-batch;
      // the fresh doc and the within-index pair produce nothing
      assert(gotPairs == Set((1L, 10L), (2L, 10L)), s"got $gotPairs")
      // a second identical arrival also pairs with the earlier streamed doc
      input.addData((12L, txt))
      q.processAllAvailable()
      val after = s.table("snd_idx").as[CandPair].collect().toSet.map {
        (p: CandPair) => (p.docA, p.docB) }
      assert(after == Set((1L, 10L), (2L, 10L), (1L, 12L), (2L, 12L), (10L, 12L)),
        s"got $after")
    } finally q.stop()
  }

  test("horizon: buckets idle past it evict; buckets within it pair on") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val txt = "alpha beta gamma delta epsilon zeta eta theta"

    // A ProcessingTimeTimeout query runs continuous micro-batches to fire
    // its timers (default trigger), so processAllAvailable never observes
    // a quiet point and can hang — the spec POLLS the sink instead, and
    // tears down with SparkSpec.quietStop (the 200 ms trigger below
    // gives it an idle window to aim for).
    def pairsIn(table: String): Set[(Long, Long)] =
      s.table(table).as[CandPair].collect().toSet.map {
        (p: CandPair) => (p.docA, p.docB) }
    def awaitPairs(table: String, expected: Set[(Long, Long)]): Set[(Long, Long)] = {
      val deadline = System.currentTimeMillis + 60000
      var got = pairsIn(table)
      while (System.currentTimeMillis < deadline && got != expected) {
        Thread.sleep(200); got = pairsIn(table)
      }
      got
    }

    // WITHIN the horizon (10 minutes — never expires in-test): a later
    // batch still pairs against remembered members
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamingNearDup(in1.toDF().toDF("doc_id", "text"),
        horizon = Some("10 minutes"))
      .writeStream.format("memory").queryName("snd_h1")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .outputMode("append").start()
    try {
      in1.addData((1L, txt), (2L, txt))
      assert(awaitPairs("snd_h1", Set((1L, 2L))) == Set((1L, 2L)))
      in1.addData((3L, txt))
      val got = awaitPairs("snd_h1", Set((1L, 2L), (1L, 3L), (2L, 3L)))
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"pairs within the horizon must be unaffected, got $got")
    } finally quietStop(q1)

    // PAST the horizon (1 second, then a 5 s idle gap during which the
    // continuously-triggering engine fires the timer): the bucket is
    // dropped, so a recurrence pairs with nobody remembered — but seeds a
    // fresh bucket that pairs again going forward
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamingNearDup(in2.toDF().toDF("doc_id", "text"),
        horizon = Some("1 second"))
      .writeStream.format("memory").queryName("snd_h2")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .outputMode("append").start()
    try {
      in2.addData((1L, txt), (2L, txt))
      assert(awaitPairs("snd_h2", Set((1L, 2L))) == Set((1L, 2L)))
      Thread.sleep(5000) // idle past the horizon; timers fire mid-sleep
      in2.addData((3L, txt))       // evicted bucket: no pair emitted
      in2.addData((4L, txt))       // fresh bucket: pairs with 3
      val got = awaitPairs("snd_h2", Set((1L, 2L), (3L, 4L)))
      assert(got == Set((1L, 2L), (3L, 4L)),
        s"evicted bucket must forget members 1/2 but keep pairing fresh ones, got $got")
    } finally quietStop(q2)
  }

  test("bucket cap degrades to star pairs: capped state, full fan-out kept linear") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 6 identical texts, cap 3: members 1..3 pair fully (C(3,2)=3);
    // 4..6 each emit exactly the (hub=1, newcomer) star pair — the batch
    // hot-bucket policy — instead of being dropped
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup(input.toDF().toDF("doc_id", "text"), cap = 3)
      .writeStream.format("memory").queryName("snd_cap")
      .outputMode("append").start()
    try {
      input.addData((1L to 6L).map(i => (i, "alpha beta gamma delta epsilon")))
      q.processAllAvailable()
      val got = s.table("snd_cap").as[CandPair].collect()
      val perBand = got.groupBy(_.band).view.mapValues(_.toSet).toMap
      assert(perBand.keySet == (0 until Dedup.NumBands).toSet)
      perBand.foreach { case (band, pairs) =>
        val full = Set((1L, 2L), (1L, 3L), (2L, 3L))
        val star = Set((1L, 4L), (1L, 5L), (1L, 6L))
        assert(pairs.map(p => (p.docA, p.docB)) == full ++ star,
          s"band $band pairs: $pairs")
      }
    } finally q.stop()
  }

  test("mass-replicated stream group stays fully hub-reachable past the cap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 120 identical docs over a cap-8 bucket, streamed in three batches:
    // every doc must end up reachable from the hub (connected components
    // collapses the whole group) while state stays at 8 members
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup(input.toDF().toDF("doc_id", "text"), cap = 8)
      .writeStream.format("memory").queryName("snd_star")
      .outputMode("append").start()
    try {
      (0 until 3).foreach { b =>
        input.addData((1L + 40 * b to 40L + 40 * b).map(i => (i, "zeta eta theta iota kappa")))
        q.processAllAvailable()
      }
      val got = s.table("snd_star").as[CandPair].collect()
      // union-find over emitted pairs: one component containing all 120
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
      got.foreach { p =>
        val (ra, rb) = (find(p.docA), find(p.docB))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val roots = (1L to 120L).map(find).toSet
      assert(roots == Set(1L), s"group split into components rooted at $roots")
      // state bounded: full pairs only among the first 8 members, and
      // every over-cap doc appears ONLY in (hub=1, doc) star pairs
      val overCap = got.filter(p => p.docB > 8)
      assert(overCap.nonEmpty)
      assert(overCap.forall(_.docA == 1L), "star pairs must anchor on the hub")
    } finally q.stop()
  }
}
