package graft.streaming

import graft.SparkSpec
import graft.ops.Bpe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the ingest-time tokenizer twin: streamed per-doc token counts
  * are IDENTICAL to the batch `bpe_apply` economics under the same
  * trained chain, and a republished (retrained) chain takes effect on
  * the very next micro-batch without restarting the stream. */
class StreamingBpeSpec extends SparkSpec {

  private def batchEncode(docs: DataFrame, mergesPath: String): Set[(Long, Long, Long, Long)] = {
    val s = docs.sparkSession
    import s.implicits._
    StreamingBpe.encodeBatch(docs, mergesPath)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("stream-vs-batch token counts agree; retrain hot-swaps next batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sbpe").toString
    val mergesPath = s"$base/merges"

    val corpusA = Seq((1L, "aaab aaab ab"), (2L, "aaab ab ab")).toDF("doc_id", "text")
    StreamingBpe.trainAndPublish(s, mergesPath, corpusA)

    // batch truth for the arriving docs under chain A: bpeApply on the
    // TRAINING corpus itself (apply's own contract), via the same chain
    val arrivalsA = Seq((10L, "aaab ab"), (11L, "ab zz"))
    val batchA = batchEncode(arrivalsA.toDF("doc_id", "text"), mergesPath)

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val got = scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Long, Long)]]()
    val q = StreamingBpe.start(docs, mergesPath) { (batch, _) =>
      got += batch.as[(Long, Long, Long, Long)].collect().toSet
    }
    try {
      input.addData(arrivalsA: _*); q.processAllAvailable()
      assert(got.last == batchA, s"stream≠batch under chain A: ${got.last} vs $batchA")
      // sanity: the chain actually merged something (not char counting)
      val aaab = got.last.find(_._1 == 10L).get
      assert(aaab._4 < aaab._3, s"no merges applied: $aaab")

      // RETRAIN on a corpus with different statistics and republish:
      // the running stream must pick the new chain up next batch
      val corpusB = Seq((1L, "zz zz zz zq")).toDF("doc_id", "text")
      StreamingBpe.trainAndPublish(s, mergesPath, corpusB)
      val arrivalsB = Seq((20L, "zz zq ab"))
      val batchB = batchEncode(arrivalsB.toDF("doc_id", "text"), mergesPath)
      input.addData(arrivalsB: _*); q.processAllAvailable()
      assert(got.last == batchB, s"republished chain not picked up: ${got.last} vs $batchB")
      // under chain B 'ab' must NOT merge (2 tokens) but 'zz' must (1)
      val r20 = got.last.head
      assert(r20 == ((20L, 3L, 6L, 4L)), s"chain-B economics wrong: $r20")
    } finally q.stop()
  }

  test("encodeBatch equals the batch bpe_apply on the training corpus") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("sbpe2").toString
    val mergesPath = s"$base/merges"
    val corpus = Seq((1L, "pq pq pqr xoy"), (2L, "pq pqr xoy")).toDF("doc_id", "text")
    StreamingBpe.trainAndPublish(s, mergesPath, corpus)
    val viaBatch = Bpe.bpeApplyOf(corpus).as[(Long, Long, Long, Long)].collect().toSet
    assert(batchEncode(corpus, mergesPath) == viaBatch,
      "published-chain encode diverges from bpe_apply")
  }

  test("publishing an empty chain is refused") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("sbpe3").toString
    // single-char words: no adjacent pairs, training exhausts at 0 merges
    val degenerate = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      StreamingBpe.trainAndPublish(s, s"$base/merges", degenerate)
    }
  }
}
