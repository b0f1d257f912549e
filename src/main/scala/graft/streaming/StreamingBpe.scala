package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Bpe

/** Ingest-time BPE encoding — the streaming twin of the batch tokenizer
  * loop ([[graft.ops.Bpe]]): a trained merge chain, published as a
  * versioned [[SnapshotStore]] artifact, applied to an incoming document
  * stream so per-doc token economics (n_words, n_chars, n_tokens) are
  * known AT INGEST, before the corpus lands — the number every packing /
  * quota / budget decision downstream keys on.
  *
  * Refresh model is [[DynamicRules]]': training runs in batch (offline,
  * corpus-scale), publishes the ≤ [[graft.ops.Bpe.MergeRounds]]-row
  * merge table with an atomic pointer flip, and the running encode
  * stream picks the new tokenizer up on its very next micro-batch — a
  * retrain NEVER restarts ingest. Per batch the chain comes back as a
  * driver-side read of KB-sized metadata folded into the encode
  * projection as literal `replace` pairs (the plan ships the chain to
  * every task; there is no vocab join and no broadcast exchange), so the
  * streaming plan adds ZERO exchanges beyond the per-doc map-side
  * aggregation the batch plan already has.
  *
  * Reference anchor: the broadcast-state shape of
  * test/StateTest.java composed with the per-record projection stages of
  * main/transform/TransformTest.java — re-expressed as per-batch
  * re-planning, the supported Spark idiom (see [[DynamicRules]] for why
  * a stream–static join cannot do this). */
object StreamingBpe {

  /** Train on `corpus` (batch) and publish the ordered merge chain at
    * `mergesPath`. Publishing an EMPTY chain is refused: a caller that
    * trained on a degenerate corpus would otherwise silently downgrade
    * every consumer to character tokenization. */
  def trainAndPublish(spark: SparkSession, mergesPath: String,
      corpus: DataFrame): Unit = {
    val merges = Bpe.bpeMergesOf(corpus)
    require(!merges.isEmpty, "refusing to publish an empty merge chain")
    SnapshotStore.publish(spark, mergesPath, merges)
  }

  /** The CURRENT published chain, ordered by round — ≤ MergeRounds rows
    * of driver metadata per call, the same bounded-collect contract as
    * the codebook reads in Similarity. */
  def currentChain(spark: SparkSession, mergesPath: String): Seq[(String, String)] =
    spark.read.parquet(SnapshotStore.current(spark, mergesPath))
      .orderBy("round").select("left_sym", "right_sym")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  /** Encode ONE batch of documents (doc_id, text) against the CURRENT
    * chain: (doc_id, n_words, n_chars, n_tokens). Resolving the chain
    * here — inside the per-batch closure, not at plan build — is what
    * makes the tokenizer hot-swappable under a running stream. */
  def encodeBatch(docs: DataFrame, mergesPath: String): DataFrame =
    Bpe.encodeWith(docs, currentChain(docs.sparkSession, mergesPath))

  /** Run a streaming document frame with per-trigger tokenizer refresh:
    * each micro-batch re-resolves the published chain and hands the
    * encoded batch to `sink` (which owns output semantics, as always
    * with foreachBatch). */
  def start(docs: DataFrame, mergesPath: String)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(encodeBatch(batch, mergesPath), id))
      .start()
}
