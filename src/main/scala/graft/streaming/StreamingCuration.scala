package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The STREAMING twin of the composed batch curation pipeline
  * (`curate_manifest`'s dedup stages): one ingest-time pipeline that
  * classifies every arriving document against the EXISTING corpus on all
  * three duplicate axes at once —
  *
  *   - EXACT   (content hash, twin of `dedup_exact`/`dedup_incremental`'s
  *     exact probe) via an index-primed keep-first hash state;
  *   - NEAR    (MinHash band buckets, twin of `dedup_incremental`'s near
  *     probe) via [[StreamingNearDup.withIndex]];
  *   - SEMANTIC (embedding cosine within a k-means cluster, twin of
  *     `semantic_incremental`) via [[StreamingSemanticDedup.withIndex]].
  *
  * This is the live counterpart of the reference's own centerpiece — a
  * multi-stage stateful DAG over one input stream (ref:
  * test/StateTest.java:638-873 composes six stateful stages; our
  * `enrich_dag` mirrors it relationally, this mirrors it for the
  * LLM-pipeline surface).
  *
  * COMPOSITION SHAPE: the three classifiers are PARALLEL branches of the
  * same input (they key state differently — hash, (band,bsig), cluster —
  * so they cannot share a shuffle), each an independent
  * flatMapGroupsWithState whose state was primed from the same corpus
  * snapshot. Two shapes are offered:
  *   - [[apply]]: three separate streams — each classifier scales,
  *     checkpoints, and restarts independently (the operationally
  *     conservative shape; also the only one where the semantic axis
  *     can consume a different physical stream of (vec_id, embedding));
  *   - [[docVerdicts]]: the doc-side classifiers (exact + near) UNIONED
  *     into one streaming query emitting (doc_id, stage, partner) —
  *     Spark 4 supports multiple flatMapGroupsWithState branches in one
  *     append-mode query, and one query is the right shape when a
  *     single sink wants the merged verdict stream
  *     (StreamingCurationSpec runs this form against the batch
  *     operators' classifications).
  *
  * A document is a DUPLICATE on an axis iff a pair surfaces whose
  * partner is an INDEX member (`partner < indexIdHorizon` — index ids
  * precede stream ids by construction of the ingest split); pairs whose
  * partner is another STREAM doc are within-batch duplicates, which the
  * batch incremental operators deliberately never generate — filter on
  * the partner id to reproduce their classification exactly
  * (StreamingCurationSpec pins this equivalence against
  * `dedup_incremental` + `semantic_incremental` on the same fixture).
  */
object StreamingCuration {

  /** A later arrival of an already-seen content hash: `docId` duplicates
    * `partner` (the hash's first owner — an index doc or an earlier
    * stream arrival). */
  final case class ExactDup(docId: Long, partner: Long)

  // private[streaming], not private: encoder-generated deserializers
  // instantiate these from generated Java, which cannot access a
  // JVM-private class (Scala `private[x]` is public in bytecode)
  private[streaming] final case class Hashed(ch: String, docId: Long)
  private[streaming] final case class HashOwner(first: Long)

  /** Index-primed streaming EXACT dedup: keep-first per content hash.
    * Emits one [[ExactDup]] per non-first arrival; first arrivals (fresh
    * content) emit nothing and become the hash's owner. State is one
    * (hash → owner id) row per distinct content hash — the streaming
    * complement of the batch `dedup_exact` min-id rule, primed so stream
    * docs duplicate INDEX content from the very first micro-batch.
    * Within one micro-batch arrivals are processed in doc-id order, so
    * the owner is deterministic under replay. State never evicts here
    * (the index IS the corpus); bound it with the watermark form
    * ([[StreamingDedup.dedupOnIngest]]) when no index primes it. */
  def exactWithIndex(docs: DataFrame, index: DataFrame): Dataset[ExactDup] = {
    implicit val hEnc = Encoders.product[Hashed]
    implicit val kEnc = Encoders.STRING
    implicit val oEnc = Encoders.product[HashOwner]
    implicit val dEnc = Encoders.product[ExactDup]
    implicit val kvEnc = Encoders.tuple(kEnc, oEnc)
    def hashed(df: DataFrame): Dataset[Hashed] =
      df.select(md5(col("text")).as("ch"), col("doc_id").as("docId")).as[Hashed]
    val initial = hashed(index)
      .groupByKey(_.ch)
      .mapGroups { (ch, it) => (ch, HashOwner(it.map(_.docId).min)) }
      .groupByKey(_._1).mapValues(_._2)
    hashed(docs)
      .groupByKey(_.ch)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout(),
        initial) { (_: String, it: Iterator[Hashed], st: GroupState[HashOwner]) =>
        val out = Vector.newBuilder[ExactDup]
        var owner = st.getOption.map(_.first)
        it.toSeq.sortBy(_.docId).foreach { h =>
          owner match {
            case Some(first) if first != h.docId => out += ExactDup(h.docId, first)
            case Some(_) => // redelivery of the owner itself: no-op
            case None => owner = Some(h.docId)
          }
        }
        owner.foreach(o => st.update(HashOwner(o)))
        out.result().iterator
      }
  }

  /** Doc-side verdicts (exact + near) as ONE streaming query:
    * (doc_id, stage ∈ exact|near, partner). The exact rows carry the
    * hash owner as partner; the near rows carry the bucket co-member
    * (`CandPair.docA`, the pair minimum). For an arrival classified
    * against the INDEX the arrival is always the pair MAXIMUM (index
    * ids precede stream ids), so `partner < indexIdHorizon` selects
    * index-duplicates exactly; rows where partner is another stream doc
    * are within-batch duplicates (and for an out-of-id-order stream
    * pair, `doc_id` is then the remembered member, not the arrival —
    * consumers filtering on the partner id are unaffected). */
  def docVerdicts(docs: DataFrame, indexDocs: DataFrame,
                  nearCap: Int = StreamingNearDup.MaxBucket): DataFrame =
    exactWithIndex(docs, indexDocs).toDF()
      .select(col("docId").as("doc_id"), lit("exact").as("stage"), col("partner"))
      .unionByName(
        StreamingNearDup.withIndex(docs, indexDocs, nearCap).toDF()
          .select(col("docB").as("doc_id"), lit("near").as("stage"),
            col("docA").as("partner")))

  /** The three classified verdict streams over one ingest source. */
  final case class CurationStreams(
      exact: Dataset[ExactDup],
      near: Dataset[StreamingNearDup.CandPair],
      semantic: Dataset[StreamingSemanticDedup.SemPair])

  /** Wire the full ingest-curation pipeline: `docs` (streaming
    * (doc_id, text)) and `vecs` (streaming (vec_id, embedding), same id
    * domain) classified against the corpus snapshot `indexDocs` /
    * `indexVecs`. `codebook` is the index's own sample-trained k-means
    * codebook (train-offline/serve-online, the batch discipline);
    * `tau`/`semCap`/`nearCap` mirror the batch operators' parameters. */
  def apply(docs: DataFrame, vecs: DataFrame,
            indexDocs: DataFrame, indexVecs: DataFrame,
            codebook: Seq[(Long, Seq[Long])],
            tau: Double,
            nearCap: Int = StreamingNearDup.MaxBucket,
            semCap: Int = StreamingSemanticDedup.MaxClusterMembers): CurationStreams =
    CurationStreams(
      exact = exactWithIndex(docs, indexDocs),
      near = StreamingNearDup.withIndex(docs, indexDocs, nearCap),
      semantic = StreamingSemanticDedup.withIndex(vecs, indexVecs, codebook, tau, semCap))
}
