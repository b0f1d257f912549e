package graft.streaming

import graft.ops.{Dedup, Prims}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online near-duplicate detection on ingest — the streaming form of the
  * batch MinHash+LSH family (graft.ops.Dedup.dedupNearMinhash): each
  * arriving document is banded into the SAME (band, band-signature)
  * buckets the batch pipeline uses (identical shingling, identical
  * Prims.hash60 arithmetic, identical band layout), and a stateful
  * per-bucket membership set emits a candidate pair the moment a new
  * document lands in a bucket that already has members.
  *
  * Scale posture:
  *   - Signature computation is a NARROW per-row expression (shingle
  *     transform + 16 array_min folds, all Catalyst) — no joins, no
  *     dictionary, because a streaming row is touched once; the batch
  *     pipeline's distinct-shingle dictionary amortizes repeated
  *     hashing, which has no analogue row-at-a-time.
  *   - State is keyed by (band, bsig): work and memory follow bucket
  *     collisions, never all-pairs. `MaxBucket` caps any one bucket's
  *     membership (a degenerate signature — e.g. empty-ish docs — would
  *     otherwise accumulate unboundedly and emit O(n²) pairs); beyond
  *     the cap the bucket DEGRADES to star pairs — each further arrival
  *     emits the single (hub = minimum seen member, newcomer) pair
  *     instead of being silently refused — the SAME policy as the batch
  *     twin's hot buckets (Dedup.MaxBandBucket), so a mass-replicated
  *     group arriving on the stream stays fully collapsible by
  *     connected components while state and per-arrival fan-out stay
  *     O(cap) and O(1). Over-cap arrivals are not remembered, so an
  *     at-least-once redelivery re-emits its hub pair; callers dedup on
  *     (docA, docB) downstream (see [[apply]]).
  */
object StreamingNearDup {

  /** Cap on per-bucket membership state (and thus per-arrival fan-out). */
  val MaxBucket = 64

  final case class Banded(docId: Long, band: Int, bsig: String)
  final case class CandPair(docA: Long, docB: Long, band: Int)
  final case class BucketMembers(members: Vector[Long])

  /** (doc_id, text) rows → one row per (doc_id, band, bsig): the per-row
    * SQL twin of the batch banding (Dedup.dedupNearMinhash). */
  def banded(docs: DataFrame): DataFrame = {
    val shingles =
      """array_distinct(transform(sequence(1, size(ws) - 2),
        |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ', element_at(ws, i + 2))))"""
        .stripMargin
    val hs = s"transform($shingles, s -> pmod(hash60(s), ${Prims.P31}L))"
    def mh(j: Int) =
      s"array_min(transform(hs, h -> pmod(${Dedup.aCoef(j)}L * h + ${Dedup.bCoef(j)}L, ${Prims.P31}L)))"
    val bandStructs = (0 until Dedup.NumBands).map { k =>
      val sig = (0 until Dedup.BandRows)
        .map(r => s"CAST(mh${Dedup.BandRows * k + r} AS STRING)").mkString(", ")
      s"struct($k AS band, concat_ws(',', $sig) AS bsig)"
    }.mkString(", ")
    docs
      .withColumn("ws", expr(Prims.wordsExpr))
      .filter(size(col("ws")) >= 3)
      .withColumn("hs", expr(hs))
      .select(Seq(col("doc_id")) ++
        (0 until Dedup.NumHashes).map(j => expr(mh(j)).as(s"mh$j")): _*)
      .select(col("doc_id"), explode(expr(s"array($bandStructs)")).as("b"))
      .select(col("doc_id").as("docId"), col("b.band").as("band"), col("b.bsig").as("bsig"))
  }

  private def handle(cap: Int)(key: (Int, String), it: Iterator[Banded],
                               st: GroupState[BucketMembers]): Iterator[CandPair] = {
    var members = st.getOption.map(_.members).getOrElse(Vector.empty)
    val out = Vector.newBuilder[CandPair]
    it.toSeq.sortBy(_.docId).foreach { d =>
      if (!members.contains(d.docId)) {
        if (members.size < cap) {
          members.foreach { m =>
            out += CandPair(math.min(m, d.docId), math.max(m, d.docId), key._1)
          }
          members = members :+ d.docId
        } else {
          // saturated bucket: star degradation — one (hub, newcomer)
          // pair keeps the arrival reachable from the group without
          // growing state or fan-out (batch twin: Dedup hot buckets)
          val hub = members.min
          out += CandPair(math.min(hub, d.docId), math.max(hub, d.docId), key._1)
        }
      }
    }
    st.update(BucketMembers(members))
    out.result().iterator
  }

  /** Streaming (doc_id, text) → candidate near-dup pairs as they arrive.
    * A pair may surface once per shared band; callers dedup downstream
    * (the batch form's `distinct`), e.g. with dropDuplicates on
    * (docA, docB) under a watermark. */
  def apply(docs: DataFrame, cap: Int = MaxBucket): Dataset[CandPair] = {
    implicit val bandedEnc = Encoders.product[Banded]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    implicit val pairEnc = Encoders.product[CandPair]
    implicit val stateEnc = Encoders.product[BucketMembers]
    banded(docs).as[Banded]
      .groupByKey(b => (b.band, b.bsig))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle(cap))
  }

  /** INDEX-PRIMED streaming near-dup: the streaming twin of the batch
    * `dedup_incremental` — bucket state starts PRE-POPULATED from a
    * historical corpus (batch `index` of (doc_id, text) rows, banded by
    * the identical [[banded]] arithmetic and folded to capped member
    * sets), so a streamed document pairs against everything the corpus
    * already contains from its very first micro-batch, while
    * WITHIN-INDEX pairs are never emitted (they were state, not input —
    * exactly the ingest-time semantics; re-clustering the index is
    * batch work, not stream work). Uses `flatMapGroupsWithState`'s
    * initial-state overload: the primer is one batch aggregation whose
    * output is the per-bucket state value, distributed by the same
    * (band, bsig) grouping the stream shuffles on. */
  def withIndex(docs: DataFrame, index: DataFrame,
                cap: Int = MaxBucket): Dataset[CandPair] = {
    implicit val bandedEnc = Encoders.product[Banded]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    implicit val pairEnc = Encoders.product[CandPair]
    implicit val stateEnc = Encoders.product[BucketMembers]
    implicit val kvEnc = Encoders.tuple(keyEnc, stateEnc)
    val initial = banded(index).as[Banded]
      .groupByKey(b => (b.band, b.bsig))
      .mapGroups { (k, it) =>
        (k, BucketMembers(it.map(_.docId).toVector.sorted.take(cap)))
      }
      .groupByKey(_._1).mapValues(_._2)
    banded(docs).as[Banded]
      .groupByKey(b => (b.band, b.bsig))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout(),
        initial)(handle(cap))
  }
}
