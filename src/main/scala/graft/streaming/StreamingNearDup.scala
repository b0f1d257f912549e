package graft.streaming

import graft.ops.{Dedup, Prims}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online near-duplicate detection on ingest — the streaming form of the
  * batch MinHash+LSH family (graft.ops.Dedup.dedupNearMinhash): each
  * arriving document is banded into the SAME (band, band-signature)
  * buckets the batch pipeline uses (identical shingling, identical
  * Prims.hash60 arithmetic, identical band layout, and the identical
  * int64 `hash60(band values)` bucket KEY the batch exchange shuffles
  * on — 8-byte state keys, not ~40-char strings), and a stateful
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
  *
  * STATE MEMORY CONTRACT — choose per `horizon`:
  *   - `horizon = None` (default): buckets are never evicted. Memory is
  *     O(distinct (band, bsig) keys ever streamed) × O(cap) members —
  *     the state IS the corpus index (what [[withIndex]] primes), the
  *     right contract when the stream is the system of record and state
  *     is sized/checkpointed accordingly. Growth is in BUCKETS, not
  *     docs: NumBands keys per distinct signature seen.
  *   - `horizon = Some(d)`: buckets idle for `d` of PROCESSING time are
  *     dropped (GroupStateTimeout.ProcessingTimeTimeout — the same
  *     bounded-horizon posture as [[StreamingDedup]]'s watermark form;
  *     this operator keys state by signature, which carries no event
  *     time, so the horizon is processing-time by construction). Memory
  *     is O(buckets active within the horizon); docs recurring farther
  *     apart than the horizon re-pair from scratch, and global dedup
  *     beyond it belongs to the batch jobs.
  */
object StreamingNearDup {

  /** Cap on per-bucket membership state (and thus per-arrival fan-out). */
  val MaxBucket = 64

  /** CHECKPOINT COMPATIBILITY: `bsig` changed from String (the raw
    * comma-joined band values) to Long (their hash60) in round 8 — this
    * changes the flatMapGroupsWithState KEY ENCODER, so a streaming
    * query restarting from a pre-change checkpoint fails state-schema
    * validation (or would mis-read state on Spark versions without the
    * check). There is no compatibility shim: restart such queries from
    * a fresh checkpoint (re-prime via [[withIndex]]). Also note hash60
    * is 60-bit, so a collision can merge two unrelated buckets into
    * spurious candidate pairs — acceptable for an LSH candidate
    * GENERATOR (downstream verification filters them) and consistent
    * with the batch key, but unrecoverable from the emitted pair alone,
    * which carries no signature. */
  final case class Banded(docId: Long, band: Int, bsig: Long)
  final case class CandPair(docA: Long, docB: Long, band: Int)
  final case class BucketMembers(members: Vector[Long])

  /** (doc_id, text) rows → one row per (doc_id, band, bsig): the per-row
    * SQL twin of the batch banding (Dedup.dedupNearMinhash), including
    * the int64 `hash60` band-signature key the batch side buckets on. */
  def banded(docs: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.ensure(docs.sparkSession)
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
      s"struct($k AS band, hash60(concat_ws(',', $sig)) AS bsig)"
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

  private def handle(cap: Int, horizon: Option[String])(
      key: (Int, Long), it: Iterator[Banded],
      st: GroupState[BucketMembers]): Iterator[CandPair] = {
    if (st.hasTimedOut) {
      // idle past the horizon: drop the bucket (members recurring later
      // re-pair from a fresh bucket — the documented bounded contract)
      st.remove()
      return Iterator.empty
    }
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
    // re-arm the idle clock on every arrival: the bucket lives as long
    // as it keeps seeing members within the horizon
    horizon.foreach(st.setTimeoutDuration)
    out.result().iterator
  }

  private def timeoutConf(horizon: Option[String]): GroupStateTimeout =
    if (horizon.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  /** Streaming (doc_id, text) → candidate near-dup pairs as they arrive.
    * A pair may surface once per shared band; callers dedup downstream
    * (the batch form's `distinct`), e.g. with dropDuplicates on
    * (docA, docB) under a watermark. `horizon` selects the state memory
    * contract (see the object scaladoc): None = corpus-index state,
    * Some(duration) = buckets idle that long are evicted. */
  def apply(docs: DataFrame, cap: Int = MaxBucket,
            horizon: Option[String] = None): Dataset[CandPair] = {
    implicit val bandedEnc = Encoders.product[Banded]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val pairEnc = Encoders.product[CandPair]
    implicit val stateEnc = Encoders.product[BucketMembers]
    banded(docs).as[Banded]
      .groupByKey(b => (b.band, b.bsig))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf(horizon))(
        handle(cap, horizon))
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
    * (band, bsig) grouping the stream shuffles on. With a `horizon`,
    * primed buckets obey the same idle eviction once touched; untouched
    * primed buckets carry no timeout until first touched (Spark arms
    * timeouts only for groups the handler has seen). */
  def withIndex(docs: DataFrame, index: DataFrame,
                cap: Int = MaxBucket,
                horizon: Option[String] = None): Dataset[CandPair] = {
    implicit val bandedEnc = Encoders.product[Banded]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
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
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf(horizon),
        initial)(handle(cap, horizon))
  }
}
