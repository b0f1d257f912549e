package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online SEMANTIC near-duplicate detection on ingest — the streaming
  * twin of the batch `semantic_dedup` (graft.ops.Similarity), completing
  * the same batch↔streaming parity the MinHash family has
  * ([[StreamingNearDup]]): each arriving embedding is assigned to its
  * nearest codebook centroid by a NARROW per-row expression (the
  * codebook is a plan literal — the deployment pattern for online
  * semantic dedup is train-offline/serve-online, exactly the batch
  * side's sample-trained discipline), and a stateful per-cluster member
  * set emits a pair the moment a new vector lands within cosine ≥ tau
  * of a remembered same-cluster member.
  *
  * Scale posture mirrors [[StreamingNearDup]]:
  *   - Assignment is argmin over k literal centroids — exact int64
  *     quantized L2², codegen qdot, no joins, no shuffle beyond the
  *     cluster groupBy.
  *   - State is keyed by cluster id: work and memory follow cluster
  *     occupancy, never all-pairs. `cap` bounds remembered members per
  *     cluster: arrivals insert while occupancy < cap and are compared
  *     against EVERY remembered member while occupancy ≤ cap; a cluster
  *     is SATURATED only when occupancy EXCEEDS the cap (reachable only
  *     via a [[withIndex]] prime whose index cluster was itself beyond
  *     the cap), and saturated arrivals compare against the HUB (minimum
  *     remembered id) only — the batch family's exact boundary
  *     (`cn <= maxCluster` all-pairs / `cn > maxCluster` hub-star), so
  *     the two sides classify identically at the cap itself. Past-cap
  *     fan-out is O(cap · dim) per arrival with frozen state — bounded
  *     by a constant the caller picks, never by stream volume.
  *   - The per-arrival comparison is O(cap · dim) driver-free work in
  *     the state handler; cosine arithmetic matches the batch twin's
  *     expression shape (int64 dots, double division).
  *   - State never evicts (cluster count is bounded by k, members by
  *     cap+1 — memory is O(k · cap · dim), a FIXED budget, unlike the
  *     unbounded-bucket near-dup case, so no horizon option is needed).
  */
object StreamingSemanticDedup {

  /** Default cap on remembered members per cluster — the batch twin's
    * [[graft.ops.Similarity.MaxSemCluster]], shared so the defaults
    * cannot drift (they differed 64 vs 100 through round 9, which made
    * the two sides classify differently for occupancies in (64,100]). */
  val MaxClusterMembers: Int = graft.ops.Similarity.MaxSemCluster

  final case class Assigned(vecId: Long, cluster: Long, qv: Seq[Long])
  final case class SemPair(vecA: Long, vecB: Long, cluster: Long, cosine: Double)
  final case class ClusterMembers(members: Vector[(Long, Seq[Long])])

  /** (vec_id, embedding: array<float>) rows → (vecId, cluster, qv): the
    * per-row assignment twin of the batch argmin (quantize → exact-int64
    * L2² against each literal centroid → min by (d2, cent_id)). */
  def assigned(vecs: DataFrame, codebook: Seq[(Long, Seq[Long])]): DataFrame = {
    import graft.functions.QDot
    val qv = expr(graft.ops.Similarity.quantExpr)
    val withQ = vecs.select(col("vec_id"), qv.as("qv"))
      .withColumn("qq", QDot(col("qv"), col("qv")))
    val cands = codebook.map { case (cid, cv) =>
      struct(
        (col("qq") - lit(2) * QDot(col("qv"), typedLit(cv))
          + lit(cv.map(x => x * x).sum)).as("d2"),
        lit(cid).as("cid"))
    }
    withQ
      .withColumn("best", array_min(array(cands: _*)))
      .select(col("vec_id").as("vecId"), col("best.cid").as("cluster"), col("qv"))
  }

  private def cosine(a: Seq[Long], b: Seq[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  private def handle(tau: Double, cap: Int)(
      key: Long, it: Iterator[Assigned],
      st: GroupState[ClusterMembers]): Iterator[SemPair] = {
    var members = st.getOption.map(_.members).getOrElse(Vector.empty)
    val out = Vector.newBuilder[SemPair]
    it.toSeq.sortBy(_.vecId).foreach { v =>
      if (!members.exists(_._1 == v.vecId)) {
        if (members.size <= cap) {
          // at or under the cap: compare against every remembered member
          // (the batch small path's `cn <= maxCluster` all-pairs rule —
          // an index cluster of EXACTLY cap members still compares fully)
          members.foreach { case (mid, mq) =>
            val c = cosine(mq, v.qv)
            if (c >= tau)
              out += SemPair(math.min(mid, v.vecId), math.max(mid, v.vecId), key, c)
          }
          // remember the arrival only while it keeps occupancy ≤ cap
          if (members.size < cap) members = members :+ (v.vecId, v.qv)
        } else {
          // saturated cluster (> cap members — only a withIndex prime of
          // an over-cap index cluster gets here): compare against the
          // hub only, the batch hot path's `cn > maxCluster` star rule
          val (hid, hq) = members.minBy(_._1)
          val c = cosine(hq, v.qv)
          if (c >= tau)
            out += SemPair(math.min(hid, v.vecId), math.max(hid, v.vecId), key, c)
        }
      }
    }
    st.update(ClusterMembers(members))
    out.result().iterator
  }

  /** Streaming (vec_id, embedding) → semantic near-dup pairs as they
    * arrive. A pair surfaces once (clusters partition the space, unlike
    * LSH bands); at-least-once redelivery of an arrival past the cap
    * (not remembered in state) can re-emit its pairs — callers dedup on
    * (vecA, vecB) downstream. */
  def apply(vecs: DataFrame, codebook: Seq[(Long, Seq[Long])],
            tau: Double = 0.4,
            cap: Int = MaxClusterMembers): Dataset[SemPair] = {
    implicit val aEnc = Encoders.product[Assigned]
    implicit val kEnc = Encoders.scalaLong
    implicit val pEnc = Encoders.product[SemPair]
    implicit val sEnc = Encoders.product[ClusterMembers]
    assigned(vecs, codebook).as[Assigned]
      .groupByKey(_.cluster)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        handle(tau, cap))
  }

  /** INDEX-PRIMED streaming semantic dedup: the streaming twin of the
    * batch `semantic_incremental`, completing the family's withIndex
    * surface ([[StreamingNearDup.withIndex]] is the MinHash analogue).
    * Per-cluster member state starts PRE-POPULATED from a historical
    * corpus (batch `index` of (vec_id, embedding) rows, assigned by the
    * SAME codebook arithmetic and folded to member sets sorted by
    * vec_id), so a streamed vector is compared against everything the
    * corpus already contains from its very first micro-batch, while
    * WITHIN-INDEX pairs are never emitted (they were state, not input —
    * re-deduping the index is batch work).
    *
    * The prime keeps cap+1 members, not cap: the one extra row is the
    * SATURATION MARKER that lets the handler distinguish an index
    * cluster of exactly cap members (batch: still all-pairs) from one
    * truncated past the cap (batch: hub-star) — with it, the streamed
    * verdicts on index↔stream pairs match `semanticIncremental` at ANY
    * index occupancy, not just the unsaturated regime: cn ≤ cap compares
    * the full index member set, cn > cap compares the index-minimum hub
    * only, the identical `<=`/`>` boundary the batch operator applies.
    * (Stream↔stream pairs are additionally emitted while occupancy stays
    * under the cap — online ownership tracking the batch ingest form
    * doesn't do; callers reproducing batch dispositions filter to pairs
    * whose smaller id is an index member, as StreamingCurationSpec
    * does.) */
  def withIndex(vecs: DataFrame, index: DataFrame,
                codebook: Seq[(Long, Seq[Long])],
                tau: Double = 0.4,
                cap: Int = MaxClusterMembers): Dataset[SemPair] = {
    implicit val aEnc = Encoders.product[Assigned]
    implicit val kEnc = Encoders.scalaLong
    implicit val pEnc = Encoders.product[SemPair]
    implicit val sEnc = Encoders.product[ClusterMembers]
    implicit val kvEnc = Encoders.tuple(kEnc, sEnc)
    val initial = assigned(index, codebook).as[Assigned]
      .groupByKey(_.cluster)
      .mapGroups { (k, it) =>
        // cap+1, not cap: the extra member marks "index beyond the cap"
        // so the handler can apply the batch <=/> boundary exactly
        (k, ClusterMembers(
          it.map(a => (a.vecId, a.qv)).toVector.sortBy(_._1).take(cap + 1)))
      }
      .groupByKey(_._1).mapValues(_._2)
    assigned(vecs, codebook).as[Assigned]
      .groupByKey(_.cluster)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout(),
        initial)(handle(tau, cap))
  }
}
