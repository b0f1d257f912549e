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
  *     cluster; beyond it arrivals compare against the HUB (minimum
  *     remembered id) only — the same star degradation as every hot
  *     bucket in the family, O(1) fan-out past the cap.
  *   - The per-arrival comparison is O(cap · dim) driver-free work in
  *     the state handler; cosine arithmetic matches the batch twin's
  *     expression shape (int64 dots, double division).
  *   - State never evicts (cluster count is bounded by k, members by
  *     cap — memory is O(k · cap · dim), a FIXED budget, unlike the
  *     unbounded-bucket near-dup case, so no horizon option is needed).
  */
object StreamingSemanticDedup {

  /** Default cap on remembered members per cluster. */
  val MaxClusterMembers = 64

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
        if (members.size < cap) {
          members.foreach { case (mid, mq) =>
            val c = cosine(mq, v.qv)
            if (c >= tau)
              out += SemPair(math.min(mid, v.vecId), math.max(mid, v.vecId), key, c)
          }
          members = members :+ (v.vecId, v.qv)
        } else {
          // saturated cluster: compare against the hub only (star
          // degradation — the arrival stays reachable from the group,
          // state and fan-out stay O(cap)/O(1))
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
    * LSH bands); at-least-once redelivery of an over-cap arrival can
    * re-emit its hub pair — callers dedup on (vecA, vecB) downstream. */
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
    * SAME codebook arithmetic and folded to capped member sets sorted by
    * vec_id — so a saturated cluster's hub is the index minimum, exactly
    * the batch twin's hub rule), so a streamed vector is compared
    * against everything the corpus already contains from its very first
    * micro-batch, while WITHIN-INDEX pairs are never emitted (they were
    * state, not input — re-deduping the index is batch work). */
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
        (k, ClusterMembers(
          it.map(a => (a.vecId, a.qv)).toVector.sortBy(_._1).take(cap)))
      }
      .groupByKey(_._1).mapValues(_._2)
    assigned(vecs, codebook).as[Assigned]
      .groupByKey(_.cluster)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout(),
        initial)(handle(tau, cap))
  }
}
