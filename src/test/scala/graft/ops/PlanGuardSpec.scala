package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Fleet-wide physical-plan guard: NO query may plan a CartesianProduct,
  * and BroadcastNestedLoopJoin is allowed only where the build side is a
  * bounded literal (centroid codebooks, scalar totals) — the two shapes
  * that silently turn a refactor into an all-pairs scan at corpus scale.
  *
  * Constructing the DataFrames at sf0.001 executes the eager stages some
  * operators run at build time (checkpoints, Lloyd training, cluster
  * resolution) — that is the price of auditing the REAL executed shape
  * rather than a stand-in.
  */
class PlanGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * every entry is a crossJoin against a BOUNDED broadcast side. */
  private val bnlAllowed: Map[String, String] = Map(
    "ann_topk" -> "query set × corpus: broadcast literal query vectors",
    "ann_ivf_topk" -> "16-centroid codebook cross (broadcast literal)",
    "ann_ivf_recall" -> "16-centroid codebook cross (broadcast literal)",
    "ann_ivf_sampled_recall" -> "16-centroid codebook cross (broadcast literal)",
    "embed_cluster_profile" -> "16-centroid codebook cross (broadcast literal)",
    "domain_mix_weighted" -> "1-row weight-total cross (broadcast scalar)",
    "sliding_window" -> "4-row pane-offset literal cross",
    "ann_lsh_pairs" -> "16-hyperplane literal projection cross",
    "cosine_near_dup" -> "16-hyperplane literal projection cross",
  )

  /** Queries that are BY DESIGN one narrow map stage: the only exchange
    * their plan may contain is the final deterministic ORDER BY's range
    * exchange. A second exchange appearing here means someone introduced
    * a shuffle into a scan-shaped operator. */
  private val narrowQueries = Seq(
    "token_count", "quality_score", "text_normalize", "doc_chunking",
    "frame_sample", "multimodal_features", "pii_scrub", "projection",
    "filter", "string_funcs", "decimal_arith", "winnow_fingerprint")

  test("narrow operators stay narrow: one exchange (the final sort) only") {
    val s = spark
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    narrowQueries.foreach { name =>
      val plan = SparkEntry.queries(name)(s, dir).queryExecution.executedPlan.toString
      val n = "(?<!Broadcast)Exchange ".r.findAllIn(plan).size
      if (n > 1) offenders += s"$name: $n exchanges"
      graft.HarnessUtil.releaseAll(s)
    }
    assert(offenders.isEmpty, s"narrow-plan violations:\n  ${offenders.mkString("\n  ")}")
  }

  test("no query plans a CartesianProduct; BNLJ only on bounded literal sides") {
    val s = spark
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(s, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed.contains(name))
        offenders += s"$name: unallowlisted BroadcastNestedLoopJoin"
      graft.HarnessUtil.releaseAll(s)
    }
    assert(offenders.isEmpty, s"plan guard violations:\n  ${offenders.mkString("\n  ")}")
  }
}
