package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingSemanticDedup.SemPair

/** Online semantic near-dup detection against a literal codebook
  * (train-offline / serve-online): cluster-local pairing, tau gating,
  * and the hub-star cap. */
class StreamingSemanticDedupSpec extends SparkSpec {

  private val Dim = 64
  private def v(parts: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(Dim)(0.0f)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }
  // two centroids, far apart in quantized space: cluster 0 lives around
  // +dims 0/1, cluster 1 around their negatives
  private val codebook: Seq[(Long, Seq[Long])] = Seq(
    0L -> (Seq(500L, 500L) ++ Seq.fill(Dim - 2)(0L)),
    1L -> (Seq(-500L, -500L) ++ Seq.fill(Dim - 2)(0L)))

  test("same-cluster near-identical vectors pair; orthogonal and cross-cluster never") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingSemanticDedup(
        input.toDF().toDF("vec_id", "embedding"), codebook, tau = 0.4)
      .writeStream.format("memory").queryName("ssd")
      .outputMode("append").start()
    try {
      // 1: along dim0 (cluster 0); 2: along dim1 (cluster 0, cosine 0 to 1);
      // 10: negative quadrant (cluster 1)
      input.addData((1L, v(0 -> 1.0f)), (2L, v(1 -> 1.0f)), (10L, v(0 -> -1.0f, 1 -> -0.01f)))
      q.processAllAvailable()
      assert(s.table("ssd").as[SemPair].collect().isEmpty,
        "orthogonal same-cluster and cross-cluster vectors must not pair")
      // 3: near-copy of 1 -> pairs with 1 (cosine ~1), not with 2
      input.addData((3L, v(0 -> 0.999f, 1 -> 0.01f)))
      q.processAllAvailable()
      val got = s.table("ssd").as[SemPair].collect()
      assert(got.map(p => (p.vecA, p.vecB)).toSet == Set((1L, 3L)), s"got ${got.toSeq}")
      assert(got.head.cluster == 0L && got.head.cosine >= 0.4)
    } finally q.stop()
  }

  test("cluster past the cap freezes state: arrivals fan out O(cap), are not remembered") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingSemanticDedup(
        input.toDF().toDF("vec_id", "embedding"), codebook, tau = 0.4, cap = 2)
      .writeStream.format("memory").queryName("ssd_cap")
      .outputMode("append").start()
    try {
      // four near-identical vectors, cap 2: 1/2 insert and pair fully;
      // 3/4 arrive at occupancy == cap — still compared against BOTH
      // remembered members (the batch `cn <= maxCluster` boundary) but
      // never remembered themselves, so (3,4) is NOT emitted: state
      // froze at {1,2}
      input.addData((1L to 4L).map(i => (i, v(0 -> 1.0f, 1 -> (0.001f * i)))): _*)
      q.processAllAvailable()
      val got = s.table("ssd_cap").as[SemPair].collect().map(p => (p.vecA, p.vecB)).toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)), s"got $got")
    } finally q.stop()
  }

  test("withIndex cap boundary: index AT the cap compares fully, BEYOND it hubs (batch <=/> rule)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // stream vector 10 is a near-copy of index member 2 (orthogonal to
    // member 1 = the hub) — it pairs iff the NON-HUB member is compared
    def run(indexIds: Seq[Long], name: String): Set[(Long, Long)] = {
      val index = indexIds.map {
        case 1L => (1L, v(0 -> 1.0f))
        case i  => (i, v(1 -> 1.0f, 0 -> (0.001f * i)))
      }.toDF("vec_id", "embedding")
      val input = MemoryStream[(Long, Seq[Float])]
      val q = StreamingSemanticDedup.withIndex(
          input.toDF().toDF("vec_id", "embedding"), index, codebook,
          tau = 0.4, cap = 2)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData((10L, v(1 -> 0.999f)))
        q.processAllAvailable()
        s.table(name).as[SemPair].collect().map(p => (p.vecA, p.vecB)).toSet
      } finally q.stop()
    }
    // occupancy 2 == cap: batch still all-pairs — member 2 is compared
    assert(run(Seq(1L, 2L), "ssd_at_cap") == Set((2L, 10L)))
    // occupancy 3 > cap: hub-star — only member 1 (index min, orthogonal
    // to the arrival) is compared, so nothing pairs
    assert(run(Seq(1L, 2L, 3L), "ssd_over_cap") == Set.empty[(Long, Long)])
  }
}
