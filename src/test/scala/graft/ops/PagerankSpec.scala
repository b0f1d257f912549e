package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pagerank_docs: the distributed integer recursion must equal a plain
  * Scala recompute on the same edge set, every mass respects the
  * teleport floor, and structural symmetry (same in/out neighborhoods)
  * yields identical mass. */
class PagerankSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("equals scratch integer recursion; teleport floor; symmetry") {
    val s = spark
    import s.implicits._
    val got = Dedup.pagerankDocs(s, dir)
      .as[(Long, Long, Long)].collect().toVector
    assert(got.nonEmpty)
    assert(got.forall(_._2 >= 150000L), "teleport floor")

    // scratch recompute on the operator's own pair set
    val jp = Dedup.ngramJaccardPairs(s, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val edges = jp.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inbound = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var p: Map[Long, Long] = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val out = p.map { case (v, m) => v -> m / deg(v) }
      p = deg.keys.map { v =>
        v -> (150000L + inbound.getOrElse(v, Array.empty[Long])
          .map(u => out(u) * 850000L / 1000000L).sum)
      }.toMap
    }
    assert(got.map(r => r._1 -> r._2).toMap == p)
    assert(got.forall { case (v, _, d) => d == deg(v) })

    // symmetry: an isolated mutual pair (both degree 1, pointing at each
    // other) is a 2-cycle automorphism — equal mass by construction
    val isolatedPairs = jp.filter { case (a, b) => deg(a) == 1 && deg(b) == 1 }
    assert(isolatedPairs.nonEmpty, "fixture premise: an isolated dup pair exists")
    isolatedPairs.foreach { case (a, b) =>
      assert(p(a) == p(b), s"2-cycle asymmetry: $a=${p(a)} $b=${p(b)}")
    }
  }

  test("central survivors: one canonical per cluster, the in-cluster pr argmax") {
    val s = spark
    import s.implicits._
    val clusters = Dedup.dedupClusters(s, dir)
      .select("cluster_id", "members").as[(Long, String)].collect()
      .map { case (cid, m) => cid -> m.split(",").map(_.toLong).toVector }.toMap
    val pr = Dedup.pagerankDocs(s, dir)
      .select("doc_id", "pr_micro").as[(Long, Long)].collect().toMap
    val got = Dedup.dedupCentralSurvivors(s, dir)
      .as[(Long, Long, Long, Long)].collect().toVector
    assert(got.map(_._1).toSet == clusters.keySet, "same cluster ids as dedup_clusters")
    got.foreach { case (cid, canonical, prMicro, size) =>
      val members = clusters(cid)
      assert(size == members.length)
      assert(members.contains(canonical))
      val want = members.map(d => (-pr(d), d)).min._2
      assert(canonical == want, s"cluster $cid: $canonical != argmax $want")
      assert(prMicro == pr(canonical))
    }
  }
}
