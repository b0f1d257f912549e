package graft.ops

import graft.SparkSpec

/** The materialized pair-graph artifact (`Dedup.pairGraph`) must be a
  * pure factoring-out of the self-contained cluster-family queries:
  * write the artifact once, and every reader returns BIT-IDENTICAL rows
  * to its self-contained twin (which stays the DuckDB-oracle surface). */
class PairGraphArtifactSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("artifact readers are bit-identical to the self-contained forms") {
    val s = spark
    val art = java.nio.file.Files.createTempDirectory("graft-pairgraph").toString
    Dedup.pairGraph(s, dir, art)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toString)
    assert(rows(Dedup.clustersFromArtifact(s, art)) ==
      rows(Dedup.dedupClusters(s, dir)), "clusters reader drifted")
    assert(rows(Dedup.survivorsFromArtifact(s, dir, art)) ==
      rows(Dedup.dedupSurvivors(s, dir)), "survivors reader drifted")
    assert(rows(Dedup.jaccardFromArtifact(s, art)) ==
      rows(Dedup.ngramJaccard(s, dir)), "pair reader drifted")
    graft.HarnessUtil.releaseAll(s)
  }

  test("artifact write is overwrite-idempotent and leaves no cache entries") {
    val s = spark
    val art = java.nio.file.Files.createTempDirectory("graft-pairgraph2").toString
    Dedup.pairGraph(s, dir, art)
    val first = Dedup.clustersFromArtifact(s, art).collect().toSeq.map(_.toString)
    Dedup.pairGraph(s, dir, art) // second write must overwrite cleanly
    val second = Dedup.clustersFromArtifact(s, art).collect().toSeq.map(_.toString)
    assert(first == second)
    assert(s.sharedState.cacheManager.isEmpty,
      "pairGraph left a persisted DataFrame in the cache manager")
    graft.HarnessUtil.releaseAll(s)
  }
}
