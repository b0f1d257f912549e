package graft.ops

import graft.{SparkSpec, SparkEntry}

/** Prims.materialize — the ONE materialization barrier (every former
  * localCheckpoint call site routes through it). Pins the contract that
  * the conf-switched mode NEVER changes query output, only the fault-
  * tolerance posture:
  *
  *   - `local` (default): eager localCheckpoint — executor-local blocks,
  *     truncated lineage; a lost executor fails the query.
  *   - `reliable`: eager checkpoint into sparkContext.setCheckpointDir —
  *     blocks survive executor loss (the 100 TB cluster posture).
  *
  * The queries chosen exercise the two materialize roles where the pin
  * is CORRECTNESS-BEARING, not just a lineage cut:
  *   - corpus_shuffle / quality_buckets ride globalRowNumber /
  *     groupedRowNumber, whose pinned monotonically_increasing_ids must
  *     be observed identically by the offsets pass and the rank
  *     projection;
  *   - dedup_clusters iterates the alternating-star loop over pinned
  *     per-round edge frames (and its output hash is the full cluster
  *     assignment).
  */
class MaterializeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def runAll(names: Seq[String]): Map[String, Seq[String]] =
    names.map { n =>
      n -> SparkEntry.queries(n)(spark, dir).toJSON.collect().toSeq
    }.toMap

  test("reliable mode produces byte-identical results to local mode") {
    val names = Seq("corpus_shuffle", "quality_buckets", "dedup_clusters")
    val local = runAll(names) // default mode

    val ckptDir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    spark.conf.set(Prims.MaterializeModeKey, "reliable")
    try {
      val reliable = runAll(names)
      names.foreach { n =>
        assert(local(n) == reliable(n),
          s"$n: reliable-mode output diverged from local-mode output")
        assert(local(n).nonEmpty, s"$n: vacuous comparison (no rows)")
      }
      // non-vacuous: reliable mode actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(ckptDir).count()
      assert(wrote > 1, "reliable mode left no checkpoint files behind")
    } finally {
      spark.conf.unset(Prims.MaterializeModeKey)
      org.apache.commons.io.FileUtils.deleteQuietly(ckptDir.toFile)
    }
  }

  test("reliable mode without a checkpoint dir fails loudly, not silently") {
    // a fresh session (no checkpoint dir inherited from the suite run)
    val s2 = spark.newSession()
    s2.conf.set(Prims.MaterializeModeKey, "reliable")
    // newSession shares the SparkContext, so the suite's checkpoint dir
    // may already be set; only assert the guard when it isn't
    if (s2.sparkContext.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        Prims.materialize(s2.range(10).toDF())
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    }
  }

  test("unknown mode is rejected") {
    val s2 = spark.newSession()
    s2.conf.set(Prims.MaterializeModeKey, "bogus")
    val e = intercept[RuntimeException] {
      Prims.materialize(s2.range(10).toDF())
    }
    assert(e.getMessage.contains("unknown mode"))
  }
}
