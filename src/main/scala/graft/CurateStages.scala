package graft

import org.apache.spark.sql.SparkSession

/** Per-stage wall-clock recorder for `curate_manifest` — the breakdown
  * the round-8 verdict asked for, so the 2×-regression guard can re-arm
  * against the post-collapse definition of the query:
  *
  *   sbt "runMain graft.CurateStages"   (SPARK_GRAFT_SF_DIR selects SF)
  *
  * The composed pipeline does nearly all its work EAGERLY at
  * construction: the shared tokenize checkpoint, the collapse stage's
  * pair-graph + cluster resolution, the decontamination Bloom build, and
  * — because `groupedRowNumber`/`globalPrefixSum` are themselves eager —
  * the quota and pack marks, whose construction EXECUTES the lazy middle
  * of the pipeline (quality filter, exact-dedup semi-join, the
  * collapse/contamination anti-joins). The breakdown is therefore the
  * construction marks from [[graft.ops.PipelineOps.curateStages]]'
  * timing callback plus one `final_plan_execution` row (the composed
  * plan over already-checkpointed data). Reported values are the median
  * of three runs after a warm-up. Emits a markdown table for
  * docs/CURATE_STAGES_r9.md. */
object CurateStages {
  private val Runs = 3
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sample(): Seq[(String, Double)] = {
      val marks = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      val t0 = System.nanoTime()
      val f = graft.ops.PipelineOps.curateStages(spark, sfDir,
        (label, sec) => { marks += (label -> sec); () })
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      f.manifest.count()
      // NOTE: quota/pack are NOT here — groupedRowNumber/globalPrefixSum
      // are eager, so the quality filter, exact-dedup semi-join, and the
      // collapse/contamination anti-joins all execute inside the
      // quota_grouped_rank construction mark; this row is only the final
      // composed plan (the orderBy + projection over checkpointed data)
      marks += ("final_plan_execution" ->
        (System.nanoTime() - t1) / 1e9)
      marks += ("TOTAL" -> (tBuild + (System.nanoTime() - t1) / 1e9))
      HarnessUtil.releaseAll(spark, gc = true)
      marks.toSeq
    }
    sample() // warm-up (JIT/codegen; not recorded)
    val runs = (1 to Runs).map(_ => sample())
    val labels = runs.head.map(_._1)
    println("| stage | median s (of 3) |")
    println("|---|---|")
    labels.zipWithIndex.foreach { case (label, i) =>
      val med = runs.map(_(i)._2).sorted.apply(Runs / 2)
      println(f"| $label | $med%.2f |")
    }
    println(s"\nsf=$sfDir")
    spark.stop()
  }
}
