package graft
import org.apache.spark.sql.SparkSession
/** Throwaway environment probe (kept minimal between uses).
  * Usage: runMain graft.Scratch <sfDir> <query>... — times each named
  * SparkEntry query with the same warm-up + clearCache protocol as Bench.
  * Or:    runMain graft.Scratch dump <sfDir> <outDir> <query>... — Verify
  * for a subset: writes each named query's parquet + a filtered
  * oracle_sql.json so tools/oracle_check.py checks just those queries. */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("dump")) return dump(args.drop(1))
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (64 * 1024).toString)) // scan-split floor - see Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    HarnessUtil.applyEnvConf(spark) // SPARK_GRAFT_CONF=k=v;... probe arms
    // same hook as Verify/Bench: probe individual queries under either
    // materialize mode (SPARK_GRAFT_MATERIALIZE_MODE=reliable)
    sys.env.get("SPARK_GRAFT_MATERIALIZE_MODE").foreach { mode =>
      spark.conf.set(graft.ops.Prims.MaterializeModeKey, mode)
      if (mode == "reliable")
        spark.sparkContext.setCheckpointDir(
          sys.env.getOrElse("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/graft_reliable_ckpt"))
    }
    // probe knobs: SPARK_GRAFT_LAYOUT=1 / SPARK_GRAFT_LAYOUT_TPCH=1 turn
    // the serving layouts on for the timed run; SPARK_GRAFT_PRINT_PLAN=1
    // dumps each query's executed plan after its timed run
    if (sys.env.get("SPARK_GRAFT_LAYOUT").contains("1"))
      spark.conf.set(graft.storage.Layout.EnabledKey, "true")
    if (sys.env.get("SPARK_GRAFT_LAYOUT_TPCH").contains("1"))
      spark.conf.set(graft.storage.Layout.TpchEnabledKey, "true")
    val printPlan = sys.env.get("SPARK_GRAFT_PRINT_PLAN").contains("1")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("word_count")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics)
          .foreach(m => { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () })
    })
    names.foreach { n =>
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        if (n == "entry") (sp, _) => SparkEntry.entry(sp)
        else SparkEntry.queries(n)
      fn(spark, sfDir).count(); HarnessUtil.releaseAll(spark)
      HarnessUtil.drainListeners(spark)
      val sb0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      HarnessUtil.drainListeners(spark)
      println(f"TIMING $n%-24s $dt%8.2fs  rows=$rows  " +
        f"shuffle=${(shuffleBytes.get() - sb0) / 1024.0 / 1024.0}%.2f MB")
      if (printPlan) {
        val df = fn(spark, sfDir); df.count()
        println(s"PLAN $n\n${df.queryExecution.executedPlan}")
      }
      HarnessUtil.releaseAll(spark)
    }
    spark.stop()
  }

  private def dump(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names @ _*) = args
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (64 * 1024).toString)) // scan-split floor - see Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      HarnessUtil.releaseAll(spark)
    }
    def q(s: String): String = HarnessUtil.jsonQ(s)
    val json = SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
