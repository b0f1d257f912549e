package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming-ingest end of the events layout: micro-batches land as
  * date directories under a transactional sink log, ts predicates prune
  * the sink through PartitionDateInference, sealing produces a plain
  * serving copy, and retention drops whole directories. */
class PartitionedIngestSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def scanOf(df: DataFrame) = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    plan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("ingest → prune → seal → expire: the events-table lifecycle") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("pingest").toString
    val (sink, ckpt, serving) = (s"$base/sink", s"$base/ckpt", s"$base/serving")

    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = PartitionedIngest.start(
      in.toDF().select($"_1".as("event_id"), $"_2".as("ts")), sink, ckpt)
    try {
      // two micro-batches spanning four days (the second REVISITS day 2:
      // late-arriving rows append into an existing directory)
      in.addData((1L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-02 10:00:00")),
        (3L, ts("2024-03-02 11:00:00")), (4L, ts("2024-03-03 10:00:00")))
      q.processAllAvailable()
      in.addData((5L, ts("2024-03-02 23:00:00")), (6L, ts("2024-03-04 10:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    // the sink read goes through _spark_metadata: committed rows only,
    // partition discovery intact
    val back = spark.read.parquet(sink)
    assert(back.count() == 6)
    assert(back.select("ts_date").distinct().count() == 4)

    // ts predicates prune the SINK's directories through the inference
    // rule (ts >= 03-03 → ts_date >= 03-03: days 03 and 04)
    val pruned = back.filter(col("ts") >= lit("2024-03-03").cast("timestamp"))
    assert(scanOf(pruned).selectedPartitions.partitionCount == 2,
      "sink directories must prune on the derived ts_date bound")
    assert(pruned.count() == 2)

    // seal into a plain serving layout: same rows, no metadata log
    PartitionedIngest.seal(spark, sink, serving)
    val served = spark.read.parquet(serving)
    assert(served.count() == 6)
    assert(!new java.io.File(s"$serving/_spark_metadata").exists(),
      "the sealed copy must be a plain layout, not a sink")

    // retention drops whole day directories, O(dirs), scan-free
    val dropped = PartitionedIngest.expirePartitions(spark, serving, "2024-03-02")
    assert(dropped == Seq("2024-03-01"), s"dropped: $dropped")
    assert(spark.read.parquet(serving).count() == 5)
    assert(PartitionedIngest.expirePartitions(spark, serving, "2024-03-02").isEmpty,
      "expiry must be idempotent")
  }
}
