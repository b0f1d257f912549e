package graft.streaming

import graft.SparkSpec
import graft.ops.{PipelineOps, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stateless half of the cleaning pipeline (quality metrics, PII
  * redaction) lifts to Structured Streaming UNCHANGED: both forms run
  * the same narrow Column expressions, so the streamed rows must equal
  * the batch projection of the same data — no reimplementation, one
  * definition (`TextAnalysis.qualityMetrics`, `PipelineOps.redactPii`)
  * serving both engines' execution modes. */
class StreamingLiftSpec extends SparkSpec {

  test("quality metrics + PII scrub stream equals the batch projection") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      (1L, "the quick brown fox and the lazy dog of the north"),
      (2L, "contact me at alice@example.com or +1-555-0424 thanks"),
      (3L, "word word word word word word word word word word"),
      (4L, "a diverse set of tokens covering many distinct shapes here"))
    // scrub THEN score — redacted tags flow into the metric tokens, so a
    // divergence in either stage breaks the equality
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.qualityMetrics(
        df.select(col("doc_id"), PipelineOps.redactPii(col("raw")).as("text")))
    val input = MemoryStream[(Long, String)]
    val q = pipeline(input.toDS().toDF("doc_id", "raw"))
      .writeStream.format("memory").queryName("lift1")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val live = s.table("lift1").collect().map(_.toSeq).toSet
      val batch = pipeline(rows.toDF("doc_id", "raw"))
        .collect().map(_.toSeq).toSet
      assert(live == batch, "streaming lift diverged from the batch projection")
      assert(live.nonEmpty)
    } finally q.stop()
  }
}
