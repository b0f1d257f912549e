package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import EnrichDag._
import EnrichState.{Cem, In => BIn, RouteLink}
import java.nio.file.Files

/** Streaming deployment of the DAG: stage A and stage B run as two
  * independent queries chained through a parquet directory (each with
  * its own checkpoint) — the pattern that replaces Flink's in-job
  * operator chain for multi-stage stateful topologies. */
class EnrichDagFilesSpec extends SparkSpec {

  test("stage A files feed stage B as a separate streaming query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("graft-dag").toString
    val cemDir = s"$dir/cems"; val ckptA = s"$dir/ckptA"; val ckptB = s"$dir/ckptB"

    val parts = MemoryStream[PartIn]
    val qA = stageAToFiles(parts.toDS(), cemDir, ckptA)
    val links = MemoryStream[BIn]
    val qB = stageBFromFiles(s, cemDir, links.toDS())
      .writeStream.format("memory").queryName("dag_files")
      .option("checkpointLocation", ckptB)
      .outputMode(OutputMode.Append()).start()
    try {
      // links arrive first on stage B → buffered
      links.addData(
        BIn("JD1", 1, None, Some(RouteLink("JD1", "JD1-1", 100L))),
        BIn("JD1", 2, None, Some(RouteLink("JD1", "JD1-2", 200L))))
      qB.processAllAvailable()
      assert(s.table("dag_files").count() == 0)

      // stage A merges C and E partials and appends the CEM file
      parts.addData(
        PartIn("JD1", 1, Cem("JD1", "sig", "3", "site_3", null, null, null, None, None)),
        PartIn("JD1", 2, Cem("JD1", null, null, null, "9", "m9", "pay", None, None)))
      qA.processAllAvailable()

      // stage B tails the directory: CEM arrival flushes both links
      qB.processAllAvailable()
      val out = s.table("dag_files").as[EnrichState.Out].collect().sortBy(_.packageCode)
      assert(out.length == 2)
      assert(out.map(_.packageCode) sameElements Array(Some("JD1-1"), Some("JD1-2")))
      assert(out.forall(o => o.siteCode == "3" && o.busiNo == "9")) // merged from BOTH partials
    } finally { qA.stop(); qB.stop() }
  }
}
