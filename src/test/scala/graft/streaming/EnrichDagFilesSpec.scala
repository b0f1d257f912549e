package graft.streaming

import graft.SparkSpec
import graft.sinks.Sinks
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

  test("DAG tail lands in the ES bulk sink: streaming upserts, flush cap and retry seam live") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("graft-dag-es").toString
    EnrichDagFilesSpec.esBulks.synchronized { EnrichDagFilesSpec.esBulks.clear() }
    EnrichDagFilesSpec.rejections.set(0)

    // the reference DAG's tail: enriched waybill docs upserted into an
    // index (main/HelloWorldFlink.java:203-250). bulkActions=3 over 8
    // output rows forces multiple flushes so the cap is observable; the
    // transport rejects its first call (queue full) to prove the retry
    // policy sits on the executor path of the STREAMING leg, not just
    // the batch write() the IoSpec tests cover. sleeper is the injected
    // no-op so the spec doesn't serve a real 3 s backoff.
    val transport: Seq[Sinks.Upsert] => Unit = b => {
      if (EnrichDagFilesSpec.rejections.incrementAndGet() == 1)
        throw new Sinks.RejectedExecutionFailure("queue full")
      EnrichDagFilesSpec.esBulks.synchronized { EnrichDagFilesSpec.esBulks += b }
    }
    val sink = new Sinks.EsBulkSink("bd_waybill_order", "docId", 3,
      new Sinks.RetryingTransport(transport, sleeper = _ => ()))

    // doc identity: package-level rows key by packageCode; the CEM-only
    // row a package-less flush emits (EnrichState flatMap1 semantics)
    // keys by its waybill — one live doc per waybill+package either way
    val links = MemoryStream[BIn]
    val enriched = EnrichState(links.toDS()).toDF()
      .withColumn("docId", org.apache.spark.sql.functions.expr(
        "coalesce(packageCode, waybillCode)"))
    val q = Sinks.esStream(enriched, sink, s"$dir/ckptEs").start()
    try {
      links.addData((1 to 4).flatMap { w =>
        Seq(
          BIn(s"JD$w", 1, Some(Cem(s"JD$w", "sig", "3", "site_3", "9", "m9", "pay", None, None)), None),
          BIn(s"JD$w", 2, None, Some(RouteLink(s"JD$w", s"JD$w-1", 100L))),
          BIn(s"JD$w", 3, None, Some(RouteLink(s"JD$w", s"JD$w-2", 200L))))
      }: _*)
      q.processAllAvailable()
      val bulks = EnrichDagFilesSpec.esBulks.synchronized { EnrichDagFilesSpec.esBulks.toVector }
      assert(bulks.nonEmpty && bulks.forall(_.size <= 3),
        s"flush cap breached: ${bulks.map(_.size)}") // per-partition ≤ bulkActions
      val all = bulks.flatten
      // 4 waybills × (1 package-less CEM doc + 2 package docs), keyed
      // by the coalesced doc identity
      assert(all.map(_.id).toSet ==
        (1 to 4).flatMap(w => Seq(s"JD$w", s"JD$w-1", s"JD$w-2")).toSet)
      assert(all.forall(_.index == "bd_waybill_order"))
      assert(all.head.docJson.contains("\"siteCode\":\"3\""))
      assert(EnrichDagFilesSpec.rejections.get() > bulks.size) // the rejected call really retried
    } finally q.stop()
  }
}

object EnrichDagFilesSpec {
  /** Static collector + failure injector for the executor-side streaming
    * sink test — same closure-serialization rationale as IoSpec's. */
  val esBulks: scala.collection.mutable.ArrayBuffer[Seq[Sinks.Upsert]] =
    scala.collection.mutable.ArrayBuffer()
  val rejections = new java.util.concurrent.atomic.AtomicInteger(0)
}
