package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The broadcast-state analogue must actually SEE rule snapshots
  * published between micro-batches (per-batch re-planning), must add no
  * shuffle or fan-out to the event side, and the naive stream–static
  * join it replaces must be PROVEN broken (pinned failure), or the
  * foreachBatch indirection is unjustified complexity. */
object DynamicRulesSpec {
  final case class Ev(event_id: Long, event_type: String, value: Double)
}

class DynamicRulesSpec extends SparkSpec {
  import DynamicRules._
  import DynamicRulesSpec.Ev

  test("rules published between micro-batches apply from the next trigger") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rulesPath = java.nio.file.Files.createTempDirectory("rules").toString + "/r"

    publish(s, rulesPath, Seq(Rule("purchase", 50.0, "big_spender")))
    val out = new scala.collection.mutable.ArrayBuffer[(Long, String)]
    val input = MemoryStream[Ev]
    val q = DynamicRules.start(input.toDF(), rulesPath) { (batch, _) =>
      val rows = batch.select("event_id", "rule_tag")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      out.synchronized { out ++= rows }
    }
    try {
      input.addData(Ev(1, "purchase", 100.0), Ev(2, "purchase", 10.0),
        Ev(3, "view", 999.0))
      q.processAllAvailable()

      // v2: views become taggable, purchases effectively untaggable
      publish(s, rulesPath,
        Seq(Rule("view", 500.0, "hot_view"), Rule("purchase", 1e9, "whale")))
      input.addData(Ev(4, "purchase", 100.0), Ev(5, "view", 999.0),
        Ev(6, "view", 10.0))
      q.processAllAvailable()

      assert(out.toMap == Map(
        1L -> "big_spender", 2L -> "none", 3L -> "none", // v1 rules
        4L -> "none", 5L -> "hot_view", 6L -> "none"))   // v2 rules
    } finally q.stop()
  }

  test("plan: broadcast join, zero exchanges on the event side, no fan-out") {
    val s = spark
    import s.implicits._
    val rulesPath = java.nio.file.Files.createTempDirectory("rules2").toString + "/r"
    publish(s, rulesPath, Seq(Rule("a", 1.0, "t1"), Rule("b", 2.0, "t2")))

    val events = Seq(Ev(1, "a", 5.0), Ev(2, "a", 0.5), Ev(3, "c", 5.0)).toDF()
    val enriched = enrich(events, rulesPath)
    val plan = enriched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the event side must not shuffle:\n$plan")
    val got = enriched.as[(Long, String, Double, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map(1L -> "t1", 2L -> "none", 3L -> "none"),
      "left join must not fan out and must tag by threshold")
  }

  test("publish is a versioned pointer flip: old snapshots survive it, pruning is bounded") {
    val s = spark
    import s.implicits._
    val rulesPath = java.nio.file.Files.createTempDirectory("rules4").toString + "/r"

    // enrich before any publish fails loudly, never silently tags 'none'
    val events = Seq(Ev(1, "a", 5.0)).toDF()
    val e = intercept[IllegalArgumentException](enrich(events, rulesPath))
    assert(e.getMessage.contains("no snapshot published"))

    publish(s, rulesPath, Seq(Rule("a", 1.0, "v1")))
    val v1Dir = currentSnapshot(s, rulesPath)
    // a reader that resolved the pointer BEFORE the next publish — the
    // concurrent-publish shape: its files must stay readable afterwards
    val pinnedV1 = s.read.parquet(v1Dir)

    publish(s, rulesPath, Seq(Rule("a", 1.0, "v2")))
    assert(currentSnapshot(s, rulesPath) != v1Dir, "pointer must advance")
    assert(pinnedV1.collect().map(_.getString(2)).toSeq == Seq("v1"),
      "an in-flight reader's snapshot files must survive a publish")
    assert(enrich(events, rulesPath).select("rule_tag").head.getString(0) == "v2")

    // prune keeps the newest KeepVersions dirs (CURRENT's always among them)
    (3 to 7).foreach(i => publish(s, rulesPath, Seq(Rule("a", 1.0, s"v$i"))))
    val dirs = new java.io.File(rulesPath).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d{8}")).map(_.getName).sorted
    assert(dirs.length == DynamicRules.KeepVersions, s"pruned to $dirs")
    assert(dirs.last == "v00000007")
    assert(enrich(events, rulesPath).select("rule_tag").head.getString(0) == "v7")
  }

  test("pinned failure: a naive stream-static join dies when its snapshot dir is overwritten in place") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rulesPath = java.nio.file.Files.createTempDirectory("rules3").toString + "/r"
    // the legacy publish idiom the versioned publish() replaces: one
    // directory, overwritten in place (delete-then-commit)
    def rawOverwrite(tag: String): Unit =
      Seq(("purchase", 50.0, tag)).toDF("eventType", "minValue", "tag")
        .coalesce(1).write.mode("overwrite").parquet(rulesPath)
    rawOverwrite("v1")

    val input = MemoryStream[Ev]
    // the shortcut this module exists to replace: static side resolved
    // ONCE at query start, against the in-place-overwritten directory
    val rules = s.read.parquet(rulesPath)
      .select(col("eventType").as("event_type"), col("minValue"), col("tag"))
    val q = input.toDF().join(broadcast(rules), Seq("event_type"), "left")
      .select(col("event_id"), coalesce(col("tag"), lit("none")).as("rule_tag"))
      .writeStream.format("memory").queryName("naive_ruled")
      .outputMode("append").start()
    try quietly {
      input.addData(Ev(1, "purchase", 100.0))
      q.processAllAvailable()
      rawOverwrite("v2")
      input.addData(Ev(2, "purchase", 100.0))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.toString +: causes(x.getCause))
      assert(causes(e).exists(_.contains("FAILED_READ_FILE")),
        s"expected the pinned file-index failure, got: $e")
    } finally quietly(q.stop())
  }
}
