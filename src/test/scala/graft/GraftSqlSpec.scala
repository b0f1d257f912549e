package graft

class GraftSqlSpec extends SparkSpec {

  test("SQL layer: registered views answer ad-hoc SQL incl. native functions") {
    val dir = "/root/testdata/sf0.001"
    val top = Graft.sql(spark, dir,
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("A", "N", "R"))

    // events view carries the normalized timestamp (nanos → micros)
    val ts = Graft.sql(spark, dir,
      "SELECT min(ts) IS NOT NULL AS ok FROM events").collect().head.getBoolean(0)
    assert(ts)

    // native function reachable from SQL over a view
    val dot = Graft.sql(spark, dir,
      """SELECT qdot(
        |  transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)),
        |  transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))) AS n2
        |FROM embeddings WHERE vec_id = 0""".stripMargin).collect().head.getLong(0)
    assert(dot > 0)
  }

  test("SQL layer inherits the serving layout: ad-hoc ts-range SQL prunes day directories") {
    val dir = "/root/testdata/sf0.001"
    val noLayout = Graft.sql(spark, dir,
      """SELECT count(*) AS n FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'""".stripMargin)
      .collect().head.getLong(0)
    spark.conf.set(graft.storage.Layout.EventsEnabledKey, "true")
    try {
      val q = Graft.sql(spark, dir,
        """SELECT count(*) AS n FROM events
          |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'""".stripMargin)
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val scanned = plan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount }
        .getOrElse(fail("no FileSourceScanExec under the SQL view"))
      // a SQL user writing plain WHERE ts >= ... gets the same exact
      // 7-of-30 directory pruning the DataFrame path gets (sharp
      // midnight upper) — view + inference rule compose, no
      // layout-aware SQL required
      assert(scanned == 7, s"expected 7 of 30 day directories, scanned $scanned")
      assert(q.collect().head.getLong(0) == noLayout,
        "SQL over the layout diverged from the raw view")
    } finally {
      spark.conf.set(graft.storage.Layout.EventsEnabledKey, "false")
      HarnessUtil.releaseAll(spark)
    }
  }
}
