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
}
