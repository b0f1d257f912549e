package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native qdot expression: interpreted + codegen paths, SQL registration
  * via GraftExtensions, equivalence with the zip_with/aggregate form. */
class QDotSpec extends SparkSpec {

  test("qdot == aggregate(zip_with) on the embeddings table") {
    val s = spark
    import s.implicits._
    val emb = graft.Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))").as("qv"))
      .limit(50).cache()
    val a = emb.toDF("ida", "qa")
    val b = emb.toDF("idb", "qb")
    val both = a.crossJoin(b)
      .select(
        QDot(col("qa"), col("qb")).as("native"),
        expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, x) -> acc + x)").as("lambda"))
    assert(both.filter("native <> lambda").count() == 0)
    assert(both.count() == 2500)
  }

  test("qdot null/edge semantics") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L, 6L))),  // 4+10+18 = 32
      (Some(Seq(1L, 2L)), Some(Seq(3L))),              // length mismatch -> null
      (None, Some(Seq(1L))),                           // null input -> null
      (Some(Seq.empty[Long]), Some(Seq.empty[Long]))). // 0
      toDF("a", "b")
    val out = df.select(QDot(col("a"), col("b")).as("d")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // mismatch is null, matching the zip_with idiom's null padding
    assert(out.toSeq == Seq(Some(32L), None, None, Some(0L)))
  }

  test("QDotRewrite: lambda dot-product idiom optimizes to native qdot") {
    val s = spark
    import s.implicits._
    // parquet-backed input (a LocalRelation would be constant-folded
    // away before user-provided optimizer rules run); containsNull=false
    // elements (the rewrite refuses nullable elements, where the lambda
    // idiom's null semantics differ from qdot's)
    val nonNullArr = "transform(sequence(1, 64), i -> i * (coalesce(vec_id, 0) + 1)) AS a"
    val q = graft.Tables.embeddings(s, "/root/testdata/sf0.001")
      .selectExpr(nonNullArr)
      .selectExpr("aggregate(zip_with(a, a, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("qdot"), s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("zip_with"))
    assert(q.count() == 500)
    // guards that must NOT rewrite: wrong zero, and nullable elements
    val wrongZero = graft.Tables.embeddings(s, "/root/testdata/sf0.001")
      .selectExpr(nonNullArr)
      .selectExpr("aggregate(zip_with(a, a, (x, y) -> x * y), 1L, (acc, v) -> acc + v) AS d")
    assert(!wrongZero.queryExecution.optimizedPlan.toString.contains("qdot"))
    val nullable = graft.Tables.embeddings(s, "/root/testdata/sf0.001")
      .selectExpr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS a")
      .selectExpr("aggregate(zip_with(a, a, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d")
    assert(!nullable.queryExecution.optimizedPlan.toString.contains("qdot"))
  }

  test("qdot overflow: ANSI raises, legacy wraps, TRY is never rewritten") {
    val s = spark
    // Spark 4 defaults ANSI on; the registry builder captures the session
    // flag at analysis time, so the SQL form must raise on long overflow
    assert(s.conf.get("spark.sql.ansi.enabled") == "true")
    val err = intercept[Exception](
      s.sql(s"SELECT qdot(array(${Long.MaxValue}L), array(2L))").collect())
    assert(err.getMessage.toUpperCase.contains("ARITHMETIC_OVERFLOW") ||
      err.getMessage.toLowerCase.contains("overflow"), err.getMessage)
    try {
      s.conf.set("spark.sql.ansi.enabled", "false")
      val wrapped = s.sql(s"SELECT qdot(array(${Long.MaxValue}L), array(2L)) AS d")
        .collect().head.getLong(0)
      assert(wrapped == Long.MaxValue * 2L) // wraps to -2
    } finally s.conf.set("spark.sql.ansi.enabled", "true")
    // TRY-mode lambdas (overflow -> NULL) have no qdot equivalent: the
    // optimizer rewrite must leave them alone
    val tryQ = graft.Tables.embeddings(s, "/root/testdata/sf0.001")
      .selectExpr("transform(sequence(1, 8), i -> i * (coalesce(vec_id, 0) + 1)) AS a")
      .selectExpr("aggregate(zip_with(a, a, (x, y) -> try_multiply(x, y)), 0L, (acc, v) -> try_add(acc, v)) AS d")
    assert(!tryQ.queryExecution.optimizedPlan.toString.contains("qdot"))
  }

  test("qdot ANSI corner: mismatched lengths with overflowing prefix raises like the lambda") {
    val s = spark
    assert(s.conf.get("spark.sql.ansi.enabled") == "true")
    // zip_with multiplies the real prefix pairs before null-padding, so
    // the lambda idiom raises here; qdot must evaluate the prefix before
    // returning the mismatch null to match (this was a rewrite-soundness
    // corner: error → null would be a semantics change)
    val err = intercept[Exception](
      s.sql(s"SELECT qdot(array(${Long.MaxValue}L, 1L), array(2L))").collect())
    assert(err.getMessage.toUpperCase.contains("ARITHMETIC_OVERFLOW") ||
      err.getMessage.toLowerCase.contains("overflow"), err.getMessage)
    // and with a non-overflowing prefix, mismatch is still null in ANSI
    val r = s.sql("SELECT qdot(array(1L, 2L), array(3L)) AS d").collect().head
    assert(r.isNullAt(0))
  }

  test("qdot registered in SQL via GraftExtensions") {
    // SparkSpec's session is built withExtensions(new GraftExtensions)
    val res = spark.sql("SELECT qdot(array(1L, 2L), array(10L, 20L)) AS d")
      .collect().head.getLong(0)
    assert(res == 50L)
    // wrong arity → analysis error naming the function
    val err = intercept[Exception](
      spark.sql("SELECT qdot(array(1L))").collect())
    assert(err.getMessage.toLowerCase.contains("qdot"))
  }
}
