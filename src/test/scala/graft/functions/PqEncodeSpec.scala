package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PqEncode replaced the compositional encode (per subspace: array_min
  * over K struct(d2, cid) qdot expansions) because at the production
  * shape that form blew Janino's 64 KB method limit and silently ran
  * interpreted. The contract this spec pins: (1) the native expression
  * computes EXACTLY the compositional form's codes — argmin of int64
  * L2², ties to the lowest centroid id; (2) the plan actually compiles
  * with codegen fallback DISABLED (the failure mode was silent); (3)
  * null/length edges. */
class PqEncodeSpec extends SparkSpec {

  private val M = 4        // subspaces (spec-sized; prod is 8×64)
  private val SubDim = 3
  private val K = 5

  // deterministic small codebook: centroid values spread so ties occur
  private val books: Seq[Seq[Seq[Long]]] =
    Seq.tabulate(M, K, SubDim)((m, k, i) => ((m + k + i) % 4).toLong * 2)

  private def compositionalCodes(vec: Seq[Long]): Seq[Long] =
    (0 until M).map { m =>
      val sub = vec.slice(m * SubDim, (m + 1) * SubDim)
      books(m).zipWithIndex.map { case (cv, cid) =>
        (sub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2.toLong
    }

  test("codes equal the array_min(struct(d2, cid)) form, ties to lowest cid") {
    val s = spark
    import s.implicits._
    val vecs = Seq.tabulate(64)(r => (r.toLong,
      Seq.tabulate(M * SubDim)(i => ((r * 7 + i * 3) % 9).toLong - 2)))
    val df = vecs.toDF("id", "vec")
      .select(col("id"), PqEncode(col("vec"), typedLit(books)).as("codes"))
    val got = df.as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == compositionalCodes(v), s"vec $id")
    }
  }

  test("whole-stage codegen compiles with fallback disabled (the silent-interpreted trap)") {
    val s = spark
    import s.implicits._
    val prevFallback = s.conf.get("spark.sql.codegen.fallback")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = (0L until 32L).map(r =>
          (r, Seq.tabulate(M * SubDim)(i => (r + i).toLong)))
        .toDF("id", "vec")
        .select(col("id"), PqEncode(col("vec"), typedLit(books)).as("codes"))
        // a sort downstream, like the real query's top-k window
        .orderBy("id")
      assert(df.collect().length == 32)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"expected whole-stage codegen spans:\n$plan")
    } finally s.conf.set("spark.sql.codegen.fallback", prevFallback)
  }

  test("null vector and length mismatch return null; interpreted eval agrees") {
    val s = spark
    import s.implicits._
    val df = Seq(
        (1L, Option(Seq.tabulate(M * SubDim)(_.toLong))),
        (2L, Option(Seq(1L, 2L))), // wrong length
        (3L, Option.empty[Seq[Long]]))
      .toDF("id", "vec")
      .select(col("id"), PqEncode(col("vec"), typedLit(books)).as("codes"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isDefined)
    assert(rows(2L).isEmpty, "length mismatch must be null")
    assert(rows(3L).isEmpty, "null vec must be null")
    // interpreted path: eval the expression directly
    val lit2 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq.tabulate(M * SubDim)(_.toLong),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val booksLit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      books, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val evald = PqEncode(lit2, booksLit).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(evald == compositionalCodes(Seq.tabulate(M * SubDim)(_.toLong)),
      "interpreted eval must agree with codegen")
  }
}
