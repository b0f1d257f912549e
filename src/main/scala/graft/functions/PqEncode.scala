package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: product-quantization encode of one
  * int64 vector against a FOLDABLE codebook — `pq_encode(vec, books)`
  * returns the array<bigint> of per-subspace nearest-centroid ids
  * (argmin of exact-int64 L2², ties to the lowest id).
  *
  * `books` must be a literal array<array<array<bigint>>> with shape
  * M × K × subDim; the vector's length must be M·subDim. The codebook
  * is materialized ONCE (at codegen / first eval) into a flat
  * `long[][][]`, and the whole encode generates as THREE nested loops
  * (~30 lines of bytecode).
  *
  * Why this exists: the compositional form — per subspace, `array_min`
  * over K `struct(d2, cid)` candidates each holding a qdot expansion —
  * is semantically identical but generates K·M inlined loop bodies and
  * struct writers inside one whole-stage-codegen method. At the
  * production shape (M=8, K=64) that is ~512 fused fragments, which
  * blows Janino's 64 KB method limit and silently drops the entire
  * encode stage to interpreted execution (measured: the ann_pq family's
  * "fixed floor" was exactly this fallback). A loop is the right
  * codegen unit for an argmin over a literal table; expression trees
  * are the right unit for algebra over columns.
  *
  * Determinism contract (oracle-matched): exact int64 arithmetic,
  * strict `<` argmin = lowest-(d2, cid) — bit-identical to the
  * `array_min(struct(d2, cid))` form and to the DuckDB unroll. */
case class PqEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val booksOk = right.dataType match {
      case ArrayType(ArrayType(ArrayType(LongType, _), _), _) => true
      case _ => false
    }
    if (!vecOk || !booksOk)
      TypeCheckResult.TypeCheckFailure(
        "pq_encode requires (array<bigint> vec, array<array<array<bigint>>> books), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("pq_encode books must be a literal codebook")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  /** The codebook, flattened once from the foldable child. */
  @transient private lazy val books: Array[Array[Array[Long]]] = {
    val m = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(m.numElements()) { mi =>
      val ks = m.getArray(mi)
      Array.tabulate(ks.numElements()) { ki =>
        ks.getArray(ki).toLongArray()
      }
    }
  }
  @transient private lazy val subDim = books(0)(0).length

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() != books.length * subDim) return null
    val codes = new Array[Long](books.length)
    var m = 0
    while (m < books.length) {
      var best = Long.MaxValue
      var bestK = 0
      var k = 0
      while (k < books(m).length) {
        var acc = 0L
        var i = 0
        while (i < subDim) {
          val d = vec.getLong(m * subDim + i) - books(m)(k)(i)
          acc += d * d
          i += 1
        }
        if (acc < best) { best = acc; bestK = k }
        k += 1
      }
      codes(m) = bestK.toLong
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    val sub = subDim
    val vecCode = left.genCode(ctx)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    val (v, m, k, i, acc, best, bestK, codes, d) =
      (ctx.freshName("v"), ctx.freshName("m"), ctx.freshName("k"),
        ctx.freshName("i"), ctx.freshName("acc"), ctx.freshName("best"),
        ctx.freshName("bestK"), ctx.freshName("codes"), ctx.freshName("d"))
    val body =
      s"""
         |boolean ${ev.isNull} = true;
         |$ad ${ev.value} = null;
         |if (!${vecCode.isNull}) {
         |  $ad $v = ${vecCode.value};
         |  if ($v.numElements() == $booksRef.length * $sub) {
         |    long[] $codes = new long[$booksRef.length];
         |    for (int $m = 0; $m < $booksRef.length; $m++) {
         |      long $best = Long.MAX_VALUE;
         |      int $bestK = 0;
         |      for (int $k = 0; $k < $booksRef[$m].length; $k++) {
         |        long $acc = 0L;
         |        for (int $i = 0; $i < $sub; $i++) {
         |          long $d = $v.getLong($m * $sub + $i) - $booksRef[$m][$k][$i];
         |          $acc += $d * $d;
         |        }
         |        if ($acc < $best) { $best = $acc; $bestK = $k; }
         |      }
         |      $codes[$m] = (long) $bestK;
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} = new $gad($codes);
         |  }
         |}
       """.stripMargin
    ev.copy(code = vecCode.code + code"$body")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column-API entry point (session must carry GraftExtensions). */
  def apply(vec: Column, books: Column): Column =
    call_function("pq_encode", vec, books)

  private[functions] val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "pq_encode(vec, books) takes exactly 2 arguments")
    PqEncode(children.head, children(1))
  }
}
