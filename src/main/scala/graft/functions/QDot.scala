package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: int64 dot product of two array<bigint>
  * columns — the hot inner loop of quantized similarity search
  * (Similarity.annTopK / annLshPairs).
  *
  * Why a custom Expression instead of a UDF or zip_with+aggregate:
  * it stays inside whole-stage codegen as ONE fused loop over the two
  * ArrayData (no lambda-function call overhead per element, no
  * intermediate zipped array allocation), which is the preference order
  * the engine contract sets: native Expression > composed lambdas > UDF.
  * Null semantics: null if either side is null (standard binary
  * expression), error-free on length mismatch (stops at the shorter).
  */
case class QDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val n = a.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += a.getLong(i) * b.getLong(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QDot {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column-API entry point: qdot(a, b). Requires the session to carry
    * GraftExtensions (Column↔Expression bridges are private[sql] in
    * Spark 4, so the public path is the function registry). */
  def apply(a: Column, b: Column): Column = call_function("qdot", a, b)
}
