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
  *
  * Null semantics: null if either side is null (standard binary
  * expression), and null on LENGTH MISMATCH — matching the
  * zip_with+aggregate lambda idiom, whose null padding poisons the sum
  * (QDotRewrite's safety argument relies on this equivalence). The
  * common-prefix arithmetic runs BEFORE the mismatch null is returned:
  * zip_with materializes every real-pair product first, so in ANSI mode
  * a prefix overflow raises even when the lengths differ — evaluating
  * the prefix keeps that order, making the rewrite exact in that corner
  * too (legacy wrap mode can't raise, so the order is unobservable
  * there).
  *
  * Overflow semantics follow `failOnError` (the session's ANSI flag at
  * construction): wrapping int64 arithmetic when false (legacy mode),
  * Spark's ARITHMETIC_OVERFLOW error when true — so the expression is
  * interchangeable with the ANSI-mode lambda idiom too.
  */
case class QDot(left: Expression, right: Expression, failOnError: Boolean = false)
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
    val na = a.numElements()
    val nb = b.numElements()
    if (failOnError) {
      // ANSI: evaluate the common prefix FIRST (may raise on overflow,
      // matching zip_with's eager real-pair products), then null on
      // mismatch
      val n = math.min(na, nb)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc = org.apache.spark.sql.catalyst.util.MathUtils.addExact(acc,
          org.apache.spark.sql.catalyst.util.MathUtils.multiplyExact(
            a.getLong(i), b.getLong(i)))
        i += 1
      }
      if (na != nb) null else acc
    } else if (na != nb) {
      // legacy wrap mode can't raise, so the prefix is unobservable —
      // keep the O(1) mismatch exit
      null
    } else {
      var acc = 0L
      var i = 0
      while (i < na) {
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
      val mu = "org.apache.spark.sql.catalyst.util.MathUtils"
      val step =
        if (failOnError)
          s"$acc = $mu.addExact($acc, $mu.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else
          s"$acc += $a.getLong($i) * $b.getLong($i);"
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      if (failOnError)
        // ANSI: prefix first (may raise), then the mismatch null
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $n = $na < $nb ? $na : $nb;
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $step
           |}
           |if ($na != $nb) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      else
        // legacy: O(1) mismatch exit (wrap mode can't raise)
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $step
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

  /** Registry builder shared by GraftExtensions and ensure(): overflow
    * behavior follows the session's ANSI setting at analysis time. */
  private[functions] val builder:
      Seq[Expression] => Expression = { children =>
    require(children.length == 2, "qdot(arrayA, arrayB) takes exactly 2 arguments")
    QDot(children.head, children(1),
      failOnError = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
  }
}
