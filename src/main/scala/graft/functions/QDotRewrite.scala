package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the lambda dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the native `qdot(a, b)` expression — one fused codegen loop
  * instead of two higher-order functions and an intermediate zipped
  * array. Users who write the idiomatic lambda form get the native
  * implementation for free; injected via
  * GraftExtensions (`injectOptimizerRule`), so it composes with the
  * rest of Catalyst's optimization like any built-in rule.
  */
object QDotRewrite extends Rule[LogicalPlan] {

  /** Only non-nullable elements: with a nullable element the lambda
    * idiom can yield NULL (null product poisons the sum) where qdot
    * reads the slot as 0 — rewriting would change results. Mismatched
    * LENGTHS are safe in every eval mode: zip_with's null padding makes
    * the idiom null, qdot nulls on mismatch, and qdot evaluates the
    * common-prefix arithmetic BEFORE returning that null, so an ANSI
    * prefix overflow raises in both forms (zip_with multiplies the real
    * pairs when materializing the zipped array). */
  private def isLongArray(e: Expression) = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** (x, y) -> x * y over exactly the lambda's own variables; yields the
    * multiply's eval mode so the rewrite can preserve it. */
  private def mulMode(f: Expression): Option[EvalMode.Value] = f match {
    case LambdaFunction(Multiply(l: NamedExpression, r: NamedExpression, mode),
                        Seq(x: NamedExpression, y: NamedExpression), _)
        if (l.exprId == x.exprId && r.exprId == y.exprId) ||
          (l.exprId == y.exprId && r.exprId == x.exprId) => Some(mode.evalMode)
    case _ => None
  }

  /** (acc, v) -> acc + v over exactly the lambda's own variables. */
  private def addMode(f: Expression): Option[EvalMode.Value] = f match {
    case LambdaFunction(Add(l: NamedExpression, r: NamedExpression, mode),
                        Seq(acc: NamedExpression, v: NamedExpression), _)
        if (l.exprId == acc.exprId && r.exprId == v.exprId) ||
          (l.exprId == v.exprId && r.exprId == acc.exprId) => Some(mode.evalMode)
    case _ => None
  }

  /** Mode under which the rewrite is semantics-preserving: multiply and
    * add agree, and it is LEGACY (QDot wraps) or ANSI (QDot raises
    * ARITHMETIC_OVERFLOW via failOnError). TRY — where overflow yields
    * NULL — is left to the lambda form rather than silently changed. */
  private def rewriteMode(mergeFn: Expression, aggFn: Expression): Option[EvalMode.Value] =
    (mulMode(mergeFn), addMode(aggFn)) match {
      case (Some(m1), Some(m2)) if m1 == m2 && m1 != EvalMode.TRY => Some(m1)
      case _ => None
    }

  private def isZeroL(e: Expression): Boolean = e match {
    case Literal(0L, LongType) => true
    case _ => false
  }

  /** finish lambda is the identity (the default third argument). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(b: NamedExpression, Seq(x: NamedExpression), _) =>
      b.exprId == x.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mergeFn), zero, aggFn, finishFn)
          if isLongArray(a) && isLongArray(b) && isZeroL(zero) &&
            isIdentity(finishFn) && rewriteMode(mergeFn, aggFn).isDefined =>
        QDot(a, b, failOnError = rewriteMode(mergeFn, aggFn).contains(EvalMode.ANSI))
    }
}
