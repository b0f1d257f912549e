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
    * LENGTHS are safe either way: zip_with's null padding makes the
    * idiom null, and qdot nulls on mismatch by definition. */
  private def isLongArray(e: Expression) = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** (x, y) -> x * y over exactly the lambda's own variables. */
  private def isMulLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedExpression, r: NamedExpression, _),
                        Seq(x: NamedExpression, y: NamedExpression), _) =>
      (l.exprId == x.exprId && r.exprId == y.exprId) ||
        (l.exprId == y.exprId && r.exprId == x.exprId)
    case _ => false
  }

  /** (acc, v) -> acc + v over exactly the lambda's own variables. */
  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedExpression, r: NamedExpression, _),
                        Seq(acc: NamedExpression, v: NamedExpression), _) =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
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
          if isLongArray(a) && isLongArray(b) && isMulLambda(mergeFn) &&
            isZeroL(zero) && isAddLambda(aggFn) && isIdentity(finishFn) =>
        QDot(a, b)
    }
}
