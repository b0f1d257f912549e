package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression converters — needed
  * by expressions that cannot go through the FunctionRegistry because
  * they carry a non-Expression constructor argument (e.g.
  * [[graft.functions.MightContainBloomBc]] holds a `Broadcast[BloomFilter]`;
  * a registry builder only receives child Expressions, so a broadcast
  * handle can never arrive through `call_function`). Uses only public
  * Spark classes; lives in this package purely for the `private[sql]`
  * access scope. */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
