package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper (kept outside the case class so generated Java can call
  * it as a plain static method without Scala companion indirection). */
object Hash60Impl {
  /** First 60 bits of md5(s) as a non-negative int64 — bit-identical to
    * `conv(substr(md5(s), 1, 15), 16, 10)`: 15 hex digits = the first
    * 7 digest bytes plus the high nibble of the 8th. */
  def compute(s: UTF8String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** Native form of the engine's determinism hash (Prims.hash60): reads
  * the md5 digest bytes directly instead of materializing the 32-char
  * hex string, substring-ing it, and radix-parsing it back — three
  * allocations and a parse removed from the single hottest scalar in
  * the dedup/sketch family (every shingle, token, and band signature
  * goes through it). Value is provably identical to the composed form
  * (Hash60Spec property-checks them against each other). */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hash60 requires a string argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Impl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60Impl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {
  private[functions] val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "hash60(str) takes exactly 1 argument")
    Hash60(children.head)
  }
}
