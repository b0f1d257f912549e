package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain_bloom(filter_bytes, str)` — Bloom-filter membership as
  * a native codegen expression, for prefilters that run once per row of
  * a corpus-sized stream (e.g. the decontamination gram prune, the one
  * place a Scala UDF used to break whole-stage codegen on the hottest
  * scan).
  *
  * `filter_bytes` must be FOLDABLE (a binary literal holding the
  * serialized `org.apache.spark.util.sketch.BloomFilter`, the format
  * `df.stat.bloomFilter` writes via `writeTo`). The deserialized filter
  * lands in the generated plan's reference array, which rides Spark's
  * task-binary broadcast: the BYTES cross the wire once per executor,
  * but each task deserializes its task binary, so the BloomFilter object
  * is rebuilt once per TASK (and the literal's byte array is also
  * copied/hashed through every optimizer and AQE canonicalization pass).
  * That per-task/per-pass cost is fine for small filters; for large ones
  * (the operator's own sizing puts a 100M-gram benchmark suite at
  * ~120 MB) use [[MightContainBloomBc]], which ships the filter via a
  * `SparkContext.broadcast` handle instead — this literal form exists
  * for the SQL-registry surface and should be treated as having a
  * low-MB filter-size ceiling.
  * Membership is tested against the value's UTF-8 bytes
  * (`mightContainBinary(getBytes)`), bit-identical to
  * `mightContainString` (which UTF-8-encodes and delegates) but with no
  * per-row String materialization.
  */
case class MightContainBloom(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "might_contain_bloom requires a foldable (literal) serialized filter")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"might_contain_bloom requires (binary, string) arguments, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bloom"

  // a null filter means "no filter": the expression is null (filtered out),
  // matching SQL three-valued logic for a null argument
  override def nullable: Boolean = true

  /** Deserialized once per (driver codegen | executor interpreted-eval)
    * instance; the deserialized object — not the bytes — lands in the
    * codegen reference array. */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) return null
    val v = right.eval(input)
    if (v == null) null
    else bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (bloom == null) {
      // fold to NULL at codegen time — no per-row work for a null filter
      ev.copy(code =
        code"""
          boolean ${ev.isNull} = true;
          boolean ${ev.value} = false;""")
    } else {
      val ref = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
      // the left (literal bytes) evaluation this emits is a dead reference
      // load — the actual filter rides the codegen reference array
      nullSafeCodeGen(ctx, ev, (_, v) =>
        s"${ev.value} = $ref.mightContainBinary($v.getBytes());")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[MightContainBloom]]'s scale form: the filter arrives as a
  * `Broadcast[BloomFilter]` handle instead of an inline literal. The
  * plan carries only the (tiny, serializable) broadcast reference;
  * the filter bytes move via Spark's torrent broadcast ONCE per
  * executor, and `Broadcast.value` caches the deserialized object per
  * executor JVM — so neither optimizer canonicalization, AQE re-plans,
  * nor per-task binary deserialization ever touch the filter bytes
  * again. Codegen hoists `value()` into generated-class init (once per
  * task, a cached-field read), keeping the per-row work identical to
  * the literal form: one `mightContainBinary` over the UTF-8 bytes.
  *
  * Not SQL-registrable (a registry builder can't carry a broadcast
  * handle) — construct via [[MightContainBloomBc.onCol]]. */
case class MightContainBloomBc(
    bloomBc: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"might_contain_bloom_bc requires a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bloom_bc"

  override protected def nullSafeEval(v: Any): Any =
    bloomBc.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per generated-class instance (= per
    // task); value() itself is a per-executor cached deserialization
    val bf = ctx.addMutableState(bfClass, "bloomBcValue",
      v => s"$v = ($bfClass) $ref.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $bf.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MightContainBloomBc {
  /** `might_contain_bloom_bc(bc, strCol)` as a Column (Scala API only). */
  def onCol(bc: Broadcast[BloomFilter], c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShim.column(
      MightContainBloomBc(bc, org.apache.spark.sql.GraftShim.expression(c)))
}

object MightContainBloom {
  private[functions] val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "might_contain_bloom(filter_bytes, str) takes exactly 2 arguments")
    MightContainBloom(children.head, children(1))
  }

  /** Serialize a driver-side filter for embedding as the literal arg. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
