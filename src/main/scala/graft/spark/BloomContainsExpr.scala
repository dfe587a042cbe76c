package graft.spark

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression for broadcast-Bloom membership:
  * `graft_bloom_contains(bloomBytes, hash)` — true iff `hash` MIGHT be in
  * the serialized [[BloomFilter]] `bloomBytes` (no false negatives).
  *
  * Why an Expression and not a UDF: the probe sits map-side on the 100 TB
  * side of decontamination ([[graft.ops.CorpusOps.decontaminateBloom]]),
  * exactly the hot path where a ScalaUDF breaks whole-stage codegen and
  * pays per-row boxing. This compiles to one virtual call on a
  * pre-deserialized filter inside the generated loop, keeping the stage
  * fully codegen'd (PlanSpec asserts no ScalaUDF in the d7 plan).
  *
  * The filter bytes ride the plan as a foldable binary literal — the same
  * shipping model as Spark's own `BloomFilterMightContain` runtime filter
  * (the task binary is itself broadcast once per stage, so the bytes do
  * NOT re-ship per task), and deserialization happens once per executor
  * via the transient lazy val, not per row.
  */
case class BloomContains(bloom: Expression, value: Expression) extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, value.dataType) match {
      case (BinaryType, LongType) if bloom.foldable => TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains requires a foldable (literal) bloom-filter argument")
      case (b, v) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains requires (binary, bigint), got (${b.catalogString}, ${v.catalogString})")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Invoked from generated code — keeps the filter behind this
    * expression's lazy val so only standard Java serialization of the
    * byte-array literal is ever needed. */
  def contains(h: Long): Boolean = filter.mightContainLong(h)

  override protected def nullSafeEval(bloomBytes: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomExpr", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.contains($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(bloom = newLeft, value = newRight)
}
