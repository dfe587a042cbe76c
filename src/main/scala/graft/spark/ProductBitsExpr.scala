package graft.spark

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit length of the exact product of two POSITIVE longs —
  * `length(bin(a * b))` without ever forming the 64-bit product: the
  * counts this serves (corpus token totals × pair counts in
  * [[graft.ops.CorpusOps.collocationBits]]'s PMI) multiply far past
  * Long at real corpus scale (ntot ~1e13 × np ~1e6 wraps silently under
  * non-ANSI arithmetic and poisons every bits value downstream). The
  * 128-bit product is (Math.multiplyHigh, wrapped low word); its bit
  * length reads off the leading-zero counts — exact at any magnitude,
  * and equal to the naive form wherever the naive form doesn't overflow
  * (the DuckDB mirror gets the same widening from HUGEINT `bin`).
  *
  * Non-positive inputs THROW: a zero or negative count upstream of a
  * log-scale statistic is a broken pipeline, not a value (same
  * fail-loud posture as `graft_l2sq` / `graft_vecsum`).
  *
  * Registered as `graft_pbits` by [[GraftExtensions]].
  */
object ProductBits {
  def productBits(a: Long, b: Long): Long = {
    if (a <= 0L || b <= 0L) throw new IllegalArgumentException(
      s"graft_pbits requires positive counts, got ($a, $b)")
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    if (hi != 0L) 128L - java.lang.Long.numberOfLeadingZeros(hi)
    else 64L - java.lang.Long.numberOfLeadingZeros(lo)
  }
}

case class ProductBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pbits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pbits requires two longs, got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ProductBits.productBits(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.spark.ProductBits$$.MODULE$$.productBits($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ProductBits =
    copy(left = newLeft, right = newRight)
}
