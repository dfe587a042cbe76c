package graft.spark

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native squared-L2 distance over two EQUAL-LENGTH numeric arrays:
  * left fold s = s + (a[i] − b[i])² in ascending index order from 0.0 —
  * the exact op sequence of the HOF form
  * `aggregate(zip_with(a, b, (x, y) => (x−y)·(x−y)), 0.0, _+_)` used by
  * [[graft.ops.Similarity]]'s kmeans assignment (and mirrored by the
  * DuckDB `dL2` oracle fold), so on equal-length inputs swapping it in
  * changes NOTHING about results — only the cost: the HOF path
  * materializes a zipped array and interprets three lambda frames per
  * element; this compiles to one subtract-multiply-add loop. The kmeans
  * assignment evaluates it k times per row per Lloyd iteration, which
  * made it the training hot path.
  *
  * Mismatched lengths THROW (the HOF form would yield NULL there via
  * zip_with's null padding; silently returning a prefix distance — the
  * usual min-length clamp — would let a bad pipeline rank neighbors by
  * garbage, the same fail-loud posture as `graft_vecsum`).
  *
  * Registered as `graft_l2sq` by [[GraftExtensions]].
  */
object L2Squared {
  private def checkLen(na: Int, nb: Int): Unit =
    if (na != nb) throw new IllegalArgumentException(
      s"graft_l2sq: array length mismatch ($na vs $nb)")

  def l2Float(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    checkLen(n, b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def l2Double(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    checkLen(n, b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}

case class L2Squared(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(
      s"graft_l2sq requires array inputs, got ${other.catalogString}")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && (a == FloatType || a == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_l2sq requires two arrays of the same float/double element type, " +
            s"got ${l.catalogString} and ${r.catalogString}")
    }
  }

  private def fn = if (elemType(left) == FloatType) "l2Float" else "l2Double"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (elemType(left) == FloatType) L2Squared.l2Float(x, y) else L2Squared.l2Double(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.spark.L2Squared$$.MODULE$$.$fn($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}
