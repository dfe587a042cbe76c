package graft.spark

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native elementwise sum of a list of equal-length double vectors:
  * for each input vector in LIST ORDER, acc[d] += v[d] — per dimension
  * this is the exact left fold (…((0 + v₁) + v₂)…) of the HOF form
  * `aggregate(vs, zeros, (acc, v) => zip_with(acc, v, _ + _))` used by
  * [[graft.ops.Similarity.centroids]]' hierarchical mean folds (and
  * mirrored by the DuckDB `dCentroids` oracle), so swapping it in is
  * bit-neutral. The HOF form allocates a fresh dim-width array and
  * interprets three lambda frames per element PER VECTOR; this is one
  * accumulator array and a fused add loop — the centroid/mean step runs
  * once per Lloyd iteration in kmeans training and once per IVF build,
  * making it the second training hot path after assignment
  * ([[L2Squared]]).
  *
  * Registered as `graft_vecsum` by [[GraftExtensions]].
  */
object VecSum {
  /** Ragged inputs clamp to each vector's own length like the sibling
    * expressions (graft_dot / graft_l2sq) rather than reading past an
    * UnsafeArrayData's element region; a null inner vector raises a
    * descriptive error (the codegen wrapper only null-checks the OUTER
    * array, so silently reading a null element would NPE). */
  def sum(vs: ArrayData): ArrayData = {
    val n = vs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Double])
    if (vs.isNullAt(0)) throw new IllegalArgumentException(
      "graft_vecsum: null inner vector")
    val dim = vs.getArray(0).numElements()
    val acc = new Array[Double](dim)
    var i = 0
    while (i < n) {
      if (vs.isNullAt(i)) throw new IllegalArgumentException(
        "graft_vecsum: null inner vector")
      val a = vs.getArray(i)
      val m = math.min(dim, a.numElements())
      var d = 0
      while (d < m) { acc(d) += a.getDouble(d); d += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

case class VecSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vecsum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vecsum requires array<array<double>>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    VecSum.sum(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.VecSum$$.MODULE$$.sum($c)")

  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}
