package graft.spark

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Z-value interleave for ZORDER clustering writes
  * ([[graft.store.TableStore]]): each clustering key's monotone double
  * image ranks against its 255 batch-quantile cut points (binary
  * search → 0..255), and the ranks bit-interleave MSB-first into one
  * long sort key. The cut-point tables are DRIVER-computed per batch
  * (one approxQuantile pass) and ride into codegen as a plain
  * `double[][]` reference — this replaced the write path's last Scala
  * UDF, which boxed a `Seq[java.lang.Double]` per row on every
  * recluster/clustered write and broke whole-stage codegen around the
  * sort input. Semantics are bit-identical to the UDF it replaced:
  * null keys rank 0 (NULLS FIRST), rank = count of cut points <= x,
  * NaN ranks 0 through the same always-false comparison.
  */
object ZValueInterleave {
  def zvalue(a: ArrayData, bounds: Array[Array[Double]]): Long = {
    val m = bounds.length
    val ranks = new Array[Int](m)
    var j = 0
    while (j < m) {
      ranks(j) =
        if (a.isNullAt(j) || bounds(j).isEmpty) 0
        else {
          val x = a.getDouble(j)
          var lo = 0
          var hi = bounds(j).length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (bounds(j)(mid) <= x) lo = mid + 1 else hi = mid
          }
          lo
        }
      j += 1
    }
    var z = 0L
    var bit = 7
    while (bit >= 0) {
      j = 0
      while (j < m) {
        z = (z << 1) | ((ranks(j) >> bit) & 1)
        j += 1
      }
      bit -= 1
    }
    z
  }
}

// bounds is a Seq-of-Seq, not Array-of-Array: case-class equality on an
// Array field is REFERENCE equality, which would make two semantically
// identical ZValue expressions compare unequal and defeat Catalyst's
// semanticEquals/canonicalization (exchange reuse, subexpression dedup)
case class ZValue(child: Expression, bounds: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val boundsArr: Array[Array[Double]] =
    bounds.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if bounds.nonEmpty =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_zvalue requires array<double> input and non-empty bounds, " +
            s"got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ZValueInterleave.zvalue(input.asInstanceOf[ArrayData], boundsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zbounds", boundsArr, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.spark.ZValueInterleave$$.MODULE$$.zvalue($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ZValue =
    copy(child = newChild)
}
