package graft.spark

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application: apply a list of byte-pair merges
  * `[a1,b1, a2,b2, …]` (flattened pairs, in learn order) to a symbol
  * array, each merge as one greedy left-to-right non-overlapping scan —
  * the canonical BPE apply step (Sennrich et al. ACL'16).
  *
  * Greedy-scan semantics (what the [[graft.ops.CorpusOps.bpeMerges]]
  * oracle replays positionally in SQL): for a ≠ b matches can never
  * overlap, so "greedy" = all matched positions; for a == b the scan
  * fuses pairs at even offsets within each run of a's. One linear pass
  * per merge gives both.
  *
  * Why an Expression and not composed column transforms: each
  * column-level merge step references its input array ~7 times
  * (select + apply + run-start logic), so chaining k merges between
  * materialization barriers grows the Catalyst tree ~7^k nodes — the
  * batched trainer at batchK = 8 OOMed the driver on expression plumbing
  * alone. Here a k-merge round is ONE codegen'd call doing k linear
  * passes, and the a == b case drops from the column form's O(n²)
  * run-start recomputation to O(n).
  *
  * Registered as `graft_bpe_apply` by [[GraftExtensions]].
  */
object BpeApplyMerges {
  /** Static hot loop, called from generated code. */
  def applyMerges(syms: ArrayData, merges: ArrayData): ArrayData = {
    var cur = new Array[UTF8String](syms.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = syms.getUTF8String(i); i += 1 }
    var m = 0
    while (m + 1 < merges.numElements()) {
      val a = merges.getUTF8String(m)
      val b = merges.getUTF8String(m + 1)
      val ab = UTF8String.concat(a, b)
      val out = new Array[UTF8String](cur.length)
      var n = 0
      var j = 0
      while (j < cur.length) {
        if (j + 1 < cur.length && a == cur(j) && b == cur(j + 1)) {
          out(n) = ab; j += 2
        } else {
          out(n) = cur(j); j += 1
        }
        n += 1
      }
      cur = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      m += 2
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }
}

case class BpeApplyMerges(left: Expression, right: Expression) extends BinaryExpression {

  // null input elements pass through the scan untouched, so the output
  // is null-free exactly when the input is — don't promise tighter
  override def dataType: DataType = left.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = false)
  }
  override def prettyName: String = "graft_bpe_apply"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_apply requires two array<string> inputs, " +
            s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BpeApplyMerges.applyMerges(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.spark.BpeApplyMerges$$.MODULE$$.applyMerges($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeApplyMerges =
    copy(left = newLeft, right = newRight)
}
