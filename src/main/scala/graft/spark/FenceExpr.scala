package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Optimizer fence: evaluates to its child, unchanged — but reports
  * `deterministic = false`, which legally switches off the two rewrites
  * that DUPLICATE expensive expressions across a plan:
  *
  *  - `CollapseProject` will not merge a projection whose alias is
  *    non-deterministic into its consumers, so a fenced column stays a
  *    compute-once attribute instead of being re-inlined at every use;
  *  - `PushPredicateThroughNonJoin` will not push a Filter below a
  *    Project containing a non-deterministic alias, so a filter on a
  *    derived flag stops ABOVE the expensive projection instead of
  *    substituting the full expression into every conjunct of the
  *    predicate.
  *
  * Motivating bisect (SCALE.md round-19, c3_web_pipeline): a filter on
  * the Gopher `keep` flag was alias-substituted all the way to the scan,
  * duplicating the O(tokens) web-fixture expression into each of the 7
  * rule conjuncts — the fixture evaluated ~15× per row inside one
  * Filter. Claiming non-determinism is always SAFE for correctness (it
  * only forbids optimizations); the expression itself is pure
  * pass-through in both interpreted and codegen paths, so the only
  * effect is WHERE the child is computed, never what it yields. The
  * trade is disclosed: a fence also stops legitimate pushdown past it
  * (scan pruning from predicates on fenced columns), so fence only
  * derived columns whose predicates cannot prune scans anyway.
  *
  * Registered as `graft_fence` by [[GraftExtensions]].
  */
case class Fence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Fence =
    copy(child = newChild)
}
