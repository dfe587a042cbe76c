package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Expression, PredicateHelper, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
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
  * effect is WHERE the child is computed, never what it yields.
  *
  * THE TRADE — stated at its full blast radius (the round-19 wording
  * understated it): `PushPredicateThroughNonJoin` gates on
  * `projectList.forall(_.deterministic)`, so ONE fenced alias stops
  * pushdown of EVERY predicate through that Project — not just
  * predicates on the fenced column, but also predicates on plain
  * passthrough columns that would otherwise reach the scan (partition
  * pruning, parquet PushedFilters, the store's SidecarPrune file
  * skipping). [[PushFilterThroughFence]] closes exactly that gap:
  * because a Fence is non-deterministic only as a MARKER (its value is
  * pure and row-local), deterministic conjuncts that reference only
  * passthrough columns can be legally re-pushed below the fenced
  * Project, restoring scan pruning while the fence keeps protecting
  * the derived columns. Predicates that touch fenced/derived columns
  * stay above, as intended. Users who want pruning with zero reliance
  * on the rule can still pre-filter BEFORE the curation op — both
  * patterns are pinned by FencePushdownSpec.
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

/** Restores predicate pushdown PAST a fence for the predicates the fence
  * was never meant to block. Spark's `PushPredicateThroughNonJoin` stops
  * ALL predicates at a Project containing any non-deterministic field —
  * the conservatively correct behavior for real non-determinism (rand():
  * filtering first changes which rows draw values). A [[Fence]] is pure:
  * its non-determinism is a marker, so evaluating the fenced Project on
  * fewer rows yields the same values on every surviving row, and pushing
  * a deterministic predicate below it is a pure reorder.
  *
  * The rule therefore matches `Filter over Project` where (a) at least
  * one field carries a fence and (b) fences are the ONLY source of
  * non-determinism in the project list, then pushes the deterministic
  * conjuncts whose references are all PASSTHROUGH columns (attributes
  * projected unchanged, or simple attribute renames) below the Project.
  * Conjuncts touching fenced or computed columns stay above — exactly
  * the protection the fence exists for. Expression-valued deterministic
  * aliases are deliberately NOT substituted into pushed predicates:
  * that substitution is the duplication hazard the fence guards against
  * (`CollapseProject`'s cheapness guard has no pushdown counterpart).
  *
  * Runs in the operator-optimization batch (fixed point), so a pushed
  * predicate keeps traveling via the builtin rules all the way to the
  * scan, where partition pruning / parquet filters / SidecarPrune see
  * it. Net effect, pinned by FencePushdownSpec: `gopherRules(docs,...)
  * .filter($"source" === "cc")` prunes store files again, while
  * `.filter($"keep")` still stops above the fenced projection with the
  * fixture computed exactly once. */
object PushFilterThroughFence extends Rule[LogicalPlan] with PredicateHelper {
  private def fenced(e: Expression): Boolean = e.exists(_.isInstanceOf[Fence])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, p @ Project(projectList, child))
        if projectList.exists(fenced) &&
          projectList.forall(e => e.deterministic || fenced(e)) =>
      // passthrough = columns whose projected value IS a child attribute
      // (identity or rename); predicates over these commute with the
      // Project regardless of what the fenced neighbors compute
      val renames: Map[Attribute, Attribute] = projectList.collect {
        case a @ Alias(ref: AttributeReference, _) if !fenced(a) =>
          a.toAttribute -> ref
      }.toMap
      val passthrough = AttributeSet(projectList.collect {
        case a: AttributeReference => a
      }) ++ AttributeSet(renames.keys)
      val (push, stay) = splitConjunctivePredicates(cond).partition { pr =>
        pr.deterministic && pr.references.subsetOf(passthrough)
      }
      if (push.isEmpty) f
      else {
        val below = push.map(_.transform {
          case a: Attribute => renames.getOrElse(a, a)
        }).reduce(And)
        val projected = p.copy(child = Filter(below, child))
        stay.reduceOption(And).map(Filter(_, projected)).getOrElse(projected)
      }
  }
}
