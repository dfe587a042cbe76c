package graft.spark

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, TimestampNTZType}

/** Scan-time predicate rewrite for TIMESTAMP_NTZ clustering keys: this
  * Spark build pushes NTZ comparisons to the parquet scan but does NOT
  * stat-prune row groups on them (integer / date / string keys all
  * prune), so [[graft.store.TableStore]] writes every NTZ clustering key
  * with a derived `__graft_day_<col>` epoch-day INT32 companion and
  * exposes it in the scan schema. This rule makes the companion do its
  * job transparently: for a Filter comparing an NTZ column `x` with a
  * literal, when the scan also outputs `__graft_day_x`, it conjoins the
  * day-space image of the predicate —
  *
  *   x >  L  ⟹  day_x IS NULL OR day_x >= day(L)
  *   x <= U  ⟹  day_x IS NULL OR day_x <= day(U)
  *   x  = V  ⟹  day_x IS NULL OR day_x  = day(V)
  *
  * — a REDUNDANT predicate (implied by the original, since epoch-day is
  * monotone in the timestamp), so results never change; but it
  * references an INT32 column with tight row-group statistics, so the
  * parquet reader skips every group outside the day range. The IS NULL
  * arm keeps batches written before the key was declared readable: their
  * files lack the day column (it reads as null; Spark also re-derives
  * pushed filters per file against the file's own schema, dropping
  * untranslatable ones), so they scan unpruned until a compact().
  *
  * Shape notes: the rule fires both on a Filter directly over the scan
  * and on the post-ColumnPruning shape Filter(cond, Project(pruned,
  * scan)) — there it inserts the day conjunct as a new Filter BELOW the
  * project (outputs everywhere unchanged); a condition already
  * referencing a `__graft_day_` column is left alone, which makes the
  * rewrite a fixed point under the optimizer's iteration. */
object NtzDayPrune extends Rule[LogicalPlan] {

  private val Prefix = "__graft_day_"
  private val DayUs = 86400000000L

  private def refsDay(e: Expression): Boolean =
    e.references.exists(_.name.startsWith(Prefix))

  private def dayMap(out: Seq[Attribute]): Map[String, Attribute] =
    out.filter(a => a.name.startsWith(Prefix) && a.dataType == IntegerType)
      .map(a => a.name.stripPrefix(Prefix) -> a).toMap

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !refsDay(cond) =>
      val direct = dayMap(child.output)
      if (direct.nonEmpty) {
        val extra = conjuncts(cond).flatMap(c => dayImage(c, direct))
        if (extra.isEmpty) f else Filter((cond +: extra).reduce(And), child)
      } else child match {
        // ColumnPruning already hid the day column under a project:
        // inject the day conjunct below it, where the column is visible
        case Project(list, gc)
            if !gc.isInstanceOf[Filter] ||
              !refsDay(gc.asInstanceOf[Filter].condition) =>
          val inner = dayMap(gc.output)
          val extra =
            if (inner.isEmpty) Nil
            else conjuncts(cond).flatMap(c => dayImage(c, inner))
          if (extra.isEmpty) f
          else Filter(cond, Project(list, Filter(extra.reduce(And), gc)))
        case _ => f
      }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def dayLit(us: Long): Literal =
    Literal(Math.floorDiv(us, DayUs).toInt, IntegerType)

  private def guarded(day: Attribute, cmp: Expression): Expression =
    Or(IsNull(day), cmp)

  /** The day-space image of one conjunct, when it compares a
    * day-companioned NTZ attribute with a non-null literal. */
  private def dayImage(c: Expression,
      days: Map[String, Attribute]): Option[Expression] = {
    def day(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if a.dataType == TimestampNTZType =>
        days.get(a.name)
      case _ => None
    }
    c match {
      case GreaterThan(a, Literal(us: Long, TimestampNTZType)) =>
        day(a).map(d => guarded(d, GreaterThanOrEqual(d, dayLit(us))))
      case GreaterThanOrEqual(a, Literal(us: Long, TimestampNTZType)) =>
        day(a).map(d => guarded(d, GreaterThanOrEqual(d, dayLit(us))))
      case LessThan(a, Literal(us: Long, TimestampNTZType)) =>
        day(a).map(d => guarded(d, LessThanOrEqual(d, dayLit(us))))
      case LessThanOrEqual(a, Literal(us: Long, TimestampNTZType)) =>
        day(a).map(d => guarded(d, LessThanOrEqual(d, dayLit(us))))
      case EqualTo(a, Literal(us: Long, TimestampNTZType)) =>
        day(a).map(d => guarded(d, EqualTo(d, dayLit(us))))
      // literal-on-left mirrors: lit OP x ⟺ x flipped-OP lit
      case GreaterThan(Literal(us: Long, TimestampNTZType), a) =>
        day(a).map(d => guarded(d, LessThanOrEqual(d, dayLit(us))))
      case GreaterThanOrEqual(Literal(us: Long, TimestampNTZType), a) =>
        day(a).map(d => guarded(d, LessThanOrEqual(d, dayLit(us))))
      case LessThan(Literal(us: Long, TimestampNTZType), a) =>
        day(a).map(d => guarded(d, GreaterThanOrEqual(d, dayLit(us))))
      case LessThanOrEqual(Literal(us: Long, TimestampNTZType), a) =>
        day(a).map(d => guarded(d, GreaterThanOrEqual(d, dayLit(us))))
      case EqualTo(Literal(us: Long, TimestampNTZType), a) =>
        day(a).map(d => guarded(d, EqualTo(d, dayLit(us))))
      case _ => None
    }
  }
}
