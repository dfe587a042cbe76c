package graft.store

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, In, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** DYNAMIC JOIN-KEY FILE PRUNING — the runtime half of the metadata
  * tier: when a store-table scan joins a SMALL build side on equi-keys
  * (the star shape: fact ⋈ filtered dim), the fact table carries NO
  * literal predicate [[SidecarPrune]] could serve, yet only the files
  * whose key intervals/blooms can contain SOME build-side key can
  * produce join output. This rule evaluates the build side's distinct
  * keys DRIVER-SIDE during optimization (bounded by
  * `spark.graft.joinPrune.maxKeys`, gated on the build side's estimated
  * size — the same "small enough to broadcast" judgement join planning
  * already makes) and prunes the fact's FILES through the same
  * [[StatsPruning]] compiler + sidecar walk every other pruning
  * consumer uses — Snowflake's join pruning / Spark's dynamic partition
  * pruning, at sidecar-file granularity, for tables with no partition
  * columns at all.
  *
  * Soundness: files are removed only when PROVABLY free of matching
  * keys (interval + lookup-bloom tests, conservative on every unknown),
  * and removing non-matching FACT rows is semantics-preserving exactly
  * for join positions where unmatched rows of that side cannot reach
  * the output: Inner (either side), LeftSemi (either side), the RIGHT
  * side of a LeftOuter, the LEFT side of a RightOuter. LeftAnti's left
  * side — where unmatched rows ARE the output — is never pruned. Null
  * build keys never equi-match and are dropped from the probe list; an
  * EMPTY build side proves the fact contributes nothing, pruning every
  * file. The Join node itself is untouched — the full condition still
  * runs on every surviving row.
  *
  * Cost control: the build side must be deterministic, estimated under
  * `spark.graft.joinPrune.maxBuildBytes` (default 8 MiB), and yield at
  * most `maxKeys` distinct keys (one column-pruned distinct-limit job,
  * memoized per canonicalized build plan — AQE re-optimizations and
  * repeated queries of the same dim pay once per session). A thread
  * re-entrancy guard keeps the rule from firing inside its own build
  * job. Fixpoint: the rewrite only lands when the served file set
  * STRICTLY shrinks, so optimizer iteration terminates.
  * `spark.graft.joinPrune.enabled=false` is the kill switch. */
object JoinKeyPrune extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.joinPrune.enabled"
  val MaxBuildBytesConf = "spark.graft.joinPrune.maxBuildBytes"
  val MaxKeysConf = "spark.graft.joinPrune.maxKeys"

  private val executing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "true").toBoolean || executing.get)
      plan
    else plan.transform {
      case j: Join if j.condition.isDefined => tryPrune(j).getOrElse(j)
    }

  /** Join positions whose unmatched rows cannot reach the output —
    * the positions where dropping provably-unmatched files is sound. */
  private def prunablePosition(j: Join, factOnLeft: Boolean): Boolean =
    j.joinType match {
      case Inner | LeftSemi => true
      case LeftOuter => !factOnLeft
      case RightOuter => factOnLeft
      case _ => false
    }

  /** The store relation a join arm exposes through attribute-only
    * projections and filters (shapes that preserve the scan's output
    * attributes, so join keys map straight to scan columns). */
  private def storeScanOf(p: LogicalPlan): Option[LogicalRelation] = p match {
    case l: LogicalRelation => l.relation match {
      case hfs: HadoopFsRelation if SidecarPrune.looksLikeStoreScan(hfs) => Some(l)
      case _ => None
    }
    case Project(list, ch) if list.forall(_.isInstanceOf[AttributeReference]) =>
      storeScanOf(ch)
    case Filter(_, ch) => storeScanOf(ch)
    case _ => None
  }

  private def tryPrune(j: Join): Option[LogicalPlan] = {
    val maxBuildBytes = BigInt(
      conf.getConfString(MaxBuildBytesConf, (8L * 1024 * 1024).toString).toLong)
    def arm(fact: LogicalPlan, build: LogicalPlan, factOnLeft: Boolean)
        : Option[LogicalPlan] =
      for {
        rel <- storeScanOf(fact)
        if prunablePosition(j, factOnLeft)
        if build.stats.sizeInBytes <= maxBuildBytes
        if build.deterministic
        hfs = rel.relation.asInstanceOf[HadoopFsRelation]
        pairs = equiPairs(j.condition.get, rel, build)
        if pairs.nonEmpty
        pruned <- pruneByBuildKeys(rel, hfs, build, pairs)
      } yield replaceRelation(j, rel, pruned, factOnLeft)
    arm(j.left, j.right, factOnLeft = true)
      .orElse(arm(j.right, j.left, factOnLeft = false))
  }

  /** (fact scan attribute, build-side attribute) equi-conjuncts with
    * IDENTICAL types — an analyzer-inserted cast between the sides
    * would make probe values hash/compare in the wrong domain. */
  private def equiPairs(cond: Expression, rel: LogicalRelation,
      build: LogicalPlan): Seq[(AttributeReference, AttributeReference)] = {
    val factOut = rel.outputSet
    val buildOut = build.outputSet
    splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if factOut.contains(a) && buildOut.contains(b) &&
            a.dataType == b.dataType => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if factOut.contains(a) && buildOut.contains(b) &&
            a.dataType == b.dataType => (a, b)
    }.take(2) // one distinct-collect job per pair — bound the planning cost
  }

  // build-side distinct key memo: canonicalized (plan, key) → the
  // collected values (None = too many / failed, don't retry this plan)
  private val MemoCap = 256
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(LogicalPlan, Expression), Option[Seq[Any]]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, Expression), Option[Seq[Any]]])
          : Boolean = size() > MemoCap
    })

  private def buildKeys(spark: org.apache.spark.sql.SparkSession,
      build: LogicalPlan, attr: AttributeReference): Option[Seq[Any]] = {
    val maxKeys = conf.getConfString(MaxKeysConf, "10000").toInt
    val key = (build.canonicalized,
      attr.canonicalized.asInstanceOf[Expression])
    val hit = memo.get(key)
    if (hit != null) return hit
    val computed: Option[Seq[Any]] =
      try {
        executing.set(true)
        val rows = org.apache.spark.sql.GraftColumnBridge
          .ofRows(spark, Project(Seq(attr), build))
          .distinct().limit(maxKeys + 1).collect()
        if (rows.length > maxKeys) None
        else Some(rows.toIndexedSeq.map(_.get(0)).filter(_ != null))
      } catch {
        case e: Exception =>
          logWarning(s"JoinKeyPrune: build-side key collection failed: $e")
          None
      } finally executing.set(false)
    memo.put(key, computed)
    computed
  }

  private def pruneByBuildKeys(rel: LogicalRelation, hfs: HadoopFsRelation,
      build: LogicalPlan,
      pairs: Seq[(AttributeReference, AttributeReference)])
      : Option[LogicalRelation] = {
    val tests = pairs.flatMap { case (factAttr, buildAttr) =>
      buildKeys(hfs.sparkSession, build, buildAttr) match {
        case None => Nil // unbounded/failed — this pair proves nothing
        case Some(Nil) =>
          // empty (or all-null-keyed) build side: no fact row can match
          Seq((_: StatsPruning.FileStats) => false)
        case Some(vals) =>
          val lits = vals.map(v => Literal.create(v, buildAttr.dataType))
          StatsPruning.compile(In(factAttr, lits), hfs.schema)
      }
    }
    if (tests.isEmpty) None
    else SidecarPrune.pruneWithTests(rel, hfs, tests, tag = "JoinKeyPrune")
  }

  private def replaceRelation(j: Join, from: LogicalRelation,
      to: LogicalRelation, factOnLeft: Boolean): LogicalPlan = {
    def swap(p: LogicalPlan): LogicalPlan = p.transform {
      case l: LogicalRelation if l eq from => to
    }
    if (factOnLeft) j.copy(left = swap(j.left)) else j.copy(right = swap(j.right))
  }
}
