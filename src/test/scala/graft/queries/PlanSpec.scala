package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Physical-plan guards: the optimizer wins we rely on at scale must not
  * silently regress (broadcast dims, scan pruning, filter pushdown,
  * partial aggregation). */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("fact rebuild broadcasts dims and prunes the fact scan") {
    val p = plan("s6_fact_rebuild")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), "no fact-side shuffle join expected")
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      s"lineitem scan must prune unused columns, got $readSchema")
  }

  test("q1 aggregation is two-phase (map-side partials)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "expected partial aggregation before the exchange")
  }

  test("IN-list filter is pushed to the parquet scan") {
    val p = plan("p5_filter_in")
    assert(p.contains("PushedFilters") && p.contains("In(o_orderpriority"),
      "IN filter should reach the scan")
  }

  test("IN-subquery becomes a semi join, not a cartesian") {
    val p = plan("p6_in_subquery")
    assert(p.contains("LeftSemi"), "expected a left-semi join")
  }

  test("native expressions appear in hash-heavy plans") {
    assert(plan("d1_exact_dedup").contains("graft_phash"))
    assert(plan("n1_ann_topk").contains("graft_dot"))
  }
}
