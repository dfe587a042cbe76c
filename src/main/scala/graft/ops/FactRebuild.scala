package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema fact rebuild: fact ⋈ dims → GROUP BY → aggregates →
  * ORDER BY, written as a full overwrite (SURVEY.md §2.1 S6, §2.3 J1/J2,
  * §2.4 A1-A3, §2.6 O1; reference: order-end-to-end-pipeline-script
  * .sql:179-212 — INSERT OVERWRITE of a 3-table join + 8 aggregates).
  *
  * Scale: dimension tables are broadcast (hinted; AQE would also demote a
  * too-large broadcast) so the fact side never shuffles for the joins —
  * the only exchange is the partial/final HashAggregate on the group keys.
  * The final ORDER BY is a range exchange on already-aggregated (small)
  * data, kept for output fidelity with the reference.
  */
object FactRebuild {

  /** @param dims (dimension, join condition, broadcastable) triples applied
    *             in order as inner joins. */
  def rebuild(
      fact: DataFrame,
      dims: Seq[(DataFrame, Column, Boolean)],
      groupCols: Seq[Column],
      aggs: Seq[Column],
      orderCols: Seq[Column]): DataFrame = {
    val joined = dims.foldLeft(fact) { case (acc, (dim, cond, bcast)) =>
      acc.join(if (bcast) broadcast(dim) else dim, cond, "inner")
    }
    joined.groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(orderCols: _*)
  }
}
