package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record dedup of a CDC micro-batch — the reference's only window
  * operator (SURVEY.md §2.5 W1; reference: item-end-to-end-pipeline-script
  * .sql:72-75 — `row_number() over (partition by item_id order by
  * start_date desc) ... where rownum = 1`; acceptance note item-...sql:220
  * "picks the latest change for the same id in a stream").
  *
  * Scale: one shuffle on `partitionKeys` + per-partition sort (WindowExec).
  * Keys are the CDC entity id, so skew only appears if one entity floods a
  * batch; for that case prefer `orderCols` including a unique tiebreaker
  * and consider max_by-style aggregation instead. Callers must pass a
  * total order (include a unique id as the last orderCol) or the winner is
  * nondeterministic.
  */
object DedupLatest {

  def apply(df: DataFrame, partitionKeys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rownum", row_number().over(w))
      .filter(col("__rownum") === 1)
      .drop("__rownum")
  }

  /** The reference's exact shape: latest by `orderCol` descending, with
    * `tiebreak` descending to make the winner total-ordered. */
  def latestBy(df: DataFrame, key: String, orderCol: String, tiebreak: String): DataFrame =
    apply(df, Seq(key), Seq(col(orderCol).desc, col(tiebreak).desc))
}
