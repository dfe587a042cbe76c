package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins (builder-prompt
  * custom-operator surface: as-of join, range join), composed from
  * existing operators per the preference ladder — no custom SparkPlan
  * needed because union+window / bin+equi-join express the semantics
  * with the right scaling behavior.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `tsCol` ≤ the left row's `tsCol`, per `keyCols` —
    * DuckDB/kdb ASOF JOIN semantics, left-outer flavor (left rows with
    * no preceding right row keep nulls).
    *
    * Plan: tag and union both sides, then ONE window pass per key ordered
    * by (ts, side) taking the last non-null right payload — right rows at
    * equal ts sort before left rows, giving ≤ (not <) semantics. One
    * shuffle + sort total: no per-key array materialization, no
    * nested-loop, skew bounded by the busiest key like any window op.
    *
    * Right rows must be unique per (keyCols, tsCol) — pre-dedup with
    * [[DedupLatest]] otherwise (the winner among equal timestamps would
    * be nondeterministic).
    *
    * @param rightPayload right-side columns to carry (renamed as given).
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightPayload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = rightPayload.toSeq // (rightCol -> outName)
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        payload.map { case (_, out) => lit(null).as(s"__p_$out") }: _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => (if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null)).as(c)) :+ col("__side")) ++
        payload.map { case (in, out) => right(in).as(s"__p_$out") }: _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { case (df, (_, out)) =>
      df.withColumn(s"__p_$out", last(col(s"__p_$out"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map { case (_, out) => col(s"__p_$out").as(out) }: _*)
  }

  /** Forward as-of join: the single right row with the SMALLEST `tsCol`
    * ≥ the left row's `tsCol`, per key (mirror of [[asofBackward]]:
    * ordered descending, right rows still winning ties). */
  def asofForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightPayload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = rightPayload.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        payload.map { case (_, out) => lit(null).as(s"__p_$out") }: _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => (if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null)).as(c)) :+ col("__side")) ++
        payload.map { case (in, out) => right(in).as(s"__p_$out") }: _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { case (df, (_, out)) =>
      df.withColumn(s"__p_$out", last(col(s"__p_$out"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map { case (_, out) => col(s"__p_$out").as(out) }: _*)
  }

  /** Range (interval-overlap) join: pairs (point, interval) with
    * `start ≤ point < end`, without an equi key.
    *
    * Plan: bin both sides to fixed-width buckets — points to their bucket,
    * intervals replicated across every bucket they span — then a plain
    * hash equi-join on the bucket plus the exact range post-filter. This
    * turns the nested-loop Spark would otherwise plan into a shuffle
    * join whose cost is O(points + Σ interval-spans). `binWidth` should
    * be on the order of the typical interval length (span replication
    * stays O(1) per interval).
    */
  def pointInRange(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("__bin", (col(pointTs) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence((col(startCol) / binWidth).cast("long"),
        // end is exclusive: a span ending exactly on a bin edge does not
        // reach into that bin
        ((col(endCol) - 1) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bin")
  }
}
