package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — the operator the reference's
  * dim tables are shaped for but never implement: dim_item carries
  * start_date/end_date (item-...sql:28-30) and the item deltas re-send the
  * same item_id with a later start_date and changed attributes, yet the
  * reference's MERGE overwrites in place (SCD1, history lost — SURVEY.md
  * §0 known-gaps). This provides the type-2 semantics:
  *
  *  - a change whose tracked attributes differ from the CURRENT row closes
  *    that row (`end = change ts`) and opens a new current row
  *    (`start = change ts`, `end = null`);
  *  - a change identical to the current row is a no-op;
  *  - a change for an unseen key opens its first row;
  *  - historical (already-closed) rows pass through untouched.
  *
  * Scale: one shuffle of each side on `keys` (current rows ⋈ changes —
  * sort-merge, or broadcast when the CDC batch is small via AQE), then a
  * unionByName of three branch projections over that single join — no
  * window over the full dimension, no per-key arrays. Historical rows
  * never join (they're filtered out by `end IS NOT NULL` before the join
  * and unioned back), so the join side is bounded by the CURRENT dimension
  * size, not the history depth.
  *
  * Callers feed ONE change row per key per application (latest-wins via
  * [[DedupLatest]] upstream, the reference's own convention); for
  * multi-version batches, apply in ts order or pre-collapse.
  *
  * @param dim     dimension with `startCol`/`endCol` (endCol null = current)
  * @param changes change rows carrying `keys`, `tracked` attrs, and `tsCol`
  * @param keys    business key columns
  * @param tracked attribute columns whose change triggers a new version
  * @param tsCol   change-effective column in `changes`
  */
object Scd2 {

  def apply(dim: DataFrame, changes: DataFrame, keys: Seq[String],
      tracked: Seq[String], tsCol: String,
      startCol: String = "start_ts", endCol: String = "end_ts"): DataFrame = {

    val history = dim.filter(col(endCol).isNotNull)
    val current = dim.filter(col(endCol).isNull)

    val t = "__scd_t"
    val s = "__scd_s"
    val cur = current.withColumn("__t_ex", lit(true)).as(t)
    val chg = changes.withColumn("__s_ex", lit(true)).as(s)
    val joinCond = keys.map(k => col(s"$t.$k") <=> col(s"$s.$k")).reduce(_ && _)
    val joined = cur.join(chg, joinCond, "full_outer")

    val matched = col(s"$t.__t_ex").isNotNull && col(s"$s.__s_ex").isNotNull
    val changeOnly = col(s"$t.__t_ex").isNull
    val currentOnly = col(s"$s.__s_ex").isNull
    // null-safe attribute comparison: any tracked column differing (incl.
    // null vs non-null) makes the change a new version
    val differs = tracked.map(c => !(col(s"$t.$c") <=> col(s"$s.$c"))).reduce(_ || _)

    val dimCols = dim.columns.toIndexedSeq

    // each join row emits 0-2 output rows; building them as an exploded
    // array of structs keeps the whole thing ONE pass over ONE join (a
    // union of three filtered selects would re-execute the join per
    // branch — Spark has no common-subplan reuse across union arms)
    // 1) surviving current row: unmatched, or matched-but-identical
    val kept = struct(dimCols.map(c => col(s"$t.$c").as(c)): _*)
    // 2) closed row: matched and different — end at the change ts
    val closed = struct(dimCols.map {
      case c if c == endCol => col(s"$s.$tsCol").cast(dim.schema(endCol).dataType).as(endCol)
      case c => col(s"$t.$c").as(c)
    }: _*)
    // 3) opened row: new key, or new version of a changed key
    val opened = struct(dimCols.map {
      case c if c == startCol => col(s"$s.$tsCol").cast(dim.schema(startCol).dataType).as(startCol)
      case c if c == endCol => lit(null).cast(dim.schema(endCol).dataType).as(endCol)
      case c if keys.contains(c) || tracked.contains(c) => col(s"$s.$c").cast(dim.schema(c).dataType).as(c)
      case c => col(s"$t.$c").as(c) // carried non-tracked cols (null for new keys)
    }: _*)

    val emitted = joined.select(explode(
      when(matched && differs, array(closed, opened))
        .when(changeOnly, array(opened))
        .otherwise(array(kept))). // currentOnly, or matched with no change
      as("__r"))
      .select(col("__r.*"))

    history.unionByName(emitted)
  }
}
