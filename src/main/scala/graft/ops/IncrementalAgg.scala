package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the scale-first alternative to the
  * reference's fact rebuild. The reference recomputes fact_order from the
  * ENTIRE raw table every scheduler tick (`insert overwrite … group by`,
  * order-...sql:179-212): O(rawTable) per minute, unworkable at 100 TB.
  * Instead: aggregate ONLY the change batch, then merge the partial
  * aggregates into the base additively.
  *
  * {{{
  *   val delta = changeBatch.groupBy(keys).agg(count, sums…)   // O(batch)
  *   IncrementalAgg.applyDelta(base, delta, keys, adds = Seq("order_count", …))
  * }}}
  *
  * Combine rules: `adds` columns add (count/sum — exact, including
  * DECIMAL sums), `maxes`/`mins` combine via greatest/least (exact for
  * insert-only streams). avg is derived downstream as sum/count. Groups
  * appearing only in the delta insert as-is.
  *
  * Scale: the delta aggregation shuffles O(batch) rows; the merge is the
  * standard one-shuffle upsert, and through [[graft.store.TableStore.merge]]
  * (pass the same column map as `whenMatchedSet`) only the hash buckets
  * containing CHANGED group keys are rewritten — per-tick cost is
  * O(batch + touchedBuckets), independent of total fact size. Correctness
  * contract: exact for append-only deltas (the reference's pipelines are
  * insert-dominant); updates/deletes need retraction rows (emit the old
  * row negated) or a windowed rebuild.
  */
object IncrementalAgg {

  /** Additive-combine column map, usable directly as a `whenMatchedSet`
    * for [[Merge.upsert]] or [[graft.store.TableStore.merge]]. A NULL on
    * either side yields the other side (SQL sum-aggregate semantics —
    * `NULL + 5` must combine to 5 to match a full recompute, not
    * propagate NULL); greatest/least already skip NULLs. */
  def combineSet(adds: Seq[String], maxes: Seq[String] = Nil, mins: Seq[String] = Nil)
      : Map[String, org.apache.spark.sql.Column] =
    adds.map { c =>
      c -> when(Merge.tgt(c).isNull, Merge.src(c))
        .when(Merge.src(c).isNull, Merge.tgt(c))
        .otherwise(Merge.tgt(c) + Merge.src(c))
    }.toMap ++
      maxes.map(c => c -> greatest(Merge.tgt(c), Merge.src(c))).toMap ++
      mins.map(c => c -> least(Merge.tgt(c), Merge.src(c))).toMap

  /** Merge delta aggregates into the base aggregate relation. */
  def applyDelta(base: DataFrame, delta: DataFrame, keys: Seq[String],
      adds: Seq[String], maxes: Seq[String] = Nil, mins: Seq[String] = Nil): DataFrame =
    Merge.upsert(base, delta, keys, whenMatchedSet = Some(combineSet(adds, maxes, mins)))
}
