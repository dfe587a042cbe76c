package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** `number autoincrement` surrogate keys (SURVEY.md §1 + §7 hard parts;
  * reference: customer-end-to-end-pipeline-script.sql:32, item-...sql:26,
  * order-...sql:49).
  *
  * Contract: existing keys never change across merges; new rows continue
  * the sequence above the current max.
  *
  * Scale: a naive `row_number() OVER ()` forces all inserts through one
  * partition. Instead we use RDD `zipWithIndex` (one lightweight count
  * job + a mapPartitions) over only the keyless slice, so assignment is
  * fully distributed. Keys are dense but assignment order across
  * partitions is an implementation detail (as in Snowflake, which only
  * guarantees uniqueness/monotonicity per session, not gap-freeness).
  */
object SurrogateKey {

  /** Fill `keyCol` (LongType, null = unassigned) continuing from the
    * current max. */
  def assign(df: DataFrame, keyCol: String): DataFrame = {
    val maxExisting: Long = df.agg(max(col(keyCol))).head() match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0)
    }
    assignFrom(df, keyCol, maxExisting)
  }

  /** Fill null `keyCol` values with base+1, base+2, … . `base` must be ≥
    * the table-wide max (callers with a pruned slice — e.g. a bucket-pruned
    * merge — pass the global max, not the slice max). */
  def assignFrom(df: DataFrame, keyCol: String, base: Long): DataFrame = {
    val spark = df.sparkSession
    val keyed = df.filter(col(keyCol).isNotNull)
    val unkeyed = df.filter(col(keyCol).isNull)
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val assignedRdd = unkeyed.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq.updated(keyIdx, base + i + 1L))
    }
    val assigned = spark.createDataFrame(assignedRdd, schema)
    keyed.unionByName(assigned)
  }

  /** Convenience: add a key column named `keyCol` to `df` (which lacks it)
    * starting after `startAfter`. */
  def attach(df: DataFrame, keyCol: String, startAfter: Long = 0L): DataFrame =
    attachWithCount(df, keyCol, startAfter)._1

  /** [[attach]] plus the total row count, for FREE: the zipWithIndex
    * pattern already runs one partition-sizes count job to compute the
    * per-partition rank offsets, and the total is their sum — callers
    * that need N alongside a dense 0..N-1 rank (e.g. a phase or quantile
    * denominator) reuse it instead of paying a second lineage pass. */
  def attachWithCount(df: DataFrame, keyCol: String,
      startAfter: Long = 0L): (DataFrame, Long) = {
    val spark = df.sparkSession
    val schema = StructType(StructField(keyCol, LongType, nullable = false) +: df.schema.fields)
    val base = df.rdd
    val sizes = base.mapPartitions(it => Iterator(it.size.toLong),
      preservesPartitioning = true).collect()
    val offsets = sizes.scanLeft(0L)(_ + _)
    val rdd = base.mapPartitionsWithIndex { case (pi, it) =>
      var i = offsets(pi)
      it.map { row => val k = startAfter + i + 1L; i += 1; Row.fromSeq(k +: row.toSeq) }
    }
    (spark.createDataFrame(rdd, schema), offsets.last)
  }
}
