package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point UPDATE / TRUNCATE / INSERT-append rewrites over immutable tables
  * (SURVEY.md §2.2 P7, §2.1 S5/S7; reference: order-end-to-end-pipeline-
  * script.sql:377-387 UPDATEs, customer-...sql:172 TRUNCATE, order-...
  * sql:306-339 INSERT).
  *
  * Spark tables over parquet are immutable, so an UPDATE is a full-column
  * conditional projection (single codegen'd map stage — no shuffle) and
  * TRUNCATE is an empty projection; the atomic swap lives in
  * [[graft.store.TableStore]].
  */
object TableOps {

  /** UPDATE ... SET set WHERE pred — rows failing `pred` are untouched. */
  def update(df: DataFrame, pred: Column, set: Map[String, Column]): DataFrame = {
    val out = df.schema.fields.map { f =>
      set.get(f.name) match {
        case Some(v) => when(pred, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None    => col(f.name)
      }
    }
    df.select(out.toIndexedSeq: _*)
  }

  /** TRUNCATE TABLE — empty contents, schema preserved. */
  def truncate(df: DataFrame): DataFrame = df.filter(lit(false))

  /** DELETE FROM ... WHERE pred — removes rows where `pred` is TRUE;
    * FALSE and NULL rows are kept (SQL DELETE semantics). */
  def delete(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** INSERT INTO target SELECT ... — append by name; source must cover the
    * target columns (missing columns land as null, like a permissive load). */
  def append(target: DataFrame, source: DataFrame): DataFrame = {
    val srcCols = source.columns.toSet
    val aligned = source.select(target.schema.fields.map { f =>
      (if (srcCols(f.name)) col(f.name) else lit(null)).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    target.unionByName(aligned)
  }
}
