package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * Scale note: every query takes the table root dir at call time — at
  * cluster scale these would be partitioned parquet datasets; the reads
  * here go through the vectorized parquet reader with column pruning and
  * predicate pushdown intact (verified via .explain in the specs).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by all graft
    * sessions). This loader normalizes `ts` back to a TimestampType
    * truncated to microseconds — the same floor-division DuckDB's
    * epoch_us applies, keeping oracle comparisons exact. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division — epoch-nanos (~1.7e18) overflows double precision
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
