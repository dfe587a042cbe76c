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

  /** events.parquet's `ts` physical type has varied across harness data
    * generations: TIMESTAMP(NANOS) (readable only as int64 via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by all graft
    * sessions), naive TIMESTAMP(MICROS) (isAdjustedToUTC=false, which
    * Spark 4 infers as TIMESTAMP_NTZ — a type `unix_micros`/`window`
    * reject), and UTC-adjusted micros (plain TimestampType). This loader
    * normalizes all three to session-local TimestampType at microsecond
    * precision. All graft sessions pin the session timezone to UTC, so
    * the NTZ→LTZ cast reinterprets the same wall-clock digits DuckDB's
    * naive reader sees — epoch micros agree bit-for-bit in the oracle. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division — epoch-nanos (~1.7e18) overflows double precision
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
