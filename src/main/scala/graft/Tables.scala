package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
