package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, ReferenceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Coverage map (SURVEY.md §2 operator id → where it is exercised):
  * see the per-registry scaladocs in [[graft.queries]]; non-SQL-expressible
  * surfaces (streaming ST1-ST6, orchestration F4-F7, CSV quirks S1-S4) are
  * exercised by the ScalaTest suites under src/test/scala/graft.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (reference
    * surface) plus the training-data-pipeline extensions (dedup /
    * similarity / text analysis / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ PipelineQueries.oracles
}
