package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Driver-checkable queries covering the reference's relational surface
  * (SURVEY.md §2). Each entry has a DuckDB oracle with identical column
  * names and deterministic ordering.
  *
  * Determinism notes (these queries are hash-compared against DuckDB):
  *  - money aggregates cast to decimal BEFORE summing (exact, order-
  *    independent arithmetic in both engines), then cast to double for a
  *    stable output schema;
  *  - every result ends in a total ORDER BY over a unique key prefix.
  */
object ReferenceQueries {

  /** sum over a varchar/double money column, exact-decimal then double —
    * mirrors the reference's implicit varchar→number(20,2) coercion
    * (customer-end-to-end-pipeline-script.sql:142-165 pattern). */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(20, 2))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A2/A3 + P1 + O1: hash GROUP BY with count(1) + 7 decimal sums,
    // ordered insert-select (order-end-to-end-pipeline-script.sql:191-212).
    "q1_agg" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("order_count"),
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          sum(col("l_extendedprice").cast(DecimalType(20, 2)) *
              (lit(1).cast(DecimalType(20, 2)) - col("l_discount").cast(DecimalType(20, 2))))
            .cast("double").as("sum_disc_price"),
          moneySum(col("l_discount")).as("sum_discount"),
          moneySum(col("l_tax")).as("sum_tax"),
          // avg via exact-sum / count in double: both engines then perform
          // the same single IEEE division (engine-native AVG over decimal
          // accumulates differently between Spark and DuckDB).
          (moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          // NOTE: cast raw columns to decimal BEFORE any arithmetic — casting
          // a double product to decimal rounds differently in Spark vs DuckDB.
          sum(col("l_extendedprice").cast(DecimalType(20, 2)) *
              col("l_discount").cast(DecimalType(20, 2)))
            .cast("double").as("sum_revenue_lost"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(1) AS order_count,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1 AS DECIMAL(20,2)) - CAST(l_discount AS DECIMAL(20,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS sum_discount,
        |  CAST(sum(CAST(l_tax AS DECIMAL(20,2))) AS DOUBLE) AS sum_tax,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) / count(1) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS sum_revenue_lost
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
