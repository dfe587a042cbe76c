package graft.sql

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.TableStore

/** A reference-shaped SQL script (stage → raw → dim statements, our own
  * text in the reference's dialect) running end-to-end through GraftSql. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("reference-shaped script: create, insert, merge, update, truncate, select") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_gsql").toString, 2)

    GraftSql.executeScript(spark, store,
      """
      |CREATE TABLE stg_item (item_id STRING, item_desc STRING, price STRING)
      |  KEYS (item_id);
      |CREATE TABLE raw_item (item_id STRING, item_desc STRING, price STRING)
      |  KEYS (item_id);
      |CREATE TABLE dim_item (item_id STRING, item_desc STRING, price DECIMAL(7,2))
      |  KEYS (item_id)
      """.stripMargin)
    assert(store.listTables().toSet == Set("stg_item", "raw_item", "dim_item"))

    GraftSql.execute(spark, store,
      "INSERT INTO stg_item SELECT 'A1', 'widget', '10.00' UNION ALL SELECT 'A2', 'gasket', '5.50'")
    assert(store.read("stg_item").count() == 2)

    GraftSql.execute(spark, store,
      """MERGE INTO raw_item AS t USING stg_item AS s
        |ON t.item_id = s.item_id
        |WHEN MATCHED THEN UPDATE SET t.item_desc = s.item_desc, t.price = s.price
        |WHEN NOT MATCHED THEN INSERT (item_id, item_desc, price)
        |VALUES (s.item_id, s.item_desc, s.price)""".stripMargin)
    assert(store.read("raw_item").count() == 2)

    // typed dim load with implicit-coercion casts (F3) in the SELECT
    GraftSql.execute(spark, store,
      "INSERT OVERWRITE dim_item SELECT item_id, item_desc, CAST(price AS DECIMAL(7,2)) FROM raw_item")

    GraftSql.execute(spark, store,
      "UPDATE dim_item SET price = CAST(99.99 AS DECIMAL(7,2)) WHERE item_id = 'A1'")
    val a1 = GraftSql.execute(spark, store,
      "SELECT price FROM dim_item WHERE item_id = 'A1'").get.head()
    assert(a1.getDecimal(0) == new java.math.BigDecimal("99.99"))

    GraftSql.execute(spark, store, "TRUNCATE TABLE stg_item")
    assert(store.read("stg_item").count() == 0)

    val out = GraftSql.execute(spark, store,
      "SELECT item_id, item_desc FROM dim_item ORDER BY item_id").get.collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A1", "A2"))
  }

  test("statement splitting respects quoted semicolons") {
    val stmts = GraftSql.splitStatements("SELECT 'a;b' AS x; SELECT 2")
    assert(stmts == Seq("SELECT 'a;b' AS x", "SELECT 2"))
  }
}
