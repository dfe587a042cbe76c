package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.orchestrate.Task

/** The customer pipeline (SURVEY.md §3 E2, customer shape) built entirely
  * through the user-facing GraftSession facade: pipe → stage + stream →
  * SQL merge into raw → gated DAG → monitoring SELECTs. */
class GraftSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("customer pipeline via the session facade") {
    val root = Files.createTempDirectory("graft_session")
    val landing = Files.createDirectory(root.resolve("landing"))
    val g = GraftSession(spark, root.resolve("wh").toString, numBuckets = 2)

    val stage = StructType.fromDDL("customer_id STRING, first_name STRING, balance STRING")
    g.createTable("stg_customer", stage)
    g.sql("CREATE TABLE raw_customer (customer_id STRING, first_name STRING, balance STRING) KEYS (customer_id)")
    val stm = g.createStream("stg_customer", "stg_customer_stm")
    val pipe = g.createPipe("cust_pipe", landing.toString, "stg_customer", stage)

    g.tasks.createTask(Task("merge_customer",
      body = () => stm.consume { batch =>
        batch.drop("__action").createOrReplaceTempView("stg_customer_stream")
        g.sql("""MERGE INTO raw_customer AS t USING stg_customer_stream AS s
                |ON t.customer_id = s.customer_id
                |WHEN MATCHED THEN UPDATE SET t.first_name = s.first_name, t.balance = s.balance
                |WHEN NOT MATCHED THEN INSERT (customer_id, first_name, balance)
                |VALUES (s.customer_id, s.first_name, s.balance)""".stripMargin)
        ()
      },
      when = () => stm.hasData))
    g.tasks.resume("merge_customer")

    Files.writeString(landing.resolve("c1.csv"),
      "CUSTOMER_ID,FIRST_NAME,BALANCE\n1,Ann,10.00\n2,Bob,20.00\n")
    pipe.runOnce()
    assert(g.tasks.runCycle("merge_customer")("merge_customer") == "SUCCEEDED")
    assert(g.table("raw_customer").count() == 2)

    Files.writeString(landing.resolve("c2.csv"),
      "CUSTOMER_ID,FIRST_NAME,BALANCE\n2,Bobby,22.00\n3,Cat,30.00\n")
    pipe.runOnce()
    assert(g.tasks.runCycle("merge_customer")("merge_customer") == "SUCCEEDED")

    val rows = g.sql("SELECT customer_id, first_name FROM raw_customer ORDER BY customer_id")
      .get.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("1", "Ann"), ("2", "Bobby"), ("3", "Cat")))

    // idle cycle: gate skips
    assert(g.tasks.runCycle("merge_customer")("merge_customer") == "SKIPPED")
    assert(g.listTables().toSet == Set("raw_customer", "stg_customer", "task_history"))
  }
}
