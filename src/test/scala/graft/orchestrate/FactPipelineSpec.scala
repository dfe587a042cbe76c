package graft.orchestrate

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.ChangeStream
import graft.ops.FactRebuild
import graft.store.TableStore

/** Replay of the reference's ORDER pipeline shape (SURVEY.md §3 E2,
  * order-end-to-end-pipeline-script.sql:92-229): composite-key merge into
  * raw, then an INSERT OVERWRITE full fact rebuild that reads the WHOLE
  * raw table but is GATED on the raw stream (fact-gate subtlety: the gate
  * stream's offset must still be advanced), a truncate task, and a
  * negated-gate resume task (`when NOT system$stream_has_data`). */
class FactPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rawSchema = StructType(Seq(
    StructField("order_date", StringType), StructField("item_id", StringType),
    StructField("customer_id", StringType), StructField("order_quantity", StringType),
    StructField("sale_price", StringType)))

  test("order pipeline: overwrite rebuild, gate consumption, negated gate") {
    val root = Files.createTempDirectory("graft_fact")
    val store = new TableStore(spark, root.toString, numBuckets = 4)
    store.createTable("stg_order", rawSchema)
    store.createTable("raw_order", rawSchema,
      keys = Seq("order_date", "item_id", "customer_id")) // composite key (J4)
    store.createTable("fact_order", StructType(Seq(
      StructField("order_date", StringType),
      StructField("order_count", LongType),
      StructField("sum_qty", DecimalType(20, 2)),
      StructField("sum_sale", DecimalType(20, 2)))))

    val stgStm = ChangeStream.create(store, "stg_order", "stg_order_stm")
    val rawStm = ChangeStream.create(store, "raw_order", "fact_order_stm")

    var pipePaused = false
    val orch = new Orchestrator(spark, store, runLogTable = "task_history_order")
    orch.createTask(Task("pause_pipe", () => { pipePaused = true },
      when = () => stgStm.hasData))
    orch.createTask(Task("raw_order_tsk",
      body = () => stgStm.consume(batch => store.merge("raw_order", batch.drop("__action"))),
      after = Seq("pause_pipe"), when = () => stgStm.hasData))
    orch.createTask(Task("fact_order_tsk",
      body = () => {
        // full rebuild from the WHOLE raw table (not the stream)…
        val raw = store.read("raw_order")
        val fact = FactRebuild.rebuild(
          raw, dims = Nil,
          groupCols = Seq(col("order_date")),
          aggs = Seq(count(lit(1)).as("order_count"),
            sum(col("order_quantity").cast(DecimalType(20, 2))).as("sum_qty"),
            sum(col("sale_price").cast(DecimalType(20, 2))).as("sum_sale")),
          orderCols = Seq(col("order_date")))
        store.overwrite("fact_order", fact)
        rawStm.markConsumed() // …but the GATE stream must advance (E2 step 3)
      },
      after = Seq("raw_order_tsk"), when = () => rawStm.hasData))
    orch.createTask(Task("truncate_stage", () => store.truncate("stg_order"),
      after = Seq("fact_order_tsk")))
    orch.createTask(Task("play_pipe", () => { pipePaused = false },
      after = Seq("truncate_stage"),
      when = () => !stgStm.hasData)) // negated gate (order-...sql:226-227)
    Seq("pause_pipe", "raw_order_tsk", "fact_order_tsk", "truncate_stage", "play_pipe")
      .foreach(orch.resume)

    // cycle 1: two orders land
    store.append("stg_order", Seq(
      ("2024-01-01", "I1", "C1", "2", "10.00"),
      ("2024-01-01", "I2", "C1", "1", "5.00")).toDF(rawSchema.fieldNames.toIndexedSeq: _*))
    val s1 = orch.runCycle("pause_pipe")
    assert(s1.values.count(_ == "SUCCEEDED") == 5)
    assert(!pipePaused) // resumed by play_pipe at cycle end
    val f1 = store.read("fact_order").collect()
    assert(f1.length == 1 && f1.head.getAs[Long]("order_count") == 2)
    assert(f1.head.getAs[java.math.BigDecimal]("sum_qty").longValue == 3)
    assert(!rawStm.hasData, "fact gate stream must be consumed")

    // cycle 2: same composite key updates qty; new date inserts
    store.append("stg_order", Seq(
      ("2024-01-01", "I1", "C1", "7", "10.00"), // matched → update
      ("2024-01-02", "I3", "C2", "4", "8.00")).toDF(rawSchema.fieldNames.toIndexedSeq: _*))
    val s2 = orch.runCycle("pause_pipe")
    assert(s2("fact_order_tsk") == "SUCCEEDED")
    val f2 = store.read("fact_order").orderBy("order_date").collect()
    assert(f2.length == 2)
    assert(f2(0).getAs[java.math.BigDecimal]("sum_qty").longValue == 8)  // 7 + 1
    assert(f2(1).getAs[Long]("order_count") == 1)
    assert(store.read("raw_order").count() == 3) // composite upsert, not append

    // cycles 3-4: scheduled loop while idle — everything gated off,
    // overwrite idempotent (the reference's 1-minute schedule, compressed)
    val loopStates = orch.runLoop("pause_pipe", intervalMs = 50L, cycles = 2)
    loopStates.foreach { s3 =>
      assert(s3("pause_pipe") == "SKIPPED" && s3("fact_order_tsk") == "SKIPPED")
      assert(s3("play_pipe") == "SUCCEEDED") // negated gate true when idle
    }
    assert(store.read("fact_order").count() == 2)
  }
}
