package graft.orchestrate

import java.nio.file.{Files, Path}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.ChangeStream
import graft.ingest.{CsvFormat, CsvIngest}
import graft.ops.{DedupLatest, Merge, SurrogateKey}
import graft.store.TableStore

/** End-to-end replay of the reference's item pipeline shape (SURVEY.md §3
  * E2): CSV landing → stage table + stream → dedup'd MERGE into raw →
  * stream → typed MERGE into dim with surrogate keys → truncate stage —
  * driven by the task-DAG orchestrator with stream-gates, across three
  * scheduler cycles (history, delta_1+delta_2 same-key latest-wins,
  * empty cycle). Fixtures mirror the reference CSV quirks (leading blank
  * line, headerless file, missing trailing column — FIXTURES.md §A) while
  * being our own data.
  */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val stageSchema = StructType(Seq(
    StructField("item_id", StringType),
    StructField("item_desc", StringType),
    StructField("start_date", StringType),
    StructField("price", StringType),
    StructField("item_class", StringType)))

  private val dimSchema = StructType(Seq(
    StructField("item_dim_key", LongType),
    StructField("item_id", StringType),
    StructField("item_desc", StringType),
    StructField("start_date", DateType),
    StructField("price", DecimalType(7, 2)),
    StructField("item_class", StringType),
    StructField("updated_ts", TimestampType)))

  private def writeFile(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content)

  test("three-cycle stage→raw→dim DAG replay with latest-wins dedup") {
    val root = Files.createTempDirectory("graft_e2e")
    val landing = Files.createDirectory(root.resolve("landing"))
    val store = new TableStore(spark, root.resolve("store").toString, numBuckets = 4)

    store.createTable("stg_item", stageSchema)
    store.createTable("raw_item", stageSchema, keys = Seq("item_id"))
    store.createTable("dim_item", dimSchema, keys = Seq("item_id"))

    val stgStream = ChangeStream.create(store, "stg_item", "stg_item_stm")
    val rawStream = ChangeStream.create(store, "raw_item", "raw_item_stm")

    // landing loader stands in for the pipe body (Pipe itself is covered
    // by PipeSpec; here the DAG wiring is under test)
    var loaded = Set.empty[String]
    def loadLanding(): Unit = {
      val files = landing.toFile.listFiles().map(_.getAbsolutePath).filterNot(loaded).sorted
      if (files.nonEmpty) {
        loaded ++= files
        store.append("stg_item",
          CsvIngest.read(spark, files.toIndexedSeq, stageSchema, CsvFormat(skipHeaderLines = 1)))
      }
    }

    val orch = new Orchestrator(spark, store)
    orch.createTask(Task("load_landing", () => loadLanding()))
    orch.createTask(Task("raw_item_tsk",
      body = () => stgStream.consume { batch =>
        val latest = DedupLatest(batch.drop("__action"),
          Seq("item_id"), Seq(col("start_date").desc, col("price").desc))
        store.merge("raw_item", latest)
      },
      after = Seq("load_landing"),
      when = () => stgStream.hasData))
    orch.createTask(Task("dim_item_tsk",
      body = () => rawStream.consume { batch =>
        val latest = DedupLatest(batch.drop("__action"),
          Seq("item_id"), Seq(col("start_date").desc, col("price").desc))
        val typed = latest.select(
          col("item_id"), col("item_desc"),
          col("start_date").cast(DateType).as("start_date"),
          col("price").cast(DecimalType(7, 2)).as("price"),
          col("item_class"),
          current_timestamp().as("updated_ts"))
        val dim = store.read("dim_item")
        val merged = Merge.upsert(
          dim.drop("item_dim_key"), typed,
          Seq("item_id"))
        // stable surrogate keys: keep existing, continue sequence for new
        val keyed = merged.join(dim.select("item_id", "item_dim_key"), Seq("item_id"), "left_outer")
        store.overwrite("dim_item", SurrogateKey.assign(
          keyed.select(dimSchema.fieldNames.map(col).toIndexedSeq: _*), "item_dim_key"))
      },
      after = Seq("raw_item_tsk"),
      when = () => rawStream.hasData))
    orch.createTask(Task("truncate_stage",
      body = () => store.truncate("stg_item"),
      after = Seq("dim_item_tsk")))

    Seq("load_landing", "raw_item_tsk", "dim_item_tsk", "truncate_stage").foreach(orch.resume)

    // ---- cycle 1: history file (with header) -----------------------------
    writeFile(landing, "item_history.csv",
      """ITEM_ID,ITEM_DESC,START_DATE,PRICE,ITEM_CLASS
        |A1,widget,2024-01-01,10.00,tools
        |A2,gasket,2024-01-02,5.50,parts
        |A3,grommet,2024-01-03,2.25,parts
        |""".stripMargin)
    val s1 = orch.runCycle("load_landing")
    assert(s1("raw_item_tsk") == "SUCCEEDED" && s1("dim_item_tsk") == "SUCCEEDED")
    assert(store.read("raw_item").count() == 3)
    val dim1 = store.read("dim_item").orderBy("item_id").collect()
    assert(dim1.map(_.getAs[String]("item_id")).toSeq == Seq("A1", "A2", "A3"))
    val keys1 = dim1.map(r => r.getAs[String]("item_id") -> r.getAs[Long]("item_dim_key")).toMap
    assert(keys1.values.toSet.size == 3)
    assert(store.read("stg_item").count() == 0) // truncated

    // ---- cycle 2: two deltas, same key twice → latest start_date wins ----
    // delta_1: leading blank line, NO header; A4 missing trailing column
    writeFile(landing, "item_delta_1.csv",
      "\nA2,gasket-v2,2024-02-01,6.00,parts\nA4,flange,2024-02-01,9.99\n")
    // delta_2: same A2 key with a LATER start_date — must win
    writeFile(landing, "item_delta_2.csv",
      """ITEM_ID,ITEM_DESC,START_DATE,PRICE,ITEM_CLASS
        |A2,gasket-v3,2024-03-01,7.00,parts
        |""".stripMargin)
    val s2 = orch.runCycle("load_landing")
    assert(s2("raw_item_tsk") == "SUCCEEDED")
    val raw2 = store.read("raw_item").orderBy("item_id").collect()
    assert(raw2.length == 4)
    val a2 = raw2.find(_.getAs[String]("item_id") == "A2").get
    assert(a2.getAs[String]("item_desc") == "gasket-v3") // latest wins
    assert(a2.getAs[String]("start_date") == "2024-03-01")

    val dim2 = store.read("dim_item").orderBy("item_id").collect()
    assert(dim2.length == 4)
    val keys2 = dim2.map(r => r.getAs[String]("item_id") -> r.getAs[Long]("item_dim_key")).toMap
    // surrogate keys stable across merges; new key continues the sequence
    keys1.foreach { case (id, k) => assert(keys2(id) == k, s"key for $id changed") }
    assert(keys2("A4") > keys1.values.max)
    // delta_1's missing trailing column landed as null in raw for A4? no —
    // A4 came only from delta_1 (null item_class), check the null survived
    val a4 = dim2.find(_.getAs[String]("item_id") == "A4").get
    assert(a4.getAs[String]("item_class") == null)
    assert(a4.getAs[java.math.BigDecimal]("price").doubleValue() == 9.99)

    // ---- cycle 3: nothing landed → gates skip, truncate still runs -------
    val s3 = orch.runCycle("load_landing")
    assert(s3("raw_item_tsk") == "SKIPPED" && s3("dim_item_tsk") == "SKIPPED")
    assert(s3("truncate_stage") == "SUCCEEDED")

    // ---- run log (task_history analogue) ---------------------------------
    val hist = orch.taskHistory(Seq("raw_item_tsk", "dim_item_tsk"))
    assert(hist.filter(col("state") === "SUCCEEDED").count() == 4)
    assert(hist.filter(col("state") === "SKIPPED").count() == 2)

    // failed body must not consume the stream (SURVEY.md §7 hard parts)
    store.append("stg_item", store.read("raw_item").limit(1))
    intercept[RuntimeException] {
      stgStream.consume { _ => throw new RuntimeException("boom") }
    }
    assert(stgStream.hasData, "failed consume must not advance the offset")
  }
}
