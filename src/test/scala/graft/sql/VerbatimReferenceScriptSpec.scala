package graft.sql

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, TestSpark}

/** Runs the reference's customer pipeline script VERBATIM — the actual
  * file from the reference repo, unmodified — through worksheet-mode
  * `sqlScriptLenient`, then drives the landed DAG over the reference's own
  * source_data CSVs (with their quirks: delta_1 has a leading blank line,
  * no header, and a missing trailing column).
  *
  * The reference script contains two statements that fail in Snowflake
  * too (SURVEY.md §0 known-bugs): `alter task pause_pipe resume/suspend`
  * names a task that doesn't exist, and `play_pipe_customer` declares
  * `after transformed.truncate_staging_table` (missing `_customer`).
  * Worksheet mode surfaces exactly those and runs everything else.
  *
  * Both the script and the CSVs are READ from /root/reference at test
  * time (nothing is copied into this repo); the test cancels (assume) if
  * the reference checkout isn't present.
  */
class VerbatimReferenceScriptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val scriptPath =
    Paths.get("/root/reference/etl_script/customer-end-to-end-pipeline-script.sql")
  private val dataDir = Paths.get("/root/reference/source_data")

  /** customer_ids in a landed CSV the way the pipe parses it: skip_header=1
    * drops the first line (header or leading blank), short rows pad. */
  private def idsOf(p: Path): Set[String] =
    scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(p)).asScala
      .drop(1).map(_.trim).filter(_.nonEmpty)
      .map(_.split(",")(0)).toSet

  test("all three reference scripts run verbatim in one session (shared warehouse)") {
    val etl = Paths.get("/root/reference/etl_script")
    assume(Files.exists(etl) && Files.exists(dataDir), "reference repo not mounted")
    val root = Files.createTempDirectory("graft_verbatim3")
    // the pipes expect @landing/landing/{customer,item,order}
    val stage = root.resolve("stage")
    Seq("customer", "item", "order").foreach(t =>
      Files.createDirectories(stage.resolve("landing").resolve(t)))
    val g = GraftSession(spark, root.resolve("store").toString, numBuckets = 4)
    g.sql(s"create stage landing url = '$stage'")

    // deploy order matches the reference: item's pause task references the
    // customer pipe, order's fact task joins both dim tables
    val errors = Seq("customer", "item", "order").flatMap { t =>
      g.sqlScriptLenient(Files.readString(etl.resolve(s"$t-end-to-end-pipeline-script.sql")))
    }
    // every failure is one of the reference's own script bugs (SURVEY.md §0):
    //  - customer: alter/after names that don't exist (5 statements)
    //  - item: selects from raw.dim_item_stm (stream is raw_item_stm)
    //  - order: a missing semicolon fuses two system$ selects into one
    val errStmts = errors.map(_._1.toLowerCase.replaceAll("\\s+", " "))
    assert(errStmts.forall(s =>
      s.startsWith("alter task pause_pipe ") ||
        s.contains("after transformed.truncate_staging_table as") ||
        s.startsWith("alter task play_pipe_customer ") ||
        s.contains("dim_item_stm") ||
        (s.contains("system$pipe_force_resume") && s.contains("system$pipe_status"))),
      s"unexpected statement failures:\n${errors.mkString("\n")}")
    assert(errors.length == 7, s"expected the 7 known-bad statements, got ${errors.length}:\n$errors")

    assert(g.sql("show tasks").get.count() == 14) // 15 written, 1 create fails
    assert(g.sql("show pipes").get.count() == 3)
    assert(g.sql("show streams").get.count() == 6)

    // scripts end suspended; resume the DAGs (incl. the root the customer
    // script meant to resume via its typo), skip the pipe-restarting tails
    Seq("pause_pipe_customer", "customer_raw_tsk", "dim_customer_tsk",
      "truncate_staging_table_customer",
      "pause_pipe_item", "item_raw_tsk", "dim_item_tsk", "truncate_staging_table_item",
      "pause_pipe_order", "raw_order_tsk", "fact_order_tsk", "truncate_staging_table_order")
      .foreach(t => g.sql(s"alter task $t resume"))

    // land the reference's own history fixtures and drain the pipes
    Seq("customer", "item", "order").foreach { t =>
      Files.copy(dataDir.resolve(s"${t}_history.csv"),
        stage.resolve("landing").resolve(t).resolve(s"${t}_history.csv"))
      g.sql(s"alter pipe stg.stg_${t}_pipe refresh")
    }
    val c = g.tasks.runCycle("pause_pipe_customer")
    assert(c("dim_customer_tsk") == "SUCCEEDED", s"customer cycle: $c")
    val i = g.tasks.runCycle("pause_pipe_item")
    assert(i("dim_item_tsk") == "SUCCEEDED", s"item cycle: $i")
    val o = g.tasks.runCycle("pause_pipe_order")
    assert(o("raw_order_tsk") == "SUCCEEDED" && o("fact_order_tsk") == "SUCCEEDED",
      s"order cycle: $o")

    assert(g.table("dim_customer").count() == idsOf(dataDir.resolve("customer_history.csv")).size)
    val dimItem = g.table("dim_item").collect()
    assert(dimItem.length == idsOf(dataDir.resolve("item_history.csv")).size)
    // typed casts from the varchar stage landed: date + decimal columns
    assert(dimItem.forall(_.getAs[java.math.BigDecimal]("price") != null))
    assert(dimItem.exists(_.getAs[java.sql.Date]("start_date") != null))
    assert(dimItem.forall(_.getAs[Long]("item_dim_key") > 0))
    assert(g.table("raw_order").count() == 18)
    // the fact join yields whatever the reference's (inconsistent) fixture
    // data yields — their order customers aren't in customer_history (the
    // script's commented tail patches ids by hand); assert our fact equals
    // an independently-computed expectation rather than a magic number
    val expected = g.table("raw_order").alias("ro")
      .join(g.table("dim_customer").alias("dc"), col("dc.customer_id") === col("ro.customer_id"))
      .join(g.table("dim_item").alias("di"),
        col("di.item_id") === col("ro.item_id") && col("di.end_date").isNull)
      .groupBy("ro.order_date", "dc.customer_dim_key", "di.item_dim_key")
      .count().count()
    assert(g.table("fact_order").count() == expected)
  }

  test("customer-end-to-end-pipeline-script.sql runs verbatim in worksheet mode") {
    assume(Files.exists(scriptPath) && Files.exists(dataDir), "reference repo not mounted")
    val root = Files.createTempDirectory("graft_verbatim")
    val landing = Files.createDirectories(root.resolve("stage/landing/customer"))
    val g = GraftSession(spark, root.resolve("store").toString, numBuckets = 4)
    // the one piece of environment the script assumes: the @landing stage
    g.sql(s"create stage landing url = '${root.resolve("stage")}'")

    val script = Files.readString(scriptPath)
    val errors = g.sqlScriptLenient(script)
    val errStmts = errors.map(_._1.toLowerCase.replaceAll("\\s+", " "))
    assert(errStmts.forall(s =>
      s.startsWith("alter task pause_pipe ") ||            // nonexistent task name
        s.contains("after transformed.truncate_staging_table as") || // missing _customer
        s.startsWith("alter task play_pipe_customer ")),   // knock-on: create failed above
      s"unexpected statement failures:\n${errors.mkString("\n")}")
    assert(errors.length == 5, s"expected exactly the 5 known-bad statements, got:\n$errors")

    // objects landed
    assert(g.listTables().toSet.intersect(
      Set("raw_customer", "stg_customer", "dim_customer")).size == 3)
    assert(g.sql("show streams").get.collect().map(_.getString(0)).toSet ==
      Set("stg_customer_stm", "raw_customer_stm"))
    assert(g.sql("show pipes").get.head().getString(0) == "stg_customer_pipe")
    assert(g.sql("show tasks").get.count() == 4) // play_pipe_customer failed to land

    // the script's tail suspends every task (worksheet replay); resume the
    // real ones, plus the root the script meant to resume via its typo
    Seq("pause_pipe_customer", "customer_raw_tsk", "dim_customer_tsk",
      "truncate_staging_table_customer").foreach(t => g.sql(s"alter task $t resume"))

    // ---- cycle 1: the reference's history file -----------------------------
    val history = dataDir.resolve("customer_history.csv")
    Files.copy(history, landing.resolve("customer_history.csv"))
    g.sql("alter pipe stg.stg_customer_pipe refresh")
    val histIds = idsOf(history)
    assert(g.table("stg_customer").count() == histIds.size)
    val c1 = g.tasks.runCycle("pause_pipe_customer")
    assert(c1("customer_raw_tsk") == "SUCCEEDED" && c1("dim_customer_tsk") == "SUCCEEDED")
    assert(g.table("raw_customer").count() == histIds.size)
    val dim1 = g.table("dim_customer").collect()
    assert(dim1.length == histIds.size)
    assert(dim1.map(_.getAs[Long]("customer_dim_key")).toSet.size == dim1.length,
      "autoincrement keys unique")
    assert(dim1.forall(_.getAs[java.sql.Timestamp]("added_timestamp") != null),
      "default current_timestamp() applied")
    assert(g.table("stg_customer").count() == 0, "stage truncated by the DAG")

    // ---- cycle 2: delta_1 (leading blank line, headerless, short rows) -----
    val delta = dataDir.resolve("customer_delta_1.csv")
    Files.copy(delta, landing.resolve("customer_delta_1.csv"))
    g.sql("alter pipe stg.stg_customer_pipe refresh")
    val c2 = g.tasks.runCycle("pause_pipe_customer")
    assert(c2("customer_raw_tsk") == "SUCCEEDED" && c2("dim_customer_tsk") == "SUCCEEDED")
    val allIds = histIds ++ idsOf(delta)
    assert(g.table("dim_customer").count() == allIds.size)
    assert(g.table("raw_customer").count() == allIds.size)
    // delta rows lack the trailing is_active column → padded null through
    // the pipe (error_on_column_count_mismatch=false), merged into raw
    val newIds = (idsOf(delta) -- histIds).toSeq
    if (newIds.nonEmpty) {
      val r = g.table("raw_customer").filter(col("customer_id") === newIds.head).head()
      assert(r.getAs[String]("is_active") == null)
    }

    // ---- the script's monitoring tail works against the landed objects -----
    assert(g.sql("select system$pipe_status('stg.stg_customer_pipe')").get
      .head().getString(0) == "PAUSED")
    val hist = g.sql(
      """select name, state from table(information_schema.task_history())
        |order by scheduled_time desc""".stripMargin).get
    assert(hist.filter(col("state") === "SUCCEEDED").count() >= 4)
  }

  test("README object-creation section runs verbatim; pipes use the named file format") {
    val readme = Paths.get("/root/reference/README.md")
    assume(Files.exists(readme) && Files.exists(dataDir), "reference repo not mounted")
    // extract the fenced code blocks of the "create the required objects"
    // section (warehouse, database, schemas, file format) — verbatim text
    val text = Files.readString(readme)
    val blocks = """(?s)```bash\s*(.*?)```""".r.findAllMatchIn(text).map(_.group(1).trim)
      .filter(_.toLowerCase.startsWith("create")).toSeq
    assert(blocks.size >= 4, s"expected the README's 4 setup blocks, got ${blocks.size}")

    val root = Files.createTempDirectory("graft_readme")
    val g = GraftSession(spark, root.resolve("store").toString, numBuckets = 4)
    val errors = blocks.flatMap(b => g.sqlScriptLenient(b))
    assert(errors.isEmpty, s"README setup must run clean, got: $errors")
    assert(g.sql("SHOW WAREHOUSES").get.collect().map(_.getString(0)).toSeq ==
      Seq("ayo_warehouse"))
    assert(g.sql("SHOW DATABASES").get.collect().map(_.getString(0)).toSeq == Seq("demo"))
    assert(g.sql("SHOW SCHEMAS").get.count() == 3)
    assert(g.sql("SHOW FILE FORMATS").get.head().getString(0) == "csv")

    // a pipe referencing the named format parses with ITS options: the
    // README format declares null_if ('\\N') and quote \042
    val stage = root.resolve("stage")
    Files.createDirectories(stage.resolve("landing").resolve("t"))
    Files.writeString(stage.resolve("landing/t/part1.csv"),
      "id,name\n1,\"alpha, inc\"\n2,\\N\n")
    g.sqlScript(
      s"""create stage landing url = '$stage';
         |create table stg_t (id bigint, name string) keys (id);
         |create pipe t_pipe as copy into stg_t from @landing/landing/t
         |  file_format = (format_name = 'csv')""".stripMargin)
    g.sql("alter pipe t_pipe refresh")
    val rows = g.table("stg_t").orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "alpha, inc", "quoted delimiter must survive")
    assert(rows(1).isNullAt(1), "\\N must read as NULL via the named format")
  }
}
