package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.cdc.ChangeStream
import graft.ingest.{CsvFormat, Pipe}
import graft.orchestrate.{Orchestrator, Task}
import graft.sql.GraftSql
import graft.store.TableStore

/** The user-facing entry point — everything a user of the reference
  * warehouse project needs, wired over one table store:
  *
  * {{{
  *   val g = GraftSession(spark, "/data/warehouse")
  *   g.createTable("stg_item", schema)                      // DDL
  *   val stm  = g.createStream("stg_item", "stg_item_stm")  // CDC stream
  *   val pipe = g.createPipe("p1", "/landing/item", "stg_item", schema)
  *   g.tasks.createTask(Task("raw_item_tsk", () => stm.consume(...)))
  *   g.sql("MERGE INTO raw_item t USING stg_item s ON ...") // dialect
  *   g.sql("SELECT * FROM dim_item").get.show()
  * }}}
  *
  * Mirrors the reference's object model 1:1 (database → store root,
  * table/stream/pipe/task → the four create methods, SQL scripts →
  * [[sql]]/[[sqlScript]]), SURVEY.md §1-§3.
  */
class GraftSession(val spark: SparkSession, root: String, numBuckets: Int = 16) {

  val store = new TableStore(spark, root, numBuckets)
  lazy val tasks = new Orchestrator(spark, store)

  private var checkpointSeq = 0

  // ---- DDL / catalog ------------------------------------------------------

  def createTable(name: String, schema: StructType, keys: Seq[String] = Nil): Unit =
    store.createTable(name, schema, keys)

  def dropTable(name: String): Unit = store.dropTable(name)

  def table(name: String): DataFrame = store.read(name)

  def listTables(): Seq[String] = store.listTables()

  // ---- CDC / ingestion ----------------------------------------------------

  def createStream(onTable: String, name: String): ChangeStream =
    ChangeStream.create(store, onTable, name)

  def createPipe(name: String, landingDir: String, stageTable: String,
      schema: StructType, fmt: CsvFormat = CsvFormat()): Pipe = {
    checkpointSeq += 1
    new Pipe(spark, name, landingDir, stageTable, schema, store,
      s"$root/_checkpoints/pipe_${name}_$checkpointSeq", fmt)
  }

  // ---- SQL ----------------------------------------------------------------

  /** One statement of the reference dialect (DDL/DML → None, query →
    * rows). */
  def sql(statement: String): Option[DataFrame] =
    GraftSql.execute(spark, store, statement)

  /** A `;`-separated script. */
  def sqlScript(script: String): Option[DataFrame] =
    GraftSql.executeScript(spark, store, script)
}

object GraftSession {
  def apply(spark: SparkSession, root: String, numBuckets: Int = 16): GraftSession =
    new GraftSession(spark, root, numBuckets)
}
