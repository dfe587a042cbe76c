package graft

import scala.collection.mutable

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
  * table/stream/pipe/task/stage → the create methods, SQL scripts →
  * [[sql]]/[[sqlScript]]), SURVEY.md §1-§3. The SQL surface covers the
  * reference scripts' statements (CREATE STREAM/PIPE/TASK/STAGE, ALTER
  * TASK/PIPE, SHOW, system$ functions) — see [[graft.sql.GraftSql]].
  *
  * Snowflake-style schema-qualified names (`stg.stg_customer`) are
  * accepted everywhere and normalized to their last segment (the store's
  * flat namespace), recorded in [[nameMap]] so later statements can use
  * either form — the reference's own scripts mix both.
  */
class GraftSession(val spark: SparkSession, root: String, numBuckets: Int = 16) {

  val store = new TableStore(spark, root, numBuckets)
  lazy val tasks = new Orchestrator(spark, store)

  private var checkpointSeq = 0

  private val streamsReg = mutable.LinkedHashMap.empty[String, ChangeStream]
  private val pipesReg = mutable.LinkedHashMap.empty[String, Pipe]
  private val stagesReg = mutable.LinkedHashMap.empty[String, String]
  /** full qualified name (lowercased) → flat name, for SQL normalization. */
  private[graft] val nameMap = mutable.LinkedHashMap.empty[String, String]
  /** flat names (lowercased) created UNQUALIFIED in this session — these
    * are collision candidates for later qualified creations. */
  private val unqualifiedCreated = mutable.Set.empty[String]
  /** flat name (lowercased) → qualified name it was CREATED under in this
    * session. The symmetric collision guard checks THIS, not [[nameMap]]:
    * nameMap is also populated by mere reads of qualified names, and
    * reading `stg.customer` must not block `CREATE TABLE customer`. */
  private val qualifiedCreated = mutable.LinkedHashMap.empty[String, String]

  /** Record `full` (e.g. stg.stg_customer) → its flat last segment.
    * Matching is case-insensitive (Snowflake unquoted-identifier
    * semantics); two DIFFERENT qualified names flattening to the same
    * segment (stg.customer vs raw.customer) are rejected rather than
    * silently collapsed onto one store table, and a qualified name whose
    * segment was already created unqualified (`CREATE TABLE customer` then
    * `raw.customer`) is rejected too. */
  private[graft] def recordName(full: String): String = {
    val flat = full.split("\\.").last
    if (full.contains(".")) {
      nameMap.collectFirst {
        case (k, v) if v.equalsIgnoreCase(flat) && k != full.toLowerCase => k
      }.foreach(other => sys.error(
        s"ambiguous flat name '$flat': $full vs $other (the store namespace is flat)"))
      nameMap.get(full.toLowerCase) match {
        case Some(f) if !f.equalsIgnoreCase(flat) => sys.error(s"name clash: $full vs $f")
        case Some(f) => return f // keep the first-recorded casing
        case None =>
          if (unqualifiedCreated.contains(flat.toLowerCase)) sys.error(
            s"ambiguous flat name '$flat': $full vs the unqualified table '$flat' " +
              "created earlier (the store namespace is flat)")
          nameMap(full.toLowerCase) = flat
      }
    }
    flat
  }

  /** [[recordName]] for CREATE sites. Stricter than a read: creating a
    * NEW qualified name whose flat segment is already a store table this
    * session has no mapping for (created unqualified, directly on the
    * store, or by an earlier session under a different qualified name)
    * would silently collapse two tables — reject instead. Unqualified
    * creations are remembered so the reverse order errors too, and an
    * unqualified CREATE whose name is already the flat segment of a
    * recorded QUALIFIED creation is rejected symmetrically (it would
    * silently replace that table). */
  private[graft] def recordCreate(full: String): String = {
    val flat = full.split("\\.").last
    if (full.contains(".")) {
      if (!nameMap.contains(full.toLowerCase) && store.exists(flat) &&
          !nameMap.valuesIterator.exists(_.equalsIgnoreCase(flat)))
        sys.error(s"ambiguous flat name '$flat': creating $full would collide with the " +
          s"existing table '$flat' (created without this qualified name; the store " +
          "namespace is flat — drop it first or use the same name)")
      val r = recordName(full)
      qualifiedCreated.getOrElseUpdate(flat.toLowerCase, full)
      r
    } else {
      qualifiedCreated.get(flat.toLowerCase).foreach(q =>
        sys.error(s"ambiguous flat name '$flat': unqualified CREATE vs the qualified " +
          s"table '$q' created earlier (the store namespace is flat — drop it first " +
          "or use the qualified name)"))
      unqualifiedCreated += flat.toLowerCase
      recordName(full)
    }
  }

  /** Forget name-map state for a dropped table so the advertised recovery
    * ("drop it first") actually works: a later CREATE under either form of
    * the name is no longer flagged as colliding with the dropped one. */
  private[graft] def recordDrop(flat: String): Unit = {
    unqualifiedCreated -= flat.toLowerCase
    qualifiedCreated -= flat.toLowerCase
    nameMap.filterInPlace((_, v) => !v.equalsIgnoreCase(flat))
  }

  // ---- DDL / catalog ------------------------------------------------------

  def createTable(name: String, schema: StructType, keys: Seq[String] = Nil): Unit =
    store.createTable(recordCreate(name), schema, keys)

  def dropTable(name: String): Unit = {
    val flat = recordName(name)
    store.dropTable(flat)
    recordDrop(flat)
  }

  def table(name: String): DataFrame = store.read(recordName(name))

  def listTables(): Seq[String] = store.listTables()

  // ---- CDC / ingestion ----------------------------------------------------

  def createStream(onTable: String, name: String): ChangeStream = {
    val flat = recordName(name)
    val s = ChangeStream.create(store, recordName(onTable), flat)
    streamsReg(flat) = s
    s
  }

  def stream(name: String): ChangeStream = streamsReg(recordName(name))
  def streamOpt(name: String): Option[ChangeStream] = streamsReg.get(recordName(name))
  def dropStream(name: String): Unit = streamsReg.remove(recordName(name))
  private[graft] def allStreams: Seq[ChangeStream] = streamsReg.values.toSeq

  /** SHOW STREAMS (F7): name, source table, consumed-through version,
    * pending version count (cheap — no data IO). */
  def listStreams(): Seq[(String, String, Long, Long)] =
    streamsReg.values.toSeq.map { s =>
      (s.name, s.table, s.offset, store.currentVersion(s.table) - s.offset)
    }

  def createPipe(name: String, landingDir: String, stageTable: String,
      schema: StructType, fmt: CsvFormat = CsvFormat(), format: String = "csv"): Pipe = {
    checkpointSeq += 1
    val flat = recordName(name)
    val p = new Pipe(spark, flat, landingDir, recordName(stageTable), schema, store,
      s"$root/_checkpoints/pipe_${flat}_$checkpointSeq", fmt, format)
    pipesReg(flat) = p
    p
  }

  def pipe(name: String): Pipe = pipesReg(recordName(name))
  def pipeOpt(name: String): Option[Pipe] = pipesReg.get(recordName(name))
  def dropPipe(name: String): Unit = {
    pipesReg.remove(recordName(name)).foreach(_.pause())
  }

  /** SHOW PIPES (F7): name, status. */
  def listPipes(): Seq[(String, String)] =
    pipesReg.values.toSeq.map(p => (p.name, p.status))

  private val viewsReg = mutable.LinkedHashMap.empty[String, String]

  /** CREATE VIEW: the defining SQL is re-evaluated against current table
    * snapshots whenever the session registers views (so a view always
    * reflects the latest committed table versions, like Snowflake's). */
  def createView(name: String, sql: String): Unit =
    viewsReg(recordName(name)) = sql

  def dropView(name: String): Unit = viewsReg.remove(recordName(name))
  private[graft] def allViews: Seq[(String, String)] = viewsReg.toSeq
  def listViews(): Seq[String] = viewsReg.keys.toSeq

  /** CREATE STAGE name URL='dir' — a named external location; `@name/sub`
    * in COPY INTO resolves against it (reference: `@landing/landing/
    * customer`, customer-...sql:54). */
  def createStage(name: String, dir: String): Unit =
    stagesReg(recordName(name)) = dir.stripSuffix("/")

  /** Catalog containers (CREATE WAREHOUSE / DATABASE / SCHEMA / STORAGE
    * INTEGRATION — reference README.md:19-45): recorded no-ops. The store
    * namespace is flat and compute is Spark's, so these carry no behavior;
    * recording them makes the README's setup section executable and
    * SHOW-able instead of erroring in the passthrough. */
  private val catalogReg = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]

  def recordCatalogObject(kind: String, name: String): Unit =
    catalogReg.getOrElseUpdate(kind.toLowerCase, mutable.LinkedHashSet.empty) += name

  def listCatalogObjects(kind: String): Seq[String] =
    catalogReg.get(kind.toLowerCase).map(_.toSeq).getOrElse(Nil)

  /** CREATE FILE FORMAT (reference README.md:37-45): a named reader-options
    * object pipes reference via `FILE_FORMAT = (FORMAT_NAME='x')` or
    * `FILE_FORMAT = x`. Keys are lowercased Snowflake option names. */
  private val fileFormatsReg = mutable.LinkedHashMap.empty[String, Map[String, String]]

  def createFileFormat(name: String, opts: Map[String, String]): Unit =
    fileFormatsReg(recordName(name).toLowerCase) = opts

  def fileFormat(name: String): Option[Map[String, String]] =
    fileFormatsReg.get(recordName(name).toLowerCase)

  def listFileFormats(): Seq[(String, String)] =
    fileFormatsReg.toSeq.map { case (n, o) => (n, o.getOrElse("type", "csv")) }

  def stageDir(name: String): String = stagesReg(recordName(name))
  def listStages(): Seq[(String, String)] = stagesReg.toSeq

  // ---- SQL ----------------------------------------------------------------

  /** One statement of the reference dialect (DDL/DML → None, query →
    * rows). */
  def sql(statement: String): Option[DataFrame] =
    GraftSql.execute(spark, store, statement, Some(this))

  /** A `;`-separated script (`--` comments stripped). */
  def sqlScript(script: String): Option[DataFrame] =
    GraftSql.executeScript(spark, store, script, Some(this))

  /** Worksheet mode: run every statement, return the failures instead of
    * aborting at the first one (see [[GraftSql.executeScriptLenient]]). */
  def sqlScriptLenient(script: String): Seq[(String, String)] =
    GraftSql.executeScriptLenient(spark, store, script, Some(this))
}

object GraftSession {
  def apply(spark: SparkSession, root: String, numBuckets: Int = 16): GraftSession =
    new GraftSession(spark, root, numBuckets)
}
