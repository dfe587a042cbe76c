package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.StructType

import graft.store.TableStore

/** SQL statement surface over a [[TableStore]] — enough dialect to run
  * the reference scripts' statement shapes end-to-end (SURVEY.md §2.1 S7/
  * S8, §2.2 P7, A-MERGE via [[MergeSql]]):
  *
  *  - `CREATE TABLE t (c1 type1, ...) [KEYS (k1, ...)]`
  *  - `TRUNCATE [TABLE] t`
  *  - `UPDATE t SET c = expr, ... [WHERE pred]`
  *  - `INSERT INTO t <select…>` / `INSERT OVERWRITE t <select…>`
  *  - `MERGE INTO ...` (delegated to [[MergeSql]])
  *  - any other statement → registered-view `spark.sql` passthrough
  *    (SELECT monitoring queries, E3)
  *
  * SELECT subqueries run through Spark's full SQL stack against snapshot
  * views of the store tables, so all of Catalyst's SQL surface is
  * available inside INSERT bodies.
  */
object GraftSql {

  private val CreateRe =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.]+)\s*\((.+?)\)\s*(?:KEYS\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val TruncateRe = """(?is)^\s*TRUNCATE\s+(?:TABLE\s+)?([\w.]+)\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?\s*;?\s*$""".r
  private val InsertRe =
    """(?is)^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.]+)\s+(SELECT.*|VALUES.*)$""".r
  private val MergeRe = """(?is)^\s*MERGE\s+INTO\s+.*$""".r

  /** Execute one statement; DDL/DML return None, queries return rows. */
  def execute(spark: SparkSession, store: TableStore, sql: String): Option[DataFrame] =
    sql match {
      case CreateRe(name, colsDdl, keys) =>
        val schema = StructType.fromDDL(colsDdl)
        val keyCols = Option(keys).map(_.split(",").toIndexedSeq.map(_.trim)).getOrElse(Nil)
        store.createTable(name, schema, keyCols)
        None
      case TruncateRe(name) =>
        store.truncate(name)
        None
      case UpdateRe(name, setClause, whereClause) =>
        val sets = MergeSql.splitTopLevel(setClause, ',').map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"bad SET assignment: $a")
          a.take(i).trim -> expr(a.drop(i + 1).trim)
        }.toMap
        val pred = Option(whereClause).map(expr).getOrElse(expr("true"))
        store.update(name, pred, sets)
        None
      case InsertRe(mode, name, body) =>
        store.registerAllViews()
        val rows = spark.sql(body)
        // INSERT ... SELECT is POSITIONAL (Snowflake semantics): rename
        // the query's columns to the target schema by position before the
        // store's by-name align
        val targetNames = store.schemaOf(name).fieldNames
        require(rows.columns.length <= targetNames.length,
          s"INSERT query has ${rows.columns.length} columns but $name has ${targetNames.length}")
        val positional = rows.toDF(targetNames.take(rows.columns.length).toIndexedSeq: _*)
        if (mode.equalsIgnoreCase("OVERWRITE")) store.overwrite(name, positional)
        else store.append(name, positional)
        None
      case MergeRe() =>
        store.registerAllViews()
        MergeSql.run(spark, store, sql)
        None
      case other =>
        store.registerAllViews()
        Some(spark.sql(other))
    }

  /** Execute a script of `;`-separated statements; returns the rows of
    * the final statement if it was a query. */
  def executeScript(spark: SparkSession, store: TableStore, script: String): Option[DataFrame] =
    splitStatements(script).foldLeft(Option.empty[DataFrame]) { (_, stmt) =>
      execute(spark, store, stmt)
    }

  /** Split on top-level semicolons (quotes respected). */
  private[sql] def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    script.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' => quote = ch; cur += ch
        case ';' => out += cur.toString; cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
