package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

import graft.ops.Merge
import graft.store.TableStore

/** SQL surface for the reference's MERGE INTO dialect (SURVEY.md §7
  * optional stretch; reference: customer-end-to-end-pipeline-script
  * .sql:77-114 etc.) so reference-shaped statements run verbatim against
  * a [[TableStore]]:
  *
  * {{{
  *   MERGE INTO raw_item AS t USING stg_item_stream AS s
  *   ON t.item_id = s.item_id [AND t.k2 = s.k2 ...]
  *   WHEN MATCHED THEN UPDATE SET t.c = <expr>, ...
  *   WHEN NOT MATCHED THEN INSERT (c1, c2, ...) VALUES (<expr>, ...)
  * }}}
  *
  * The ON clause must be a conjunction of t.<col> = s.<col> equalities
  * (the only shape the reference uses — its composite-key merge is four
  * AND'ed equalities). UPDATE/INSERT value expressions are parsed by
  * Spark's own expression parser (`expr`), with `t.`/`s.` qualifiers
  * rewritten to the merge-internal aliases, so any Spark SQL scalar
  * expression works (casts, current_timestamp(), arithmetic, …).
  *
  * Execution delegates to [[Merge.upsert]] (full-outer join rewrite) and
  * the store's bucket-pruned atomic commit ([[TableStore.merge]] handles
  * storage when the target is a store table).
  */
object MergeSql {

  final case class ParsedMerge(
      target: String, source: String,
      targetAlias: String, sourceAlias: String,
      keys: Seq[String],
      matchedSet: Option[Map[String, String]],     // col -> raw expr text
      insertCols: Option[(Seq[String], Seq[String])], // (cols, raw expr texts)
      matchedDelete: Option[String] = None,        // raw cond ("true" if bare)
      sourceQuery: Option[String] = None)          // USING (subquery) text

  /** Placeholder source name substituted for a `USING (subquery)`. */
  val SubquerySource = "__merge_subquery_src"

  // aliases are optional (the reference writes `MERGE INTO raw.raw_customer
  // USING stg.stg_customer_stm ON raw_customer.customer_id = ...`,
  // qualifying by the bare table name) — a missing alias defaults to the
  // last dot-segment of the table/source name
  private val MergePattern =
    ("""(?is)^\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?\s+""" +
      """USING\s+([\w.]+)(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?\s+""" +
      """ON\s+(.*?)\s*""" +
      """(?:WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*?)\s*)?""" +
      """(?:WHEN\s+NOT\s+MATCHED\s+THEN\s*INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*;?\s*)?$""").r

  // the lazy condition group must not cross into another WHEN/THEN clause
  // (otherwise `WHEN MATCHED AND c THEN UPDATE ... WHEN MATCHED THEN
  // DELETE` would swallow the UPDATE branch as a garbage delete condition)
  private val DeleteBranch =
    """(?is)WHEN\s+MATCHED\s+(?:AND\s+((?:(?!\b(?:THEN|WHEN)\b).)+?)\s+)?THEN\s+DELETE""".r

  /** The DELETE branch can appear anywhere among the WHEN clauses
    * (Snowflake allows any order); pull it out first, then parse the
    * remaining UPDATE/INSERT shape with the main pattern. A
    * `USING (subquery) AS alias` source (the reference's item script
    * dedups its stream with a row_number subquery, item-...sql:71-75) is
    * extracted into [[ParsedMerge.sourceQuery]] before pattern matching. */
  def parse(sql: String): ParsedMerge = {
    val (sql1, subq) = extractUsingSubquery(sql)
    val pm = DeleteBranch.findFirstMatchIn(sql1) match {
      case Some(m) =>
        val cond = Option(m.group(1)).map(_.trim).getOrElse("true")
        val rest = sql1.substring(0, m.start) + sql1.substring(m.end)
        parseNoDelete(rest).copy(matchedDelete = Some(cond))
      case None => parseNoDelete(sql1)
    }
    pm.copy(sourceQuery = subq)
  }

  /** Replace `USING ( … )` (balanced, quote-aware) with the placeholder
    * source name; returns (rewritten sql, extracted subquery text). */
  private def extractUsingSubquery(sql: String): (String, Option[String]) =
    """(?is)\bUSING\s*\(""".r.findFirstMatchIn(sql) match {
      case None => (sql, None)
      case Some(m) =>
        var depth = 1
        var i = m.end
        var quote: Char = 0
        while (i < sql.length && depth > 0) {
          val ch = sql(i)
          if (quote != 0) { if (ch == quote) quote = 0 }
          else ch match {
            case '\'' | '"' => quote = ch
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        require(depth == 0, s"unbalanced parens in USING subquery:\n$sql")
        val sub = sql.substring(m.end, i - 1).trim
        (sql.substring(0, m.start) + s" USING $SubquerySource " + sql.substring(i), Some(sub))
    }

  private def parseNoDelete(sql: String): ParsedMerge = sql match {
    case MergePattern(target, tAlias0, source, sAlias0, onClause, setClause, insCols, insVals) =>
      val tAlias = Option(tAlias0).getOrElse(target.split("\\.").last)
      val sAlias = Option(sAlias0).getOrElse(source.split("\\.").last)
      val keys = onClause.split("(?i)\\s+AND\\s+").toIndexedSeq.map { eq =>
        val sides = eq.split("=").map(_.trim)
        require(sides.length == 2, s"ON clause must be equalities: $eq")
        val (l, r) = (sides(0), sides(1))
        val lcol = stripQualifier(l, tAlias, sAlias)
        val rcol = stripQualifier(r, tAlias, sAlias)
        require(lcol == rcol,
          s"ON equality must join the same column name on both sides, got $l = $r")
        lcol
      }
      val matched = Option(setClause).map(splitTopLevel(_, ',').map { a =>
        val i = a.indexOf('=')
        require(i > 0, s"bad SET assignment: $a")
        stripQualifier(a.take(i).trim, tAlias, sAlias) -> a.drop(i + 1).trim
      }.toMap)
      val insert = (Option(insCols), Option(insVals)) match {
        case (Some(cs), Some(vs)) =>
          val cols = cs.split(",").toIndexedSeq.map(c => stripQualifier(c.trim, tAlias, sAlias))
          val vals = splitTopLevel(vs, ',').map(_.trim)
          require(cols.length == vals.length,
            s"INSERT has ${cols.length} columns but ${vals.length} values")
          Some((cols, vals))
        case _ => None
      }
      ParsedMerge(target, source, tAlias, sAlias, keys, matched, insert)
    case _ => throw new IllegalArgumentException(s"unsupported MERGE shape:\n$sql")
  }

  /** Split on `sep` ignoring separators inside parentheses or quotes. */
  private[sql] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' => quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  private def stripQualifier(c: String, tAlias: String, sAlias: String): String = {
    val p = c.split("\\.")
    if (p.length == 2 && (p(0).equalsIgnoreCase(tAlias) || p(0).equalsIgnoreCase(sAlias))) p(1)
    else if (p.length == 1) p(0)
    else c
  }

  /** Rewrite t./s. qualifiers to the Merge-internal aliases and parse
    * with Spark's expression parser. */
  private def toColumn(raw: String, pm: ParsedMerge): Column = {
    val rewritten = raw
      .replaceAll(s"(?i)\\b${pm.targetAlias}\\.", s"${Merge.T}.")
      .replaceAll(s"(?i)\\b${pm.sourceAlias}\\.", s"${Merge.S}.")
    expr(rewritten)
  }

  /** Execute against DataFrames (target/source resolved by caller).
    * Returns the post-merge target contents. Snowflake branch semantics:
    * a missing WHEN MATCHED leaves matched target rows unchanged; a
    * missing WHEN NOT MATCHED drops source-only rows. */
  def execute(target: DataFrame, source: DataFrame, pm: ParsedMerge,
      insertFallback: Map[String, Column] = Map.empty): DataFrame = {
    val matchedSet = Some(pm.matchedSet
      .map(_.map { case (c, raw) => c -> toColumn(raw, pm) })
      .getOrElse(Map.empty[String, Column])) // no branch: keep target values
    val insertSet = pm.insertCols.map { case (cols, vals) =>
      cols.zip(vals.map(toColumn(_, pm))).toMap
    }
    val src = if (pm.insertCols.isDefined) source
      else source.join(target.select(pm.keys.map(col): _*).distinct(), pm.keys, "left_semi")
    Merge.upsert(target, src, pm.keys, matchedSet, insertSet,
      pm.matchedDelete.map(toColumn(_, pm)), insertFallback)
  }

  /** Execute a MERGE INTO statement against store tables: target must be
    * a store table; source may be a store table or a registered temp
    * view/table resolvable by `spark.table`. Commits atomically.
    *
    * When the ON keys are exactly the target's declared bucket keys (the
    * reference's invariant — every MERGE joins on the table's key), the
    * statement routes through [[TableStore.merge]]: only the hash buckets
    * containing source keys are rewritten, untouched buckets carry over at
    * manifest level (O(tableSize·k/B) IO, not a full rewrite — this is what
    * keeps SQL MERGE viable at 100 TB). Falls back to full
    * compute-and-overwrite only when the ON keys differ from the declared
    * keys (a shape the reference never produces). */
  def run(spark: SparkSession, store: TableStore, sql: String): Unit = {
    val pm = parse(sql)
    val source = pm.sourceQuery match {
      case Some(q) => spark.sql(q)
      case None =>
        if (store.exists(pm.source)) store.read(pm.source) else spark.table(pm.source)
    }
    runWith(spark, store, pm, source)
  }

  /** As [[run]] but with a caller-resolved source (the stream-consume
    * path, where the source is the stream's pending-changes slice). */
  def runWith(spark: SparkSession, store: TableStore, pm: ParsedMerge,
      source: DataFrame): Unit = {
    val storeKeys = if (store.exists(pm.target)) store.keysOf(pm.target) else Nil
    if (storeKeys.nonEmpty && storeKeys.toSet == pm.keys.toSet) {
      val matchedSet = Some(pm.matchedSet
        .map(_.map { case (c, raw) => c -> toColumn(raw, pm) })
        .getOrElse(Map.empty[String, Column])) // no branch: keep target values
      val insertSet = pm.insertCols.map { case (cols, vals) =>
        cols.zip(vals.map(toColumn(_, pm))).toMap
      }
      // no WHEN NOT MATCHED branch: drop source-only rows up front (the
      // anti-rows never reach the merge; scan is pruned to the key columns)
      val src = if (pm.insertCols.isDefined) source
        else source.join(store.read(pm.target).select(pm.keys.map(col): _*).distinct(), pm.keys, "left_semi")
      store.merge(pm.target, src, matchedSet, insertSet, alignSource = false,
        whenMatchedDelete = pm.matchedDelete.map(toColumn(_, pm)))
    } else {
      // keyless target: full compute-and-overwrite; column DEFAULTs still
      // apply to the insert branch (autoinc is filled by the store write)
      val defaults = store.defaultsOf(pm.target).map { case (c, e) => c -> expr(e) }
      val merged = execute(store.read(pm.target), source, pm, defaults)
      store.overwrite(pm.target, merged)
    }
  }
}
