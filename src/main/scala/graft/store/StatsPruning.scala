package graft.store

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level min/max predicate evaluation for the store's
  * micro-partition metadata ([[TableStore.scanWhere]]): given a filter
  * expression and the per-file column statistics the write path recorded
  * in each batch's `_graft_stats` sidecar, decide which data FILES can
  * possibly hold matching rows — before any parquet footer is opened.
  *
  * This is the metadata-pruning tier Snowflake serves from its metadata
  * service (min/max per column per micro-partition): parquet row-group
  * statistics prune too, but only after a footer read PER FILE — at
  * 100 TB that is millions of GETs before the first data byte. Manifest
  * stats cut the candidate set driver-side at O(files-in-range) cost.
  *
  * Strictly conservative: a conjunct prunes a file only when the file's
  * recorded [min, max] interval PROVABLY excludes every matching row.
  * Anything unprovable — unsupported comparison shapes, type mismatches,
  * absent statistics, legacy batches with no sidecar — keeps the file,
  * and [[TableStore.scanWhere]] re-applies the full predicate to the
  * surviving rows, so results never depend on pruning.
  *
  * Value domains (must match [[TableStore]]'s stats writer):
  *  - `l`   — long: integral types, DATE (epoch day), TIMESTAMP /
  *            TIMESTAMP_NTZ (epoch micros)
  *  - `d`   — double: float / double
  *  - `s`   — string, compared as UTF-8 bytes UNSIGNED (parquet's binary
  *            statistics order; Java String order diverges past the BMP)
  *  - `c<n>`— decimal(≤18, n): unscaled long at scale n
  */
private[store] object StatsPruning {

  /** One column's recorded interval in a file. `min`/`max` are None when
    * the writer had no usable statistic (all-null chunk, truncated upper
    * bound, INT96 timestamps) — each absent bound is unbounded on that
    * side. `hasNulls` None = unknown. `bloom` (declared lookup columns
    * only) holds the file's value bloom over `xxhash64(col)` — the
    * point-lookup tier interval stats can't serve on high-cardinality
    * unclustered keys; absent bloom = conservative keep. */
  final case class ColStat(kind: String, hasNulls: Option[Boolean],
      min: Option[Any], max: Option[Any],
      bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None)

  type FileStats = Map[String, ColStat]

  /** Compile `cond` against the table schema into per-file keep tests —
    * one per provable conjunct (empty = nothing prunable, keep all). */
  def compile(cond: Expression, schema: StructType): Seq[FileStats => Boolean] =
    conjuncts(normalize(cond)).flatMap(c => compileOne(c, schema))

  /** The Spark 4 Column API reaches Catalyst as
    * [[org.apache.spark.sql.catalyst.analysis.UnresolvedFunction]] nodes
    * named `and` / `>=` / `in` / … (the ColumnNode converter defers
    * operator binding to the analyzer). Rewrite the comparison shapes
    * this module understands into their typed Catalyst forms so the
    * pattern matches below see them; anything else passes through
    * unchanged (→ conservatively unprovable). */
  private[store] def normalize(e: Expression): Expression = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val as = f.arguments.map(normalize)
      f.nameParts.last.toLowerCase match {
        case "and" if as.size == 2 => And(as(0), as(1))
        case "or" if as.size == 2 => Or(as(0), as(1))
        case ">" if as.size == 2 => GreaterThan(as(0), as(1))
        case ">=" if as.size == 2 => GreaterThanOrEqual(as(0), as(1))
        case "<" if as.size == 2 => LessThan(as(0), as(1))
        case "<=" if as.size == 2 => LessThanOrEqual(as(0), as(1))
        case "=" | "==" if as.size == 2 => EqualTo(as(0), as(1))
        case "in" if as.size >= 2 => In(as.head, as.tail)
        case "isnull" if as.size == 1 => IsNull(as(0))
        case "isnotnull" if as.size == 1 => IsNotNull(as(0))
        case "startswith" if as.size == 2 => StartsWith(as(0), as(1))
        case _ => f
      }
    case other => other
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def litOf(e: Expression): Option[(Any, DataType)] =
    if (e.foldable)
      scala.util.Try(e.eval(null)).toOption
        .filter(_ != null).map(v => (v, e.dataType))
    else None

  /** Resolve a predicate's column reference to the schema's canonical
    * field name (stats maps are keyed by it) plus its stats kind. */
  private def kindOf(schema: StructType, col: String): Option[(String, String)] =
    schema.fields.find(_.name.equalsIgnoreCase(col))
      .flatMap(f => TableStore.statKind(f.dataType).map(k => (f.name, k)))

  /** Convert an evaluated literal into a stats kind's domain. None =
    * not convertible without value change → that conjunct keeps all. */
  private[store] def toDomain(v: Any, dt: DataType, kind: String): Option[Any] =
    (kind, dt) match {
      case ("l", ByteType) => Some(v.asInstanceOf[Byte].toLong)
      case ("l", ShortType) => Some(v.asInstanceOf[Short].toLong)
      case ("l", IntegerType) => Some(v.asInstanceOf[Int].toLong)
      case ("l", LongType) => Some(v.asInstanceOf[Long])
      case ("l", DateType) => Some(v.asInstanceOf[Int].toLong)
      case ("l", TimestampType) => Some(v.asInstanceOf[Long])
      case ("l", TimestampNTZType) => Some(v.asInstanceOf[Long])
      case ("d", FloatType) => doubleDomain(v.asInstanceOf[Float].toDouble)
      case ("d", DoubleType) => doubleDomain(v.asInstanceOf[Double])
      case ("s", StringType) => Some(v.asInstanceOf[UTF8String].toString)
      case (k, dec: DecimalType) if k.startsWith("c") =>
        val scale = k.drop(1).toInt
        val bd = v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal
        // exact rescale only — rounding would move the comparison point
        scala.util.Try(bd.setScale(scale).unscaledValue().longValueExact())
          .toOption
      case _ => None
    }

  /** Floating literals that `java.lang.Double.compare` orders differently
    * from Spark row equality are refused or normalized — both silently
    * lose rows otherwise: a NaN literal would prune files whose parquet
    * writer SUPPRESSED min/max per NaN-bearing row group (the bounds
    * describe only the NaN-free groups), and compare() puts -0.0 < 0.0
    * while Spark's `===` matches them, so `col === -0.0` would prune a
    * file recording min = max = 0.0 that is full of matching rows. */
  private def doubleDomain(d: Double): Option[Any] =
    if (d.isNaN) None else if (d == 0.0d) Some(0.0d) else Some(d)

  /** Domain comparison shared with the stats writer: unsigned UTF-8
    * byte order for strings (parquet's binary statistics order — Java
    * String order diverges past the BMP), numeric otherwise. */
  private[store] def ordCompare(kind: String, a: Any, b: Any): Int =
    cmp(kind, a, b)

  private def cmp(kind: String, a: Any, b: Any): Int = kind match {
    case "d" =>
      // ±0.0 normalized on BOTH sides: footer bounds can carry -0.0
      // (parquet writers keep min = -0.0 by spec recommendation) while
      // Spark equality treats the zeros as one value
      def z(x: Double) = if (x == 0.0d) 0.0d else x
      java.lang.Double.compare(z(a.asInstanceOf[Double]),
        z(b.asInstanceOf[Double]))
    case "s" =>
      val x = a.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      val y = b.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    case _ => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  // keep tests: true = the file may contain a matching row
  private def mayGe(st: ColStat, v: Any): Boolean = // some row >= v ?
    st.max.forall(m => cmp(st.kind, m, v) >= 0)
  private def mayGt(st: ColStat, v: Any): Boolean =
    st.max.forall(m => cmp(st.kind, m, v) > 0)
  private def mayLe(st: ColStat, v: Any): Boolean = // some row <= v ?
    st.min.forall(m => cmp(st.kind, m, v) <= 0)
  private def mayLt(st: ColStat, v: Any): Boolean =
    st.min.forall(m => cmp(st.kind, m, v) < 0)
  private def mayEq(st: ColStat, v: Any): Boolean =
    mayGe(st, v) && mayLe(st, v)

  /** xxhash64 (seed 42 — the identical codegen'd expression the sidecar
    * writer aggregates file values with, [[TableStore]] bloomLines) of an
    * equality literal, cast LOSSLESSLY to the column's declared type so
    * probe and build hash the same physical value. None = lossy or
    * zone-dependent cast → no bloom probe (conservative keep). */
  private def probeHash(schema: StructType, colName: String,
      v: Any, dt: DataType): Option[Long] =
    schema.fields.find(_.name.equalsIgnoreCase(colName)).flatMap { f =>
      val casted =
        if (f.dataType == dt) Some(v)
        else if (Cast.canUpCast(dt, f.dataType))
          scala.util.Try(Cast(Literal(v, dt), f.dataType, None).eval(null))
            .toOption.filter(_ != null)
        else None
      casted.flatMap(cv => scala.util.Try(
        new XxHash64(Seq(Literal(cv, f.dataType)))
          .eval(null).asInstanceOf[Long]).toOption)
    }

  private def bloomKeeps(st: ColStat, hash: Option[Long]): Boolean =
    (hash, st.bloom) match {
      case (Some(h), Some(bf)) => bf.mightContainLong(h)
      case _ => true
    }

  /** Equality keep test: interval may-contain AND (declared lookup
    * columns) bloom may-contain — the bloom is the tier that prunes when
    * every file's interval spans the probe (a uniform unclustered id). */
  private def eqTest(schema: StructType, col: String, dt0: DataType,
      v0: Any): Option[FileStats => Boolean] =
    kindOf(schema, col).map { case (name, kind) =>
      val dom = toDomain(v0, dt0, kind)
      val hash = probeHash(schema, col, v0, dt0)
      fsStats => fsStats.get(name) match {
        case Some(st) =>
          val intervalOk =
            if (st.kind == kind && dom.isDefined) mayEq(st, dom.get) else true
          intervalOk && bloomKeeps(st, hash)
        case _ => true
      }
    }

  /** Lift a (column, op, literal) conjunct into a file test. A file
    * whose stats lack the column entirely (legacy batch, unsupported
    * type) is kept by construction — the test only fires when the
    * column's interval is recorded with the expected kind. */
  private def compileOne(c: Expression,
      schema: StructType): Option[FileStats => Boolean] = {

    def bound(col: String, dt0: DataType, v0: Any,
        test: (ColStat, Any) => Boolean): Option[FileStats => Boolean] =
      kindOf(schema, col).map { case (name, kind) =>
        val dom = toDomain(v0, dt0, kind)
        fsStats => fsStats.get(name) match {
          case Some(st) if st.kind == kind && dom.isDefined =>
            test(st, dom.get)
          case _ => true
        }
      }

    c match {
      case GreaterThan(a, l) => (attrName(a), litOf(l)) match {
        case (Some(col), Some((v, dt))) => bound(col, dt, v, mayGt)
        case _ => flip(c, schema)
      }
      case GreaterThanOrEqual(a, l) => (attrName(a), litOf(l)) match {
        case (Some(col), Some((v, dt))) => bound(col, dt, v, mayGe)
        case _ => flip(c, schema)
      }
      case LessThan(a, l) => (attrName(a), litOf(l)) match {
        case (Some(col), Some((v, dt))) => bound(col, dt, v, mayLt)
        case _ => flip(c, schema)
      }
      case LessThanOrEqual(a, l) => (attrName(a), litOf(l)) match {
        case (Some(col), Some((v, dt))) => bound(col, dt, v, mayLe)
        case _ => flip(c, schema)
      }
      case EqualTo(a, l) => (attrName(a), litOf(l)) match {
        case (Some(col), Some((v, dt))) => eqTest(schema, col, dt, v)
        case _ => flip(c, schema)
      }
      case In(a, list) if list.nonEmpty && list.forall(_.foldable) =>
        attrName(a).flatMap { col =>
          val vs = list.flatMap(litOf)
          if (vs.size != list.size) None // a null element → keep all
          else kindOf(schema, col).map { case (name, kind) =>
            // per-literal: interval AND bloom must both admit it; an
            // unprovable literal (lossy domain/cast) admits the file
            val entries = vs.map { case (v, dt) =>
              (toDomain(v, dt, kind), probeHash(schema, col, v, dt))
            }
            fsStats => fsStats.get(name) match {
              case Some(st) =>
                entries.exists { case (dom, hash) =>
                  val intervalOk =
                    if (st.kind == kind && dom.isDefined) mayEq(st, dom.get)
                    else true
                  intervalOk && bloomKeeps(st, hash)
                }
              case _ => true
            }
          }
        }
      case IsNull(a) => attrName(a).map { col =>
        fsStats => fsStats.get(col) match {
          case Some(st) => st.hasNulls.getOrElse(true)
          case None => true
        }
      }
      case StartsWith(a, l) => (attrName(a), litOf(l)) match {
        case (Some(col), Some((v, StringType))) =>
          val prefix = v.asInstanceOf[UTF8String].toString
          Some { fsStats =>
            fsStats.get(col) match {
              case Some(st) if st.kind == "s" =>
                // overlap of [min,max] with [prefix, prefix·∞):
                // max >= prefix, and min's first |prefix| bytes <= prefix
                mayGe(st, prefix) && st.min.forall { m =>
                  val mb = m.asInstanceOf[String]
                    .getBytes(StandardCharsets.UTF_8)
                  val pb = prefix.getBytes(StandardCharsets.UTF_8)
                  val cut = new String(mb.take(pb.length),
                    StandardCharsets.UTF_8)
                  // byte-prefix cut can split a UTF-8 char; compare bytes
                  cmpBytes(mb.take(pb.length), pb) <= 0 || cut.isEmpty
                }
              case _ => true
            }
          }
        case _ => None
      }
      case _ => None
    }
  }

  private def cmpBytes(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** literal-on-left mirror: `lit OP col` ⟺ `col flipped-OP lit`. */
  private def flip(c: Expression,
      schema: StructType): Option[FileStats => Boolean] = {
    def bound(col: String, dt0: DataType, v0: Any,
        test: (ColStat, Any) => Boolean): Option[FileStats => Boolean] =
      kindOf(schema, col).map { case (name, kind) =>
        val dom = toDomain(v0, dt0, kind)
        fsStats => fsStats.get(name) match {
          case Some(st) if st.kind == kind && dom.isDefined =>
            test(st, dom.get)
          case _ => true
        }
      }
    c match {
      case GreaterThan(l, a) => (litOf(l), attrName(a)) match {
        case (Some((v, dt)), Some(col)) => bound(col, dt, v, mayLt)
        case _ => None
      }
      case GreaterThanOrEqual(l, a) => (litOf(l), attrName(a)) match {
        case (Some((v, dt)), Some(col)) => bound(col, dt, v, mayLe)
        case _ => None
      }
      case LessThan(l, a) => (litOf(l), attrName(a)) match {
        case (Some((v, dt)), Some(col)) => bound(col, dt, v, mayGt)
        case _ => None
      }
      case LessThanOrEqual(l, a) => (litOf(l), attrName(a)) match {
        case (Some((v, dt)), Some(col)) => bound(col, dt, v, mayGe)
        case _ => None
      }
      case EqualTo(l, a) => (litOf(l), attrName(a)) match {
        case (Some((v, dt)), Some(col)) => eqTest(schema, col, dt, v)
        case _ => None
      }
      case _ => None
    }
  }
}
