package graft.store

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable, versioned store for DERIVED per-corpus artifacts — the
  * materialized intermediates an operating 100 TB pipeline computes once
  * per corpus version and every consumer joins: the shingle signature
  * table, LSH dup-cluster labels, exact-kNN truth lists, BM25 postings,
  * kmeans / product-quantization codebooks.
  *
  * Round 12 held these in session-lifetime `localCheckpoint` memos; that
  * is bench-fast but cluster-dishonest twice over: `localCheckpoint`
  * blocks live on executors (losing ONE executor makes every downstream
  * consumer unrecomputable — lineage is truncated), and the artifact dies
  * with the session even though its scaladoc contract is "compute once
  * per corpus version". This object instead writes each artifact ONCE
  * through the versioned [[TableStore]] (zstd parquet, bucketed by the
  * artifact's join key, manifest-committed) and serves every subsequent
  * consumer — in this session or any later one pointed at the same root —
  * a plain bucketed-parquet scan: fault-tolerant (recomputable from
  * files), durable, and queryable from SQL like any other store table.
  *
  * Root resolution, in priority order:
  *   1. session conf `spark.graft.artifactDir`
  *   2. env `SPARK_GRAFT_ARTIFACT_DIR`
  *   3. a per-JVM temp directory (fresh each run — the safe default:
  *      correctness runs never read artifacts a code change obsoleted,
  *      while builds are still shared across every session in the JVM).
  *
  * Staleness safety: the table NAME embeds a hash of (format version,
  * full parameter key). A durable root survives code changes because any
  * builder-logic change bumps [[Artifacts.FMT]], which re-keys every
  * artifact — old tables are simply never read again (vacuum the root to
  * reclaim them). Concurrent builders in ONE JVM are serialized per
  * table by a striped lock; racing *separate* JVMs against one shared
  * root is not supported (same as any external-table writer contract).
  */
object Artifacts {

  /** Bump on ANY change to an artifact builder's output (schema or
    * values): the key re-hash makes every durable root self-invalidate. */
  private val FMT = 1

  private lazy val jvmTempRoot: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_artifacts_")
    d.toString
  }

  /** The artifact-store root this session resolves to. */
  def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.artifactDir")
      .orElse(sys.env.get("SPARK_GRAFT_ARTIFACT_DIR"))
      .getOrElse(jvmTempRoot)

  // per-(session, root) store handles; per-table build locks
  private val stores = new ConcurrentHashMap[(SparkSession, String), TableStore]()
  private val locks = new ConcurrentHashMap[String, Object]()

  private def store(s: SparkSession): TableStore = {
    val r = root(s)
    stores.computeIfAbsent((s, r), _ => new TableStore(s, r, numBuckets = 8))
  }

  /** Deterministic table name: `artifact_<name>_<12-hex key hash>`. */
  private[store] def tableName(name: String, key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"v$FMT|$key".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    s"artifact_${name}_$h"
  }

  /** Get-or-build: if the keyed artifact table exists in this session's
    * store root, read it (a bucketed parquet scan — the build is NOT
    * re-run); otherwise run `build`, snapshot-write it (no change
    * batch), and read it back. `keys` bucket the table by the artifact's
    * downstream join key so consumers co-locate. The returned frame is
    * always the STORE read — never the in-flight build plan — so every
    * consumer shares one physical source and executor loss only ever
    * re-scans files. */
  def table(s: SparkSession, name: String, key: String,
      keys: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    val st = store(s)
    val t = tableName(name, key)
    val lock = locks.computeIfAbsent(s"${root(s)}/$t", _ => new Object)
    lock.synchronized {
      if (!st.exists(t)) {
        val df = build
        st.createTable(t, df.schema, keys)
        st.overwriteSnapshot(t, df)
      }
    }
    // every artifact is immediately SQL-visible under its table name
    // (write-once per key, so the snapshot view never goes stale)
    st.registerView(t)
    st.read(t)
  }

  /** Extend an existing artifact with a delta batch — the operational
    * maintenance path when the corpus GROWS by an ingest batch: for
    * row-local builders (shingles, postings, winnowing fingerprints —
    * anything where each output row derives from one input doc),
    * artifact(corpus ∪ Δ) = artifact(corpus) ∪ build(Δ), so appending
    * the delta's rows is bit-identical to a full rebuild at a fraction
    * of the cost. NOT valid for corpus-global builders (kNN truth,
    * cluster labels, codebooks) — those re-key per corpus version
    * instead. The append commits a new store version (time travel keeps
    * the pre-batch artifact readable) and refreshes the SQL view. */
  def appendDelta(s: SparkSession, name: String, key: String,
      delta: DataFrame): Unit = {
    val st = store(s)
    val t = tableName(name, key)
    require(st.exists(t),
      s"artifact $name (key $key) does not exist — build it with table() first")
    st.append(t, delta)
    st.registerView(t)
  }

  /** (artifact table, committed version) catalog of this session's
    * artifact-store root — the SQL surface exposes it as
    * `TABLE(graft_artifacts())`; each listed name is itself registered
    * as a queryable view the moment it is built or first read. */
  def listing(s: SparkSession): org.apache.spark.sql.DataFrame = {
    val st = store(s)
    val sp = s
    import sp.implicits._
    st.listTables().filter(_.startsWith("artifact_")).sorted
      .map(t => (t, st.currentVersion(t)))
      .toDF("artifact_table", "version")
  }

  /** Driver-side codebook artifact (kmeans centroids): persisted as
    * (cluster, centroid) rows, returned as the cluster-ordered array the
    * assignment expressions broadcast. A few KB — the durability matters
    * (train once per corpus version), not the size. */
  def codebook(s: SparkSession, name: String, key: String)(
      build: => Array[Seq[Double]]): Array[Seq[Double]] = {
    val df = table(s, name, key, keys = Seq("cluster")) {
      val sp = s
      import sp.implicits._
      build.zipWithIndex.toSeq
        .map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
    }
    df.orderBy("cluster").collect()
      .map(_.getSeq[Double](1))
  }

  /** Product-quantization codebook set: m per-subspace codebooks,
    * persisted as (sub, cluster, centroid) rows. */
  def pqCodebooks(s: SparkSession, name: String, key: String)(
      build: => IndexedSeq[Array[Seq[Double]]]): IndexedSeq[Array[Seq[Double]]] = {
    val df = table(s, name, key, keys = Seq("sub")) {
      val sp = s
      import sp.implicits._
      build.zipWithIndex.toSeq.flatMap { case (book, sub) =>
        book.zipWithIndex.map { case (c, i) => (sub, i, c) }
      }.toDF("sub", "cluster", "centroid")
    }
    df.orderBy("sub", "cluster").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2)))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map(_._2.map(_._2).toArray)
  }
}
