package graft.sql

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.TableStore

/** A reference-shaped SQL script (stage → raw → dim statements, our own
  * text in the reference's dialect) running end-to-end through GraftSql. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("CTAS and views: CREATE TABLE AS SELECT, CREATE VIEW over live tables") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_ctas").toString, 2)
    g.sqlScript(
      """CREATE TABLE base (id BIGINT, v STRING) KEYS (id);
        |INSERT INTO base SELECT 1, 'a' UNION ALL SELECT 2, 'b' UNION ALL SELECT 3, 'c';
        |CREATE TABLE evens KEYS (id) AS SELECT id, v FROM base WHERE id % 2 = 0;
        |CREATE OR REPLACE VIEW big_ids AS SELECT id FROM base WHERE id >= 2""".stripMargin)
    assert(g.store.keysOf("evens") == Seq("id"))
    assert(g.table("evens").count() == 1)
    assert(g.sql("SELECT count(1) AS n FROM big_ids").get.head().getLong(0) == 2)
    // views track table mutations (re-evaluated per statement)
    g.sql("INSERT INTO base SELECT 9, 'z'")
    assert(g.sql("SELECT count(1) AS n FROM big_ids").get.head().getLong(0) == 3)
    // views can stack on views
    g.sql("CREATE VIEW big_ids2 AS SELECT id FROM big_ids WHERE id >= 9")
    assert(g.sql("SELECT id FROM big_ids2").get.head().getLong(0) == 9)
    assert(g.sql("SHOW VIEWS").get.collect().map(_.getString(0)).toSet ==
      Set("big_ids", "big_ids2"))
    g.sql("DROP VIEW big_ids2")
    assert(g.sql("SHOW VIEWS").get.count() == 1)
  }

  test("ALTER TABLE ... ADD SEARCH OPTIMIZATION ON EQUALITY declares lookup blooms") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_searchopt").toString, 2)
    g.sql("CREATE TABLE so1 (id BIGINT, v STRING) KEYS (id)")
    assert(g.store.lookupOf("so1") == Nil)
    g.sql("ALTER TABLE so1 ADD SEARCH OPTIMIZATION ON EQUALITY(id, v)")
    assert(g.store.lookupOf("so1") == Seq("id", "v"))
    // post-declaration writes carry blooms; a point probe still returns
    // exactly its rows through the transparent prune
    g.sql("INSERT INTO so1 SELECT 1, 'a' UNION ALL SELECT 2, 'b' UNION ALL SELECT 3, 'c'")
    val hit = g.sql("SELECT v FROM so1 WHERE id = 2").get.collect()
    assert(hit.map(_.getString(0)).toSeq == Seq("b"))
    val e = intercept[Exception](
      g.sql("ALTER TABLE so1 ADD SEARCH OPTIMIZATION ON EQUALITY(nosuch)"))
    assert(e.getMessage.contains("unknown lookup column"))
  }

  test("ALTER TABLE ... SET AUTO_COMPACT persists a table-level write-time compaction policy") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_autocompact").toString, 2)
    g.sql("CREATE TABLE ac1 (id BIGINT, v STRING) KEYS (id)")
    assert(g.store.autoCompactOf("ac1").isEmpty)
    g.sql("ALTER TABLE ac1 SET AUTO_COMPACT = 2")
    assert(g.store.autoCompactOf("ac1") == Some(2))
    // the policy travels with the table: every writer compacts at 2
    // accreted batch dirs without setting any session conf
    g.sql("INSERT INTO ac1 SELECT 1, 'a'")
    g.sql("INSERT INTO ac1 SELECT 2, 'b'")
    g.sql("INSERT INTO ac1 SELECT 3, 'c'")
    assert(g.store.batchCount("ac1") == 1,
      s"policy=2 must hold the manifest at one batch dir, got ${g.store.batchCount("ac1")}")
    assert(g.sql("SELECT count(1) AS n FROM ac1").get.head().getLong(0) == 3)
    // explicit OFF overrides a conf-set session
    g.sql("ALTER TABLE ac1 SET AUTO_COMPACT = OFF")
    assert(g.store.autoCompactOf("ac1") == Some(0))
    spark.conf.set("spark.graft.store.autoCompactBatches", "2")
    try {
      g.sql("INSERT INTO ac1 SELECT 4, 'd'")
      g.sql("INSERT INTO ac1 SELECT 5, 'e'")
      assert(g.store.batchCount("ac1") >= 2,
        "AUTO_COMPACT = OFF must override the session conf")
    } finally spark.conf.unset("spark.graft.store.autoCompactBatches")
    // UNSET returns control to the session conf
    g.sql("ALTER TABLE ac1 UNSET AUTO_COMPACT")
    assert(g.store.autoCompactOf("ac1").isEmpty)
    val e = intercept[Exception](g.sql("ALTER TABLE ac1 SET AUTO_COMPACT = 1"))
    assert(e.getMessage.contains("AUTO_COMPACT takes OFF"))
  }

  test("CREATE TABLE ... CLUSTER BY declares clustering keys (either clause order)") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_cluster").toString, 2)
    g.sql("CREATE TABLE ct1 (id BIGINT, v BIGINT, s STRING) CLUSTER BY (v) KEYS (id)")
    assert(g.store.clusterByOf("ct1") == Seq("v"))
    assert(g.store.keysOf("ct1") == Seq("id"))
    g.sql("CREATE TABLE ct2 (id BIGINT, v BIGINT) KEYS (id) CLUSTER BY (v, id)")
    assert(g.store.clusterByOf("ct2") == Seq("v", "id"))
    g.sql("CREATE TABLE ct3 (id BIGINT, v BIGINT)")
    assert(g.store.clusterByOf("ct3") == Nil)
    // clustered writes keep data readable and ordered within each file
    g.sql("INSERT INTO ct1 SELECT 3, 30, 'c' UNION ALL SELECT 1, 10, 'a' UNION ALL SELECT 2, 20, 'b'")
    assert(g.sql("SELECT count(1) AS n FROM ct1").get.head().getLong(0) == 3)
    // ALTER ... CLUSTER BY reclusters in place (contents unchanged, CDC
    // sees nothing); DROP CLUSTERING KEY stops future sorting
    g.sql("INSERT INTO ct3 SELECT 2, 20 UNION ALL SELECT 1, 10")
    val vBefore = g.store.currentVersion("ct3")
    g.sql("ALTER TABLE ct3 CLUSTER BY (v)")
    assert(g.store.clusterByOf("ct3") == Seq("v"))
    assert(g.sql("SELECT count(1) AS n FROM ct3").get.head().getLong(0) == 2)
    // the recluster commits exactly one new version with NO change batch
    // (layout moved, contents did not — CDC consumers see nothing)
    val vAfter = g.store.currentVersion("ct3")
    assert(vAfter == vBefore + 1)
    assert(g.store.readChanges("ct3", vBefore, vAfter).isEmpty,
      "reclustering must record no phantom changes")
    // ZORDER variant flips the layout marker; DROP clears both
    g.sql("ALTER TABLE ct3 CLUSTER BY ZORDER (v, id)")
    assert(g.store.clusterByOf("ct3") == Seq("v", "id") && g.store.zorderOf("ct3"))
    assert(g.sql("SELECT count(1) AS n FROM ct3").get.head().getLong(0) == 2)
    g.sql("ALTER TABLE ct3 CLUSTER BY (v)") // back to linear
    assert(!g.store.zorderOf("ct3"))
    g.sql("ALTER TABLE ct3 DROP CLUSTERING KEY")
    assert(g.store.clusterByOf("ct3") == Nil)
    val e = intercept[Exception](g.sql("ALTER TABLE ct3 CLUSTER BY (nosuch)"))
    assert(e.getMessage.contains("unknown clustering column"))
    // the audit is SQL-reachable and footer-derived
    val audit = g.sql("SELECT * FROM TABLE(graft_clustering_info(ct1))").get.collect()
    assert(audit.nonEmpty && audit.forall(r => r.getString(4) != null),
      s"expected per-row-group bounds, got ${audit.mkString(";")}")
  }

  test("CTAS body may be parenthesized; unsupported CREATE TABLE forms error") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_ctasp").toString, 2)
    g.sqlScript(
      """CREATE TABLE base (id BIGINT, v STRING) KEYS (id);
        |INSERT INTO base SELECT 1, 'a' UNION ALL SELECT 2, 'b';
        |CREATE TABLE copy1 AS (SELECT id, v FROM base WHERE id = 1)""".stripMargin)
    assert(g.store.exists("copy1"), "parenthesized CTAS must create a STORE table")
    assert(g.table("copy1").count() == 1)
    // a CREATE TABLE shape we don't handle must error, not silently make a
    // Spark catalog table via the passthrough
    val e = intercept[RuntimeException](g.sql("CREATE TABLE nope LIKE base"))
    assert(e.getMessage.contains("unsupported CREATE TABLE"))
  }

  test("name normalization skips string literals; flat-name collisions error") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_norm").toString, 2)
    g.sqlScript(
      """CREATE TABLE stg.stg_customer (id BIGINT, note STRING) KEYS (id);
        |INSERT INTO stg.stg_customer SELECT 1, 'from stg.stg_customer load'""".stripMargin)
    // the literal must survive verbatim — it is data, not a table name
    assert(g.sql("SELECT note FROM stg_customer").get.head().getString(0) ==
      "from stg.stg_customer load")
    // unqualified create, then a qualified create over the same flat name:
    // rejected rather than silently collapsed (ADVICE: recordName ambiguity)
    g.sql("CREATE TABLE customer (id BIGINT)")
    val e = intercept[RuntimeException](
      g.sql("CREATE OR REPLACE TABLE raw.customer (id BIGINT, extra STRING)"))
    assert(e.getMessage.contains("ambiguous flat name"))
    assert(g.store.schemaOf("customer").fieldNames.toSeq == Seq("id"),
      "the unrelated flat table must be untouched")
    // and a table created OUTSIDE the session's name map is protected too
    g.store.createTable("orders_ext", org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"))
    val e2 = intercept[RuntimeException](g.sql("CREATE TABLE raw.orders_ext (x STRING)"))
    assert(e2.getMessage.contains("ambiguous flat name"))
  }

  test("CLONE, UNDROP, and ALTER TABLE column DDL through the dialect") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_clone").toString, 2)
    g.sqlScript(
      """CREATE TABLE t (id BIGINT, v STRING) KEYS (id);
        |INSERT INTO t SELECT 1, 'a' UNION ALL SELECT 2, 'b';
        |INSERT INTO t SELECT 3, 'c';
        |CREATE TABLE t_snap CLONE t AT (VERSION => 1);
        |CREATE TABLE t_now CLONE t""".stripMargin)
    assert(g.table("t_snap").count() == 2, "clone at version 1 sees the first insert only")
    assert(g.table("t_now").count() == 3)
    g.sqlScript(
      """ALTER TABLE t ADD COLUMN score NUMBER(5,0) DEFAULT 9;
        |INSERT INTO t (id, v) SELECT 4, 'd';
        |ALTER TABLE t RENAME COLUMN v TO label""".stripMargin)
    assert(g.table("t").columns.toSeq == Seq("id", "label", "score"))
    assert(g.sql("SELECT score FROM t WHERE id = 4").get.head().getDecimal(0).intValue == 9)
    assert(g.sql("SELECT score FROM t WHERE id = 1").get.head().isNullAt(0))
    g.sql("ALTER TABLE t DROP COLUMN score")
    assert(g.table("t").columns.toSeq == Seq("id", "label"))
    // drop → undrop round trip
    g.sqlScript("DROP TABLE t_snap; UNDROP TABLE t_snap")
    assert(g.table("t_snap").count() == 2)
  }

  test("CREATE OR REPLACE TABLE AS SELECT may read the table it replaces") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_ctas2").toString, 2)
    g.sqlScript(
      """CREATE TABLE t (id BIGINT, v STRING) KEYS (id);
        |INSERT INTO t SELECT 1, 'a' UNION ALL SELECT 2, 'b' UNION ALL SELECT 3, 'c';
        |CREATE OR REPLACE TABLE t KEYS (id) AS SELECT id, v FROM t WHERE id <> 2""".stripMargin)
    val out = g.table("t").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L), "self-referencing replace must not lose the source data")
  }

  test("time travel: AT (VERSION => n) and AT (OFFSET => -k)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_tt").toString, 2)
    GraftSql.executeScript(spark, store,
      """CREATE TABLE t (id BIGINT, v STRING) KEYS (id);
        |INSERT INTO t SELECT 1, 'a';
        |INSERT INTO t SELECT 2, 'b'""".stripMargin)
    val v1 = GraftSql.execute(spark, store, "SELECT count(1) AS n FROM t AT (VERSION => 1)")
    assert(v1.get.head().getLong(0) == 1)
    val back1 = GraftSql.execute(spark, store, "SELECT count(1) AS n FROM t AT (OFFSET => -1)")
    assert(back1.get.head().getLong(0) == 1)
    val now = GraftSql.execute(spark, store, "SELECT count(1) AS n FROM t")
    assert(now.get.head().getLong(0) == 2)
    // time travel composes with current-version reads in one statement
    val joined = GraftSql.execute(spark, store,
      """SELECT count(1) AS n FROM t
        |JOIN t AT (VERSION => 1) o ON t.id = o.id""".stripMargin)
    assert(joined.get.head().getLong(0) == 1)
  }

  test("DELETE FROM removes matching rows through the dialect") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_del").toString, 2)
    GraftSql.executeScript(spark, store,
      """CREATE TABLE t (id BIGINT, v STRING) KEYS (id);
        |INSERT INTO t SELECT 1, 'a' UNION ALL SELECT 2, 'b' UNION ALL SELECT 3, 'c';
        |DELETE FROM t WHERE id = 2""".stripMargin)
    val rows = GraftSql.execute(spark, store, "SELECT id FROM t ORDER BY id")
    assert(rows.get.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("reference-shaped script: create, insert, merge, update, truncate, select") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_gsql").toString, 2)

    GraftSql.executeScript(spark, store,
      """
      |CREATE TABLE stg_item (item_id STRING, item_desc STRING, price STRING)
      |  KEYS (item_id);
      |CREATE TABLE raw_item (item_id STRING, item_desc STRING, price STRING)
      |  KEYS (item_id);
      |CREATE TABLE dim_item (item_id STRING, item_desc STRING, price DECIMAL(7,2))
      |  KEYS (item_id)
      """.stripMargin)
    assert(store.listTables().toSet == Set("stg_item", "raw_item", "dim_item"))

    GraftSql.execute(spark, store,
      "INSERT INTO stg_item SELECT 'A1', 'widget', '10.00' UNION ALL SELECT 'A2', 'gasket', '5.50'")
    assert(store.read("stg_item").count() == 2)

    GraftSql.execute(spark, store,
      """MERGE INTO raw_item AS t USING stg_item AS s
        |ON t.item_id = s.item_id
        |WHEN MATCHED THEN UPDATE SET t.item_desc = s.item_desc, t.price = s.price
        |WHEN NOT MATCHED THEN INSERT (item_id, item_desc, price)
        |VALUES (s.item_id, s.item_desc, s.price)""".stripMargin)
    assert(store.read("raw_item").count() == 2)

    // typed dim load with implicit-coercion casts (F3) in the SELECT
    GraftSql.execute(spark, store,
      "INSERT OVERWRITE dim_item SELECT item_id, item_desc, CAST(price AS DECIMAL(7,2)) FROM raw_item")

    GraftSql.execute(spark, store,
      "UPDATE dim_item SET price = CAST(99.99 AS DECIMAL(7,2)) WHERE item_id = 'A1'")
    val a1 = GraftSql.execute(spark, store,
      "SELECT price FROM dim_item WHERE item_id = 'A1'").get.head()
    assert(a1.getDecimal(0) == new java.math.BigDecimal("99.99"))

    GraftSql.execute(spark, store, "TRUNCATE TABLE stg_item")
    assert(store.read("stg_item").count() == 0)

    val out = GraftSql.execute(spark, store,
      "SELECT item_id, item_desc FROM dim_item ORDER BY item_id").get.collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A1", "A2"))
  }

  test("statement splitting respects quoted semicolons") {
    val stmts = GraftSql.splitStatements("SELECT 'a;b' AS x; SELECT 2")
    assert(stmts == Seq("SELECT 'a;b' AS x", "SELECT 2"))
  }

  test("QUALIFY rewrites in SELECT, CTAS, and INSERT bodies") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_qualify").toString, 2)
    g.sqlScript(
      """CREATE TABLE q_src (k STRING, seq BIGINT, v STRING) KEYS (k);
        |INSERT INTO q_src SELECT 'a', 1, 'old' UNION ALL SELECT 'a', 2, 'new'
        |                  UNION ALL SELECT 'b', 1, 'only'""".stripMargin)
    // passthrough SELECT: latest row per key (Snowflake QUALIFY)
    val sel = g.sql(
      """SELECT k, v FROM q_src
        |QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1
        |ORDER BY k""".stripMargin).get.collect()
    assert(sel.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "new"), ("b", "only")))
    // CTAS body with QUALIFY
    g.sql(
      """CREATE TABLE q_latest KEYS (k) AS SELECT k, seq, v FROM q_src
        |QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1""".stripMargin)
    assert(g.table("q_latest").count() == 2)
    // INSERT body with QUALIFY
    g.sql("CREATE TABLE q_sink (k STRING, seq BIGINT, v STRING) KEYS (k)")
    g.sql(
      """INSERT INTO q_sink SELECT k, seq, v FROM q_src
        |QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq) = 1""".stripMargin)
    assert(g.table("q_sink").count() == 2)
    assert(g.table("q_sink").where("k = 'a'").head().getString(2) == "old")
  }

  test("self-clone and clone-from-missing leave the destination intact") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_selfclone").toString, 2)
    g.sqlScript(
      """CREATE TABLE orig (id BIGINT, v STRING) KEYS (id);
        |INSERT INTO orig SELECT 1, 'a'""".stripMargin)
    val e1 = intercept[RuntimeException](g.sql("CREATE OR REPLACE TABLE orig CLONE orig"))
    assert(e1.getMessage.contains("onto itself"))
    assert(g.store.exists("orig") && g.table("orig").count() == 1,
      "failed self-clone must not drop the destination")
    val e2 = intercept[Exception](g.sql("CREATE OR REPLACE TABLE orig CLONE no_such"))
    assert(g.store.exists("orig") && g.table("orig").count() == 1,
      s"clone from missing source must not drop the destination (${e2.getMessage})")
  }

  test("unqualified CREATE collides with earlier qualified CREATE; DROP clears the guard") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_collide2").toString, 2)
    g.sql("CREATE TABLE stg.customer (id BIGINT) KEYS (id)")
    // the reverse of the existing guard: an unqualified CREATE of the same
    // flat segment must error, not silently replace stg.customer
    val e = intercept[RuntimeException](g.sql("CREATE OR REPLACE TABLE customer (x STRING)"))
    assert(e.getMessage.contains("ambiguous flat name"))
    assert(g.store.schemaOf("customer").fieldNames.toSeq == Seq("id"))
    // the suggested recovery works: DROP clears the name maps
    g.sql("DROP TABLE stg.customer")
    g.sql("CREATE TABLE customer (x STRING)")
    assert(g.store.schemaOf("customer").fieldNames.toSeq == Seq("x"))
    // and dropping the unqualified one frees the name for qualified reuse
    g.sql("DROP TABLE customer")
    g.sql("CREATE TABLE raw.customer (y BIGINT) KEYS (y)")
    assert(g.store.schemaOf("customer").fieldNames.toSeq == Seq("y"))
  }

  test("reading a qualified name does not block a later unqualified CREATE") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_readguard").toString, 2)
    g.sql("CREATE TABLE stg.orders (id BIGINT) KEYS (id)")
    g.sql("DROP TABLE stg.orders")
    g.sql("CREATE TABLE stg.lineups (id BIGINT) KEYS (id)")
    // a mere READ under a qualified alias records the name but is NOT a
    // creation — it must not trigger the collision guard
    g.table("stg.lineups")
    g.sql("SELECT count(*) FROM stg.lineups").get.collect()
    g.sql("DROP TABLE stg.lineups")
    g.sql("CREATE TABLE lineups (x STRING)") // was: "ambiguous flat name" error
    assert(g.store.schemaOf("lineups").fieldNames.toSeq == Seq("x"))
  }

  test("QUALIFY combines with AT time travel (probe sees post-timeTravel SQL)") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_qtt").toString, 2)
    g.sqlScript(
      """CREATE TABLE qtt (k STRING, v BIGINT) KEYS (k);
        |INSERT INTO qtt SELECT 'a', 1 UNION ALL SELECT 'a', 2 UNION ALL SELECT 'b', 9""".stripMargin)
    g.sql("INSERT INTO qtt SELECT 'b', 100") // version 2
    // alias-in-OVER QUALIFY over a time-traveled read: before the probe
    // reordering this raised LATERAL_COLUMN_ALIAS_IN_WINDOW (the probe
    // choked on the raw AT(...) text and kept the injected form)
    val rows = g.sql(
      """SELECT k, count(*) AS c FROM qtt AT (VERSION => 1) GROUP BY k
        |QUALIFY row_number() OVER (ORDER BY c DESC, k) = 1""".stripMargin).get.collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L)))
  }

  test("QUALIFY predicate referencing a select-list alias in OVER falls back to the wrapper") {
    val g = graft.GraftSession(spark,
      Files.createTempDirectory("graft_qualias").toString, 2)
    g.sqlScript(
      """CREATE TABLE qa_src (k STRING, v BIGINT) KEYS (k);
        |INSERT INTO qa_src SELECT 'a', 1 UNION ALL SELECT 'a', 2
        |                   UNION ALL SELECT 'b', 5 UNION ALL SELECT 'c', 9""".stripMargin)
    // `c` is a select-list alias referenced INSIDE the OVER clause — Spark
    // rejects lateral aliases in window specs, so the injected form fails
    // analysis and the rewrite must fall back to the wrapper form
    val top = g.sql(
      """SELECT k, count(*) AS c FROM qa_src GROUP BY k
        |QUALIFY row_number() OVER (ORDER BY c DESC, k) = 1""".stripMargin).get.collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L)))
    // base-column predicates (dropped by the projection) still use the
    // injected form and keep working alongside the fallback
    val sel = g.sql(
      """SELECT k FROM qa_src
        |QUALIFY row_number() OVER (PARTITION BY k ORDER BY v DESC) = 1
        |ORDER BY k""".stripMargin).get.collect()
    assert(sel.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }
}
