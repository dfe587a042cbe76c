package graft.sql

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.TableStore

/** Reference-shaped MERGE INTO statements running verbatim (SURVEY.md §7
  * optional SQL surface; shapes mirror customer-...sql:77-114 and the
  * composite-key order-...sql:111-168 — our own statements, same dialect). */
class MergeSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("single-key merge with UPDATE SET + INSERT VALUES and casts") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_sql").toString, 2)
    store.createTable("raw_item", Seq((1L, "old", 10.0)).toDF("item_id", "item_desc", "price").schema,
      keys = Seq("item_id"))
    store.append("raw_item", Seq((1L, "old", 10.0), (2L, "keep", 20.0)).toDF("item_id", "item_desc", "price"))
    Seq((1L, "NEW", "15.5"), (3L, "ins", "30.0")).toDF("item_id", "item_desc", "price")
      .createOrReplaceTempView("stg_item_stream")

    MergeSql.run(spark, store,
      """MERGE INTO raw_item AS t USING stg_item_stream AS s
        |ON t.item_id = s.item_id
        |WHEN MATCHED THEN UPDATE SET t.item_desc = s.item_desc,
        |  t.price = cast(s.price as double) + 1.0
        |WHEN NOT MATCHED THEN INSERT (item_id, item_desc, price)
        |VALUES (s.item_id, lower(s.item_desc), cast(s.price as double))""".stripMargin)

    val out = store.read("raw_item").orderBy("item_id")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "NEW", 16.5), (2L, "keep", 20.0), (3L, "ins", 30.0)))
  }

  test("composite 4-column key merge (order-pipeline shape)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_sql2").toString, 2)
    val t = Seq(("2024-01-01", "08:00", "I1", "desc1", 5L))
      .toDF("order_date", "order_time", "item_id", "item_desc", "qty")
    store.createTable("raw_order", t.schema,
      keys = Seq("order_date", "order_time", "item_id", "item_desc"))
    store.append("raw_order", t)
    Seq(("2024-01-01", "08:00", "I1", "desc1", 9L), ("2024-01-02", "09:00", "I2", "desc2", 4L))
      .toDF("order_date", "order_time", "item_id", "item_desc", "qty")
      .createOrReplaceTempView("stg_order_stream")

    MergeSql.run(spark, store,
      """MERGE INTO raw_order t USING stg_order_stream s
        |ON t.order_date = s.order_date AND t.order_time = s.order_time
        |  AND t.item_id = s.item_id AND t.item_desc = s.item_desc
        |WHEN MATCHED THEN UPDATE SET t.qty = s.qty
        |WHEN NOT MATCHED THEN INSERT (order_date, order_time, item_id, item_desc, qty)
        |VALUES (s.order_date, s.order_time, s.item_id, s.item_desc, s.qty)""".stripMargin)

    val out = store.read("raw_order").orderBy("order_date")
      .as[(String, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", "08:00", "I1", "desc1", 9L),
      ("2024-01-02", "09:00", "I2", "desc2", 4L)))
  }

  test("update-only merge leaves unmatched source rows out") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val s = Seq((2L, "B"), (9L, "X")).toDF("id", "v")
    val pm = MergeSql.parse(
      "MERGE INTO tgt t USING src s ON t.id = s.id WHEN MATCHED THEN UPDATE SET t.v = s.v")
    val out = MergeSql.execute(t, s, pm).orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"))) // no INSERT branch -> 9 not added
  }

  test("SQL merge is bucket-pruned: untouched-bucket files carry over by path") {
    val root = Files.createTempDirectory("graft_sql3").toString
    val store = new TableStore(spark, root, 8)
    store.createTable("big", Seq((1L, "x")).toDF("id", "v").schema, keys = Seq("id"))
    store.append("big", (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    def manifest(v: Long): Map[Int, String] =
      new String(Files.readAllBytes(java.nio.file.Paths.get(root, "big", "_versions", f"v$v%08d")), "UTF-8")
        .split("\n").filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l => val Array(b, p) = l.split("\t", 2); b.toInt -> p }.toMap
    val before = manifest(1)
    assert(before.size == 8, "seed batch should populate every bucket")

    Seq((2L, "V2")).toDF("id", "v").createOrReplaceTempView("one_row_src")
    MergeSql.run(spark, store,
      """MERGE INTO big t USING one_row_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)

    val after = manifest(2)
    val rewritten = after.filter { case (b, p) => before(b) != p }
    assert(rewritten.size == 1, s"a 1-key merge must rewrite exactly 1 bucket, got ${rewritten.keys}")
    val carried = after.filter { case (b, p) => before(b) == p }
    assert(carried.size == 7, "untouched buckets must carry over as the identical files")
    val out = store.read("big").orderBy("id").as[(Long, String)].collect().toSeq
    assert(out.length == 100 && out.contains((2L, "V2")) && out.contains((1L, "v1")))
  }

  test("SQL merge value exprs may reference source columns absent from the target") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_sql4").toString, 2)
    store.createTable("t", Seq((1L, "a")).toDF("id", "v").schema, keys = Seq("id"))
    store.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // `suffix` exists only in the source
    Seq((1L, "A", "!"), (3L, "c", "?")).toDF("id", "v", "suffix")
      .createOrReplaceTempView("extra_col_src")
    MergeSql.run(spark, store,
      """MERGE INTO t AS tg USING extra_col_src AS s ON tg.id = s.id
        |WHEN MATCHED THEN UPDATE SET tg.v = concat(s.v, s.suffix)
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, concat(s.v, s.suffix))""".stripMargin)
    val out = store.read("t").orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "A!"), (2L, "b"), (3L, "c?")))
  }

  test("update-only SQL merge against a store table drops unmatched source rows") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_sql5").toString, 2)
    store.createTable("t", Seq((1L, "a")).toDF("id", "v").schema, keys = Seq("id"))
    store.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Seq((2L, "B"), (9L, "X")).toDF("id", "v").createOrReplaceTempView("upd_src")
    MergeSql.run(spark, store,
      "MERGE INTO t AS tg USING upd_src AS s ON tg.id = s.id WHEN MATCHED THEN UPDATE SET tg.v = s.v")
    val out = store.read("t").orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"))) // 9 not inserted
  }

  test("WHEN MATCHED AND cond THEN DELETE branch (any clause order)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_sql6").toString, 2)
    store.createTable("t", Seq((1L, "a", 0L)).toDF("id", "v", "del").schema, keys = Seq("id"))
    store.append("t", Seq((1L, "keep", 0L), (2L, "kill", 0L), (3L, "upd", 0L)).toDF("id", "v", "del"))
    Seq((2L, "x", 1L), (3L, "UPD", 0L), (9L, "new", 0L)).toDF("id", "v", "del")
      .createOrReplaceTempView("del_src")
    MergeSql.run(spark, store,
      """MERGE INTO t AS tg USING del_src AS s ON tg.id = s.id
        |WHEN MATCHED AND s.del = 1 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET tg.v = s.v, tg.del = s.del
        |WHEN NOT MATCHED THEN INSERT (id, v, del) VALUES (s.id, s.v, s.del)""".stripMargin)
    val out = store.read("t").orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "keep", 0L), (3L, "UPD", 0L), (9L, "new", 0L)))
  }

  test("malformed statements are rejected") {
    intercept[IllegalArgumentException](MergeSql.parse("MERGE INTO a USING b"))
    intercept[IllegalArgumentException](MergeSql.parse(
      "MERGE INTO a t USING b s ON t.x = s.y WHEN MATCHED THEN UPDATE SET t.x = s.x"))
    // a CONDITIONAL update branch is unsupported — must fail cleanly, not
    // get swallowed into the delete-branch condition of a later clause
    intercept[IllegalArgumentException](MergeSql.parse(
      """MERGE INTO a t USING b s ON t.x = s.x
        |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET t.v = s.v
        |WHEN MATCHED THEN DELETE""".stripMargin))
  }
}
