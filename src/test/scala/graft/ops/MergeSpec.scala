package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "ann", 10.0), (2L, "bob", 20.0), (3L, "cat", 30.0)
  ).toDF("id", "name", "bal")

  test("matched rows updated, unmatched source inserted, target-only kept") {
    val source = Seq((2L, "BOB", 22.0), (4L, "dee", 40.0)).toDF("id", "name", "bal")
    val out = Merge.upsert(target, source, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out === Array(
      (1L, "ann", 10.0), (2L, "BOB", 22.0), (3L, "cat", 30.0), (4L, "dee", 40.0)))
  }

  test("empty source leaves target unchanged") {
    val source = target.filter(lit(false))
    val out = Merge.upsert(target, source, Seq("id"))
    assert(out.orderBy("id").collect() === target.orderBy("id").collect())
  }

  test("empty target becomes source") {
    val out = Merge.upsert(target.filter(lit(false)), target, Seq("id"))
    assert(out.orderBy("id").collect() === target.orderBy("id").collect())
  }

  test("composite key merge matches on all key columns") {
    val t = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k1", "k2", "v")
    val s = Seq((1L, 2L, "B"), (2L, 1L, "c")).toDF("k1", "k2", "v")
    val out = Merge.upsert(t, s, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, Long, String)].collect()
    assert(out === Array((1L, 1L, "a"), (1L, 2L, "B"), (2L, 1L, "c")))
  }

  test("explicit whenMatchedSet only touches named columns") {
    val source = Seq((2L, "ignored", 99.0)).toDF("id", "name", "bal")
    val out = Merge.upsert(target, source, Seq("id"),
      whenMatchedSet = Some(Map("bal" -> Merge.src("bal"))))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out(1) === ((2L, "bob", 99.0)))
  }

  test("insert casts and null-fills columns missing from source") {
    val source = Seq((5L, "eve")).toDF("id", "name")
    val out = Merge.upsert(target, source, Seq("id"))
      .filter($"id" === 5).as[(Long, String, Option[Double])].collect()
    assert(out === Array((5L, "eve", None)))
  }

  test("merge is idempotent: merge(merge(t,s),s) == merge(t,s)") {
    val source = Seq((2L, "BOB", 22.0), (4L, "dee", 40.0)).toDF("id", "name", "bal")
    val once = Merge.upsert(target, source, Seq("id"))
    val twice = Merge.upsert(once, source, Seq("id"))
    assert(twice.orderBy("id").collect() === once.orderBy("id").collect())
  }

  test("reference scenario: latest-wins dedup then merge (item fixture shape)") {
    // item_delta_1 vs item_delta_2: same ITEM_ID, later start_date wins
    // (item-...sql:72-75 + acceptance note :220)
    val dim = Seq(("AAAA", "loose stones", "1997-01-01")).toDF("item_id", "item_class", "start_date")
    val batch = Seq(
      ("AAAA", "loose stones", "1997-10-27"),
      ("AAAA", "stones", "1997-10-28")
    ).toDF("item_id", "item_class", "start_date")
    val deduped = DedupLatest.latestBy(batch, "item_id", "start_date", "item_class")
    val out = Merge.upsert(dim, deduped, Seq("item_id"))
      .as[(String, String, String)].collect()
    assert(out === Array(("AAAA", "stones", "1997-10-28")))
  }
}
