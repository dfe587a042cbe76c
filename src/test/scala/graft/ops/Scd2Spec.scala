package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // dim: K1 has a closed history row + a current row; K2 current; K3 current
  private def dim = Seq(
    ("K1", "v1", 10.0, 0L, Some(2L)), // history (closed)
    ("K1", "v2", 12.0, 2L, None),     // current, will change
    ("K2", "w1", 20.0, 1L, None),     // current, no-op change arrives
    ("K3", "x1", 30.0, 1L, None)      // current, no change arrives
  ).toDF("id", "attr", "price", "start_ts", "end_ts")
    .withColumn("end_ts", col("end_ts").cast("long"))

  private def changes = Seq(
    ("K1", "v3", 13.0, 5L), // differs -> close v2, open v3
    ("K2", "w1", 20.0, 5L), // identical -> no-op
    ("K9", "z1", 90.0, 5L)  // new key -> first version
  ).toDF("id", "attr", "price", "ts")

  test("close/open/no-op/new-key/history-passthrough semantics") {
    val out = Scd2(dim, changes, Seq("id"), Seq("attr", "price"), "ts")
      .orderBy("id", "start_ts")
      .as[(String, String, Double, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      ("K1", "v1", 10.0, 0L, Some(2L)),  // history untouched
      ("K1", "v2", 12.0, 2L, Some(5L)),  // closed at change ts
      ("K1", "v3", 13.0, 5L, None),      // new current version
      ("K2", "w1", 20.0, 1L, None),      // no-op change: row survives as-is
      ("K3", "x1", 30.0, 1L, None),      // untouched key
      ("K9", "z1", 90.0, 5L, None)))     // first version of a new key
  }

  test("applying the same change batch twice is idempotent") {
    val once = Scd2(dim, changes, Seq("id"), Seq("attr", "price"), "ts")
    val twice = Scd2(once, changes, Seq("id"), Seq("attr", "price"), "ts")
      .orderBy("id", "start_ts").collect().toSeq
    assert(twice == once.orderBy("id", "start_ts").collect().toSeq)
  }

  test("non-tracked columns carry from the closed row; null for new keys") {
    val d = Seq(("K1", "a", 1L, Option.empty[Long], "keepme"))
      .toDF("id", "attr", "start_ts", "end_ts", "note")
      .withColumn("end_ts", col("end_ts").cast("long"))
    val c = Seq(("K1", "b", 5L), ("K2", "c", 5L)).toDF("id", "attr", "ts")
    val out = Scd2(d, c, Seq("id"), Seq("attr"), "ts")
      .orderBy("id", "start_ts").collect()
    assert(out.map(_.getAs[String]("note")).toSeq == Seq("keepme", "keepme", null))
  }
}
