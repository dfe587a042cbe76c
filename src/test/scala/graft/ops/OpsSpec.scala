package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DedupLatest keeps exactly one latest row per key") {
    val df = Seq(
      (1L, "2024-01-01", "a"), (1L, "2024-02-01", "b"),
      (2L, "2024-01-15", "c")
    ).toDF("id", "d", "v")
    val out = DedupLatest(df, Seq("id"), Seq($"d".desc))
      .orderBy("id").as[(Long, String, String)].collect()
    assert(out === Array((1L, "2024-02-01", "b"), (2L, "2024-01-15", "c")))
  }

  test("DedupLatest tiebreak makes winner deterministic") {
    val df = Seq((1L, "2024-01-01", 1L), (1L, "2024-01-01", 2L)).toDF("id", "d", "seq")
    val out = DedupLatest(df, Seq("id"), Seq($"d".desc, $"seq".desc)).collect()
    assert(out.length === 1 && out(0).getLong(2) === 2L)
  }

  test("IncrementalAgg combines NULL base aggregates like a full recompute") {
    val base = Seq((1L, Option.empty[Long]), (2L, Some(10L))).toDF("g", "s")
    val delta = Seq((1L, Some(5L)), (2L, Option.empty[Long]), (3L, Some(7L))).toDF("g", "s")
    val out = IncrementalAgg.applyDelta(base, delta, Seq("g"), adds = Seq("s"))
      .orderBy("g").as[(Long, Option[Long])].collect().toSeq
    // NULL + 5 -> 5, 10 + NULL -> 10, new group -> 7 (sum-aggregate semantics)
    assert(out == Seq((1L, Some(5L)), (2L, Some(10L)), (3L, Some(7L))))
  }

  test("TableOps.update only rewrites rows matching the predicate") {
    val df = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val out = TableOps.update(df, $"k" === 1, Map("v" -> lit("z")))
      .orderBy("k").as[(Int, String)].collect()
    assert(out === Array((1, "z"), (2, "y")))
  }

  test("TableOps.truncate empties but preserves schema") {
    val df = Seq((1, "x")).toDF("k", "v")
    val out = TableOps.truncate(df)
    assert(out.count() === 0 && out.schema === df.schema)
  }

  test("TableOps.append aligns by name and null-pads missing columns") {
    val t = Seq((1, "x", 1.5)).toDF("k", "v", "w")
    val s = Seq((2, "y")).toDF("k", "v")
    val out = TableOps.append(t, s).orderBy("k")
      .as[(Int, String, Option[Double])].collect()
    assert(out === Array((1, "x", Some(1.5)), (2, "y", None)))
  }

  test("SurrogateKey.assign keeps existing keys and continues the sequence") {
    val df = Seq(
      (Some(5L), "a"), (Some(9L), "b"), (None: Option[Long], "c"), (None: Option[Long], "d")
    ).toDF("key", "v")
    val out = SurrogateKey.assign(df, "key")
    val keys = out.select("key").as[Long].collect().sorted
    assert(keys === Array(5L, 9L, 10L, 11L))
    // stability: re-running assigns nothing new
    val again = SurrogateKey.assign(out, "key")
    assert(again.select("key").as[Long].collect().sorted === keys)
  }

  test("SurrogateKey.attach produces unique contiguous keys above start") {
    val df = Seq("a", "b", "c").toDF("v")
    val keys = SurrogateKey.attach(df, "id", startAfter = 100L)
      .select("id").as[Long].collect().sorted
    assert(keys === Array(101L, 102L, 103L))
  }
}
