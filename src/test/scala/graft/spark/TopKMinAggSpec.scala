package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKMinAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keeps the k smallest (key, payload) pairs, ascending") {
    val df = Seq((5L, "e"), (1L, "a"), (3L, "c"), (2L, "b"), (4L, "d"))
      .toDF("k", "p")
    val out = df.agg(call_function("graft_topk_min", col("k"), col("p"), lit(3)))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("payload breaks key ties; nulls are ignored; k > group size is fine") {
    val df = Seq[(java.lang.Long, String)]((7L, "z"), (7L, "a"), (null, "x"), (7L, null))
      .toDF("k", "p")
    val out = df.agg(call_function("graft_topk_min", col("k"), col("p"), lit(5)))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((7L, "a"), (7L, "z")))
  }

  test("partial/merge across many partitions equals the single-partition answer") {
    val df = spark.range(0, 10000)
      .select((col("id") * 2654435761L % 100000L).as("k"),
        lpad(col("id").cast("string"), 6, "0").as("p"))
    val one = df.coalesce(1)
      .agg(call_function("graft_topk_min", col("k"), col("p"), lit(25)))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val many = df.repartition(32)
      .agg(call_function("graft_topk_min", col("k"), col("p"), lit(25)))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(one == many)
    // and it matches the sort-everything answer
    val brute = df.orderBy("k", "p").limit(25)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(many.map(r => (r.getLong(0), r.getString(1))) == brute)
  }

  test("grouped aggregation uses ObjectHashAggregate with partial pushdown") {
    val df = spark.range(0, 1000)
      .select((col("id") % 4).cast("string").as("g"), col("id").as("k"),
        col("id").cast("string").as("p"))
    val agg = df.groupBy("g")
      .agg(call_function("graft_topk_min", col("k"), col("p"), lit(3)).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(plan.contains("partial_graft_topk_min"),
      "map-side partial aggregation expected:\n" + plan.take(800))
    assert(agg.collect().forall(_.getSeq[org.apache.spark.sql.Row](1).size == 3))
  }

  test("graft_l2sq is bit-identical to the HOF zip_with/aggregate fold") {
    val df = spark.range(0, 2000).select(col("id"),
      transform(sequence(lit(0), lit(63)),
        i => (sin(col("id") * (i + 1)) * 1e3).cast("double")).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => (cos(col("id") + i) * 1e3).cast("double")).as("b"))
    val both = df.select(
      call_function("graft_l2sq", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (s, d) => s + d).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      "same fold order must give the same bits")
    // float arrays work too
    val f = Seq((Array(1f, 2f), Array(3f, 5f))).toDF("a", "b")
      .select(call_function("graft_l2sq", col("a"), col("b")))
      .head().getDouble(0)
    assert(f == 13.0)
  }

  test("graft_vecsum is bit-identical to the HOF zeros/zip_with fold") {
    val df = spark.range(0, 500).select(col("id"),
      transform(sequence(lit(0), lit(9)), j =>
        transform(sequence(lit(0), lit(31)),
          i => (sin(col("id") * (i + 1) + j) * 1e3).cast("double"))).as("vs"))
    val both = df.select(
      call_function("graft_vecsum", col("vs")).as("native"),
      aggregate(col("vs"),
        transform(sequence(lit(1), lit(32)), _ => lit(0.0)),
        (acc, v) => zip_with(acc, v, (x, y) => x + y)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      "same per-dim fold order must give the same bits")
  }

  test("graft_vecsum: ragged inputs clamp, null inner vectors error clearly") {
    val ragged = Seq(Tuple1(Seq(Seq(1.0, 2.0, 3.0), Seq(10.0)))).toDF("vs")
      .select(call_function("graft_vecsum", col("vs")))
      .head().getSeq[Double](0)
    assert(ragged == Seq(11.0, 2.0, 3.0), s"short vectors clamp: $ragged")
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(Seq(1.0), null))).toDF("vs")
        .select(call_function("graft_vecsum", col("vs"))).head()
    }
    assert(err.getMessage.contains("graft_vecsum") ||
      err.getCause != null, s"descriptive error expected: ${err.getMessage}")
  }

  test("rejects wrong types and non-literal k") {
    val df = Seq((1L, "a")).toDF("k", "p")
    intercept[Exception] {
      df.agg(call_function("graft_topk_min", col("p"), col("p"), lit(3))).head()
    }
    intercept[Exception] {
      df.agg(call_function("graft_topk_min", col("k"), col("p"), col("k"))).head()
    }
    intercept[Exception] {
      df.agg(call_function("graft_topk_min", col("k"), col("p"), lit(0))).head()
    }
  }
}
