package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof backward picks greatest right ts <= left ts, per key") {
    val quotes = Seq( // key, ts, px
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "ts", "px")
    val trades = Seq(
      ("A", 9L), ("A", 10L), ("A", 25L), ("A", 31L),
      ("B", 14L), ("C", 50L)).toDF("sym", "ts")
    val out = TemporalJoins.asofBackward(trades, quotes, Seq("sym"), "ts",
        Map("px" -> "px"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(out(0)._3.isNaN)           // A@9: nothing before
    assert(out(1) == ("A", 10L, 1.0)) // equal ts included (<=)
    assert(out(2) == ("A", 25L, 2.0)) // between quotes -> earlier one
    assert(out(3) == ("A", 31L, 3.0))
    assert(out(4)._3.isNaN)           // B@14: B quote is at 15
    assert(out(5)._3.isNaN)           // C: no quotes at all
  }

  test("asof forward picks smallest right ts >= left ts, per key") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 15L, 9.0)).toDF("sym", "ts", "px")
    val trades = Seq(("A", 5L), ("A", 10L), ("A", 15L), ("A", 25L), ("B", 16L))
      .toDF("sym", "ts")
    val out = TemporalJoins.asofForward(trades, quotes, Seq("sym"), "ts", Map("px" -> "px"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(out(0) == ("A", 5L, 1.0))
    assert(out(1) == ("A", 10L, 1.0)) // equal ts included
    assert(out(2) == ("A", 15L, 2.0))
    assert(out(3)._3.isNaN)           // nothing after 25
    assert(out(4)._3.isNaN)           // B@16: B quote was at 15
  }

  test("pointInRange matches exact inequality join across bin widths") {
    val points = (0L to 100L).map(i => (i, i * 7L)).toDF("pid", "ts")
    val intervals = Seq((1L, 0L, 50L), (2L, 49L, 300L), (3L, 700L, 701L), (4L, 700L, 700L))
      .toDF("iid", "s", "e")
    val expected = for {
      (pid, ts) <- (0L to 100L).map(i => (i, i * 7L))
      (iid, st, en) <- Seq((1L, 0L, 50L), (2L, 49L, 300L), (3L, 700L, 701L), (4L, 700L, 700L))
      if ts >= st && ts < en
    } yield (pid, iid)
    for (bw <- Seq(1L, 10L, 64L, 1000L)) {
      val got = TemporalJoins.pointInRange(points, intervals, "ts", "s", "e", bw)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected.toSet, s"binWidth=$bw")
    }
  }
}
