package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based checks (SURVEY.md §5): merge idempotence, latest-wins
  * dedup, salted-join/agg equivalence. Uses plain ScalaCheck generators
  * with fixed seeds (deterministic; no scalatestplus bridge needed). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOf(for {
      id <- Gen.choose(0L, 20L)
      name <- Gen.alphaLowerStr.map(s => if (s.isEmpty) "x" else s.take(5))
      bal <- Gen.choose(-100, 100).map(_.toDouble)
    } yield (id, name, bal))

  private def sample(seed: Long): List[(Long, String, Double)] =
    rowsGen.apply(Gen.Parameters.default.withSize(30), Seed(seed)).getOrElse(Nil)

  private def dedupById(rows: List[(Long, String, Double)]) =
    rows.groupBy(_._1).map(_._2.head).toList

  test("merge is idempotent: merge(merge(t,s),s) == merge(t,s)") {
    for (seed <- 1L to 5L) {
      val (t0, s0) = (sample(seed), sample(seed + 100))
      val t = dedupById(t0).toDF("id", "name", "bal")
      val s = dedupById(s0).toDF("id", "name", "bal")
      val once = Merge.upsert(t, s, Seq("id"))
      val twice = Merge.upsert(once, s, Seq("id"))
      assert(once.orderBy("id", "name").collect().toSeq ==
        twice.orderBy("id", "name").collect().toSeq, s"seed=$seed")
    }
  }

  test("merge result keys = union of target and source keys") {
    for (seed <- 10L to 14L) {
      val (t0, s0) = (sample(seed), sample(seed + 100))
      val t = dedupById(t0).toDF("id", "name", "bal")
      val s = dedupById(s0).toDF("id", "name", "bal")
      val out = Merge.upsert(t, s, Seq("id"))
      val keys = out.select("id").as[Long].collect().toSet
      assert(keys == (dedupById(t0).map(_._1).toSet ++ dedupById(s0).map(_._1).toSet))
      assert(out.count() == keys.size, s"seed=$seed")
    }
  }

  test("DedupLatest picks the max (order, tiebreak) per key") {
    for (seed <- 20L to 24L) {
      val rows = sample(seed)
      if (rows.nonEmpty) {
        val df = rows.toDF("id", "name", "bal")
        val out = DedupLatest(df, Seq("id"), Seq(col("bal").desc, col("name").desc))
          .as[(Long, String, Double)].collect()
        val expect = rows.groupBy(_._1).map { case (_, g) =>
          g.maxBy(r => (r._3, r._2))
        }.toSet
        assert(out.toSet == expect, s"seed=$seed")
      }
    }
  }

  test("stratifiedSampleAgg equals the window sampler on random data") {
    for (seed <- 1L to 5L) {
      val rows = sample(seed).map { case (id, name, bal) =>
        // widen ids so strata sizes vary; stratify by sign bucket
        (id * 7 + name.length, if (bal < 0) "neg" else "pos")
      }.distinct
      if (rows.nonEmpty) {
        val df = rows.toDF("doc_id", "src")
        val win = CorpusOps.stratifiedSample(df, Seq("src"), "doc_id", k = 3)
          .select("src", "doc_id").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        val agg = CorpusOps.stratifiedSampleAgg(df, Seq("src"), "doc_id", k = 3)
          .select("src", "doc_id").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        assert(agg == win, s"seed $seed: bounded-heap pick diverged")
      }
    }
  }

  test("salted join equals plain join") {
    for (seed <- 30L to 34L) {
      val l = sample(seed).toDF("id", "name", "bal")
      val r = dedupById(sample(seed + 100)).toDF("id", "name2", "bal2").drop("bal2")
      val plain = l.join(r, Seq("id")).orderBy("id", "name", "name2").collect().toSeq
      val salted = SkewJoin.salted(l, r, Seq("id"), saltFactor = 4)
        .orderBy("id", "name", "name2").collect().toSeq
      assert(salted == plain, s"seed=$seed")
    }
  }

  test("asofBackward equals brute-force as-of over random data") {
    for (seed <- 50L to 54L) {
      val quotes = dedupByKeyTs(sample(seed))
      val trades = sample(seed + 100).map(r => (r._1, r._3.toLong * 3 + r._1))
      if (quotes.nonEmpty && trades.nonEmpty) {
        val qDf = quotes.toDF("k", "name", "ts").withColumn("ts", col("ts").cast("long"))
          .select(col("k"), col("ts"), col("name").as("px"))
        val tDf = trades.toDF("k", "ts")
        val got = TemporalJoins.asofBackward(tDf, qDf, Seq("k"), "ts", Map("px" -> "px"))
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) null else r.getString(2))).toSet
        val expect = trades.map { case (k, ts) =>
          val best = quotes.filter(q => q._1 == k && q._3.toLong <= ts)
            .sortBy(q => (q._3, q._2)).lastOption
          (k, ts, best.map(_._2).orNull)
        }.toSet
        assert(got == expect, s"seed=$seed")
      }
    }
  }

  /** unique (key, ts) pairs, keeping the max name as tiebreak winner. */
  private def dedupByKeyTs(rows: List[(Long, String, Double)]) =
    rows.map(r => (r._1, r._2, r._3.toLong))
      .groupBy(r => (r._1, r._3)).map(_._2.maxBy(_._2)).toList

  test("saltedAgg count/sum equals plain aggregation") {
    for (seed <- 40L to 44L) {
      val rows = sample(seed)
      if (rows.nonEmpty) {
        val df = rows.toDF("id", "name", "bal")
        val plain = df.groupBy("id").agg(count(lit(1)).as("n"), sum("bal").as("s"))
          .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        val salted = SkewJoin.saltedAgg(df, Seq("id"), 4,
          partials = Seq(count(lit(1)).as("pn"), sum("bal").as("ps")),
          finals = Seq(sum("pn").as("n"), sum("ps").as("s")))
          .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(plain.keySet == salted.keySet, s"seed=$seed")
        plain.foreach { case (k, (n, s)) =>
          val (n2, s2) = salted(k)
          assert(n == n2 && math.abs(s - s2) < 1e-9, s"seed=$seed key=$k")
        }
      }
    }
  }

  // random event logs: few users and a coarse timestamp grid force the
  // adversarial orderings (same-instant ties, repeats, out-of-order
  // steps) the funnel fold must handle exactly like the join chain;
  // negative seconds exercise the declared ts ≥ epoch domain cut (both
  // formulations must drop pre-1970 rows identically)
  private val eventsGen: Gen[List[(Long, String, java.sql.Timestamp)]] =
    Gen.listOf(for {
      u <- Gen.choose(0L, 6L)
      t <- Gen.oneOf("s1", "s2", "s3", "s4", "other")
      sec <- Gen.choose(-4L, 12L)
    } yield (u, t, new java.sql.Timestamp(sec * 1000L)))

  test("single-pass funnel equals the join chain on random event logs") {
    for (seed <- 1L to 12L) {
      val evRows = eventsGen
        .apply(Gen.Parameters.default.withSize(60), Seed(seed)).getOrElse(Nil)
      val ev = evRows.toDF("user_id", "event_type", "ts")
      for {
        steps <- Seq(Seq("s1", "s2"), Seq("s1", "s2", "s3", "s4"))
        gap <- Seq(None, Some(3L * 1000000L))
      } {
        val a = EventAnalytics.funnelSteps(ev, "user_id", "event_type",
            "ts", steps, gap).orderBy("step").collect().toSeq
        val b = EventAnalytics.funnelStepsJoinChain(ev, "user_id",
            "event_type", "ts", steps, gap).orderBy("step").collect().toSeq
        assert(a == b, s"seed=$seed steps=$steps gap=$gap:\n$a\n$b")
      }
    }
  }
}
