package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics pins for the funnel/cohort operators — the edge rules the
  * data-driven oracle can't isolate (strict sequential ordering, NULL
  * carry-forward, cohort bucketing). */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val WEEK = 604800L

  test("funnel counts only strictly-ordered step sequences") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "signup", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // u2: click BEFORE signup — must not count past step 1
      (2L, "click", ts(5)), (2L, "signup", ts(10)),
      // u3: click at the SAME instant as signup — strict > excludes it
      (3L, "signup", ts(10)), (3L, "click", ts(10)),
      // u4: never signed up — not even step 1
      (4L, "click", ts(10)), (4L, "purchase", ts(20)),
      // u5: signup → click, purchase only before the click
      (5L, "purchase", ts(5)), (5L, "signup", ts(10)), (5L, "click", ts(20))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelSteps(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got(0) == ((1, "signup", 4L, 1.0)))      // u1, u2, u3, u5
    assert(got(1) == ((2, "click", 2L, 0.5)))       // u1, u5 (u2/u3 clicks not strictly after)
    assert(got(2) == ((3, "purchase", 1L, 0.25)))   // u1 only (u5's purchase precedes its click)
  }

  test("windowed funnel excludes conversions outside the gap") {
    val ev = Seq(
      (1L, "signup", ts(10)), (1L, "click", ts(20)),     // within 60 s
      (2L, "signup", ts(10)), (2L, "click", ts(100)),    // outside 60 s
      // u2 has a later click too — still outside relative to its FIRST signup
      (2L, "click", ts(200))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelSteps(ev, "user_id", "event_type", "ts",
        Seq("signup", "click"), maxGapUs = Some(60L * 1000000L))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 2L), (2, 1L)))
  }

  test("cohort retention buckets by epoch week and divides by cohort size") {
    val ev = Seq(
      // cohort week 0: u1 active weeks 0,1; u2 active week 0 only
      (1L, "x", ts(100)), (1L, "x", ts(WEEK + 100)),
      (2L, "x", ts(200)),
      // cohort week 1: u3 active weeks 1 and 3
      (3L, "x", ts(WEEK + 50)), (3L, "x", ts(3 * WEEK + 50))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 1.0), (0L, 1L, 1L, 0.5),
      (1L, 0L, 1L, 1.0), (1L, 2L, 1L, 1.0)))
  }

  test("single-pass funnel equals the join-chain formulation on the strict-order fixtures") {
    // every tricky ordering from the two fixtures above, plus a user
    // with repeated step events (the fold must take the FIRST
    // qualifying one, like the chained min)
    val ev = Seq(
      (1L, "signup", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      (2L, "click", ts(5)), (2L, "signup", ts(10)),
      (3L, "signup", ts(10)), (3L, "click", ts(10)),
      (4L, "click", ts(10)), (4L, "purchase", ts(20)),
      (5L, "purchase", ts(5)), (5L, "signup", ts(10)), (5L, "click", ts(20)),
      (6L, "signup", ts(1)), (6L, "signup", ts(2)), (6L, "click", ts(3)),
      (6L, "click", ts(4)), (6L, "purchase", ts(2)), (6L, "purchase", ts(5))
    ).toDF("user_id", "event_type", "ts")
    for (gap <- Seq(None, Some(60L * 1000000L), Some(9L * 1000000L))) {
      val a = EventAnalytics.funnelSteps(ev, "user_id", "event_type", "ts",
          Seq("signup", "click", "purchase"), gap)
        .orderBy("step").collect().toSeq
      val b = EventAnalytics.funnelStepsJoinChain(ev, "user_id", "event_type",
          "ts", Seq("signup", "click", "purchase"), gap)
        .orderBy("step").collect().toSeq
      assert(a == b, s"gap=$gap: single-pass $a != join-chain $b")
    }
  }

  test("funnelTransitionStats reports exact per-transition gap statistics") {
    val ev = Seq(
      // u1 converts 1→2 in 10s, 2→3 in 5s
      (1L, "signup", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(25)),
      // u2 converts 1→2 in 30s, never step 3
      (2L, "signup", ts(0)), (2L, "click", ts(30)),
      // u3 reaches only step 1
      (3L, "signup", ts(100))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelTransitionStats(ev, "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"))
      .orderBy("step_from").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getDouble(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == Seq(
      (1, 2, "signup", "click", 2L, 20.0e6, 10000000L, 30000000L),
      (2, 3, "click", "purchase", 1L, 5.0e6, 5000000L, 5000000L)))
    // a gap window tightens the realized transitions (u2's 30 s 1→2 is
    // outside a 15 s window; nothing then reaches step 3 for u2)
    val windowed = EventAnalytics.funnelTransitionStats(ev, "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"),
        maxGapUs = Some(15L * 1000000L))
      .orderBy("step_from").collect()
      .map(r => (r.getInt(0), r.getLong(4))).toSeq
    assert(windowed == Seq((1, 1L), (2, 1L)))
  }

  test("topEventPaths orders each journey by time with type tie-breaks") {
    val ev = Seq(
      (1L, "a", ts(1)), (1L, "b", ts(2)), (1L, "c", ts(3)),
      (2L, "a", ts(5)), (2L, "b", ts(6)), (2L, "c", ts(7)),
      // u3: same-instant b/a — tie breaks by type name, a first
      (3L, "b", ts(1)), (3L, "a", ts(1)),
      // u4: five events — only the first 3 enter a depth-3 path
      (4L, "x", ts(1)), (4L, "y", ts(2)), (4L, "z", ts(3)), (4L, "a", ts(4))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.topEventPaths(ev, "user_id", "event_type",
        "ts", depth = 3, topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b>c", 2L), ("a>b", 1L)),
      s"top-2 must rank the shared path first, ties by path: $got")
  }

  test("eventTransitionMatrix counts consecutive pairs with exact probabilities") {
    val ev = Seq(
      (1L, "a", ts(1)), (1L, "b", ts(2)), (1L, "a", ts(3)), (1L, "c", ts(4)),
      (2L, "a", ts(1)), (2L, "b", ts(2)),
      (3L, "x", ts(9)) // single event: no transition
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.eventTransitionMatrix(ev, "user_id",
        "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // from a: a→b twice, a→c once; from b: b→a once
    assert(got == Seq(
      ("a", "b", 2L, 2.0 / 3.0), ("a", "c", 1L, 1.0 / 3.0),
      ("b", "a", 1L, 1.0)), s"got $got")
  }

  test("funnel with zero step-1 reach publishes NULL conversion, not NaN") {
    // nobody signs up — n1 = 0, and 0/0 must not leak IEEE NaN (engines
    // disagree on NaN handling; the conversion is undefined)
    val ev = Seq((1L, "click", ts(10)), (2L, "purchase", ts(20)))
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelSteps(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.isNullAt(3))).toSeq
    assert(got == Seq((1, 0L, true), (2, 0L, true), (3, 0L, true)))
  }

  test("bot-skew cap: funnelSteps(maxEventsPerUser) is exact within the cap") {
    val steps = Seq("signup", "click", "purchase")
    // a bot user floods 5 000 click events AFTER completing the funnel in
    // its first three events; two normal users behave normally
    val bot = Seq((9L, "signup", ts(1)), (9L, "click", ts(2)),
      (9L, "purchase", ts(3))) ++
      (1 to 5000).map(i => (9L, "click", ts(10 + i)))
    val ev = (bot ++ Seq(
      (1L, "signup", ts(10)), (1L, "click", ts(20)),
      (2L, "signup", ts(10)), (2L, "click", ts(5))
    )).toDF("user_id", "event_type", "ts")
    def run(cap: Option[Int]) =
      EventAnalytics.funnelSteps(ev, "user_id", "event_type", "ts", steps,
          maxEventsPerUser = cap)
        .orderBy("step").collect()
        .map(r => (r.getInt(0), r.getLong(2))).toSeq
    val exact = run(None)
    assert(exact == Seq((1, 3L), (2, 2L), (3, 1L)))
    // the cap keeps only each user's 10 time-earliest funnel events —
    // the bot completed within its first 3, so the report is EXACT
    // while per-user state is bounded at 10 regardless of the flood
    assert(run(Some(10)) == exact,
      "capped funnel must equal exact when funnels complete within the cap")
    assert(run(Some(3)) == exact,
      "cap = completion position is still exact (earliest events win)")
    // disclosed semantics: a funnel completing only AFTER the user's
    // first `cap` FUNNEL-TYPED events under-reports — u8's signup hides
    // behind four earlier non-advancing clicks, so cap=3 never sees it
    val late = Seq((8L, "click", ts(1)), (8L, "click", ts(2)),
      (8L, "click", ts(3)), (8L, "click", ts(4)),
      (8L, "signup", ts(5)), (8L, "click", ts(100)))
      .toDF("user_id", "event_type", "ts")
    def run2(cap: Option[Int]) =
      EventAnalytics.funnelSteps(late, "user_id", "event_type", "ts",
          Seq("signup", "click"), maxEventsPerUser = cap)
        .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(run2(None) == Seq((1, 1L), (2, 1L)))
    assert(run2(Some(3)) == Seq((1, 0L), (2, 0L)),
      "a funnel completing past the cap under-reports — the documented trade")
  }

  test("bot-skew cap: funnelTransitionStats(maxEventsPerUser) shares the fold semantics") {
    val steps = Seq("signup", "click", "purchase")
    // same shape as the funnel-cap fixture: the bot completes its chain
    // inside the first three funnel events, then floods clicks
    val bot = Seq((9L, "signup", ts(1)), (9L, "click", ts(2)),
      (9L, "purchase", ts(3))) ++
      (1 to 5000).map(i => (9L, "click", ts(10 + i)))
    val ev = (bot ++ Seq(
      (1L, "signup", ts(10)), (1L, "click", ts(20)),
      (2L, "signup", ts(10)), (2L, "click", ts(5))
    )).toDF("user_id", "event_type", "ts")
    def run(cap: Option[Int]) =
      EventAnalytics.funnelTransitionStats(ev, "user_id", "event_type",
          "ts", steps, maxEventsPerUser = cap)
        .orderBy("step_from").collect().map(_.toString).toSeq
    val exact = run(None)
    assert(exact.size == 2, s"both transitions realize: $exact")
    assert(run(Some(10)) == exact,
      "capped gaps must equal exact when chains realize within the cap")
    assert(run(Some(3)) == exact,
      "cap = completion position is still exact (earliest events win)")
    // the under-report side: a chain realizing past the cap drops out
    val late = Seq((8L, "click", ts(1)), (8L, "click", ts(2)),
      (8L, "click", ts(3)), (8L, "click", ts(4)),
      (8L, "signup", ts(5)), (8L, "click", ts(100)))
      .toDF("user_id", "event_type", "ts")
    def run2(cap: Option[Int]) =
      EventAnalytics.funnelTransitionStats(late, "user_id", "event_type",
          "ts", Seq("signup", "click"), maxEventsPerUser = cap)
        .orderBy("step_from").collect().map(_.toString).toSeq
    assert(run2(None).size == 1 && run2(Some(3)).isEmpty,
      "a chain realizing past the cap under-reports — the documented trade")
  }

  test("chunked eventTransitionMatrix equals the global-window form") {
    // adversarial boundary placement: events straddling chunk edges,
    // ties on ets at an edge, single-event chunks, empty chunks between
    // active ones, a pre-1970 timestamp (negative ets floor division),
    // and a user whose whole history fits one chunk
    val c = 1000000L // 1 s chunks (ts() steps are seconds)
    val ev = Seq(
      (1L, "a", ts(0)), (1L, "b", ts(0)),   // tie inside chunk 0
      (1L, "c", ts(1)),                     // chunk 1: single event
      (1L, "d", ts(5)), (1L, "e", ts(5)),   // gap of empty chunks, tie
      (2L, "x", ts(2)), (2L, "y", ts(2)), (2L, "z", ts(2)), // one chunk
      (3L, "p", new java.sql.Timestamp(-1500L)), // pre-1970
      (3L, "q", ts(0)), (3L, "r", ts(3))
    ).toDF("user_id", "event_type", "ts")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val exact = rows(EventAnalytics.eventTransitionMatrix(
      ev, "user_id", "event_type", "ts"))
    val chunked = rows(EventAnalytics.eventTransitionMatrix(
      ev, "user_id", "event_type", "ts", chunkUs = Some(c)))
    assert(chunked == exact, s"chunked diverged:\n$chunked\nvs\n$exact")
    // degenerate chunk sizes: everything in one chunk / every event its
    // own chunk — both still exact
    assert(rows(EventAnalytics.eventTransitionMatrix(
      ev, "user_id", "event_type", "ts", Some(Long.MaxValue))) == exact)
    assert(rows(EventAnalytics.eventTransitionMatrix(
      ev, "user_id", "event_type", "ts", Some(1L))) == exact)
  }

  test("topEventPaths bounded-heap form matches the collect+slice semantics") {
    // duplicate (ts, type) pairs, ties, and a deep history: the bounded
    // top-k heap must reproduce the exact (ts, type)-sorted first-depth
    // slice, duplicates included
    val ev = Seq(
      (1L, "a", ts(1)), (1L, "a", ts(1)), (1L, "b", ts(2)),
      (2L, "b", ts(1)), (2L, "a", ts(1)), (2L, "c", ts(0))
    ).toDF("user_id", "event_type", "ts") // u2 order: c, a, b
    val got = EventAnalytics.topEventPaths(ev, "user_id", "event_type",
        "ts", depth = 3, topN = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>a>b", 1L), ("c>a>b", 1L)), s"got $got")
  }

  test("dauMau: trailing-window actives, partial leading windows, null hygiene") {
    val D = 86400L
    val ev = Seq(
      (Option(1L), Option(ts(100))),           // day 0
      (Option(1L), Option(ts(200))),           // day 0 again — one user-day
      (Option(2L), Option(ts(300))),           // day 0
      (Option(2L), Option(ts(9 * D + 50))),    // day 9 — day 0 inside its window
      (Option(3L), Option(ts(45 * D + 50))),   // day 45 — beyond day 9's reach
      (Option.empty[Long], Option(ts(9 * D))), // null user ignored
      (Option(7L), Option.empty[Timestamp])    // null ts ignored
    ).toDF("user_id", "ts")
    val got = EventAnalytics.dauMau(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("1970-01-01", 2L, 2L, 1.0),  // leading partial window = the day itself
      ("1970-01-10", 1L, 2L, 0.5),  // MAU unions day 0's actives
      ("1970-02-15", 1L, 1L, 1.0)), // stale actives aged out
      s"got $got")
    // zero-event days emit no rows (sparse log stays sparse) — implicit in
    // the exact 3-row sequence above. Tighter window: day 9 ages day 0 out.
    val w5 = EventAnalytics.dauMau(ev, "user_id", "ts", window = 5)
      .collect().map(r => (r.getDate(0).toString, r.getLong(2))).toSeq
    assert(w5 == Seq(("1970-01-01", 2L), ("1970-01-10", 1L),
      ("1970-02-15", 1L)), s"got $w5")
  }

  test("dauMauApprox: HLL twin tracks exact within sketch error, same day set") {
    val D = 86400L
    // 400 users across 40 days, each active on (id % 7 == day % 7) days —
    // enough cardinality for dense-mode HLL, small enough to cross-check
    val ev = (0 until 400).flatMap { u =>
      (0 until 40).collect { case day if (u + day) % 7 == 0 =>
        (u.toLong, ts(day * D + u))
      }
    }.toDF("user_id", "ts")
    val exact = EventAnalytics.dauMau(ev, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    val est = EventAnalytics.dauMauApprox(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(est.map(_._1).toSet == exact.keySet, "same active-day set")
    est.foreach { case (day, dauE, mauE) =>
      val (dau, mau) = exact(day)
      assert(math.abs(dauE - dau) <= math.max(4.0, dau * 0.05),
        s"$day dau: est $dauE vs exact $dau")
      assert(math.abs(mauE - mau) <= math.max(4.0, mau * 0.05),
        s"$day mau: est $mauE vs exact $mau")
    }
  }
}
