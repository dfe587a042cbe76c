package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic event-analytics operators over an event log (user_id,
  * event_type, ts) — the funnel / cohort reporting layer a warehouse
  * serves from the same fact the sessionization (st2) and anomaly (st3)
  * queries read. Both ops reduce the log to per-user keyed aggregates
  * before anything joins, so every exchange is keyed on user_id or on
  * the (small) report key — nothing per-event crosses a join.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the SEQUENTIAL first-occurrence
    * times of `steps` (step i+1 counts only strictly AFTER the user's
    * step-i time), then per-step reached-user counts and conversion
    * vs step 1.
    *
    * Shape: ONE user-keyed aggregation over the funnel-typed events —
    * per user, the (ts, step-index) pairs collect and sort, and a
    * single left fold walks them in time order advancing a (reached,
    * last-time) accumulator: an event advances the funnel iff its step
    * is the next unfilled one, its time is strictly after the last
    * filled time, and (windowed form) within `maxGapUs` of it. The fold
    * computes exactly the join-chain recurrence ts_{i+1} = min{t of
    * step i+1 : t > ts_i (∧ t ≤ ts_i+gap)} — the first qualifying
    * event in ascending order IS that min, and equal-time ties sort the
    * lower step index first so a same-instant next-step event is
    * correctly rejected by the strict inequality. The per-step counts
    * then collapse to ONE row (a k-column global agg) and melt to
    * (step, n_users) rows via unpivot — the same single-Expand lowering
    * a13 guards.
    *
    * Scale: ONE shuffle on user_id regardless of k (the round-12 form
    * chained k−1 join+agg rounds, each re-shuffling the reach set);
    * per-user state is bounded by that user's own funnel-event count —
    * the same per-key bound sessionization carries. The fold is a
    * codegen'd `aggregate` over a sorted array, no UDF.
    *
    * Timestamps compare as integer microseconds; conversion is a
    * division of exact longs cast to double at the division — oracle
    * hash-stable (NULL, not NaN, when step-1 reach is zero).
    *
    * Bot-skew guard: per-user fold state is bounded by that user's own
    * funnel-event count — correct and small for real user traffic, but
    * one bot with tens of millions of funnel-typed events buffers them
    * all in a single task. `maxEventsPerUser` caps the state: the fold
    * then walks only each user's `cap` TIME-EARLIEST funnel events
    * (kept by the bounded-heap `graft_topk_min` aggregate — O(cap) per
    * user everywhere, map side included). Disclosed semantics: a user
    * whose funnel only completes after their first `cap` funnel events
    * under-reports (the greedy chain advances on earliest qualifying
    * events, so any human-scale cap is exact for human users); the
    * uncapped form and [[funnelStepsJoinChain]] remain the exact
    * fallbacks.
    *
    * @param maxGapUs conversion window: step i+1 must land within this
    *   many microseconds of step i (product-analytics "converted within
    *   N days"); None = unbounded.
    * @param maxEventsPerUser bot-skew cap: fold only each user's this
    *   many time-earliest funnel events, bounding per-user state at
    *   O(cap); None (default) = exact, state bounded by the user's own
    *   event count.
    * @return (step, event_type, n_users, conversion), step 1-based in
    *   funnel order. */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGapUs: Option[Long] = None,
      maxEventsPerUser: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    // step name → 0-based index as a when-chain (an ANSI map lookup
    // would throw on non-funnel event types; the chain yields NULL)
    val si = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val base = events.select(col(userCol).as("u"), si.as("si"),
        unix_micros(col(tsCol)).as("ets"))
      .filter(col("ets").isNotNull && col("si").isNotNull)
    // (ets, si) packs into ONE long — ets·2^7 + si — so the per-user
    // collect+sort runs over primitive bigints (≈2× the struct form's
    // throughput at high events-per-user): epoch micros stay < 2^56
    // until year ~4250, leaving 7 low bits for the step index, and the
    // packing is order-isomorphic to (ets asc, si asc) — exactly the
    // struct sort it replaces. k ≤ 128 and the epoch ≤ ts < 2^56 µs
    // domain filter below bound the packing on both sides.
    require(k <= 128, "funnel supports at most 128 steps")
    val packed = (col("ets") * lit(128L) + col("si")).as("p")
    // greedy chain fold: state = (reached count, time of last reached
    // step). The MinValue sentinel is never compared against (reached=0
    // short-circuits the gap check; t > MinValue is vacuous for real
    // timestamps).
    val zero = struct(lit(0).as("cnt"), lit(Long.MinValue).as("last"))
    def advance(acc: Column, x: Column): Column = {
      val cnt = acc.getField("cnt")
      val last = acc.getField("last")
      val t = shiftrightunsigned(x, 7) // exact ÷128 (x ≥ 0 by the filter)
      val gapOk = maxGapUs
        .map(g => cnt === 0 || t <= last + lit(g))
        .getOrElse(lit(true))
      val ok = x.bitwiseAND(lit(127L)).cast("int") === cnt && t > last && gapOk
      when(ok, struct((cnt + 1).as("cnt"), t.as("last"))).otherwise(acc)
    }
    val packedRows = base
      // the funnel family's declared time domain: 0 ≤ ets < 2^56 µs
      // (epoch ≤ ts < year ~4254). Pre-1970 rows would break the
      // packing's sign; rows at/above 2^56 µs would overflow ets·128+si
      // past Long.MaxValue — silently corrupting the sort order
      // (non-ANSI) or throwing mid-query (ANSI). Both bounds are domain
      // filters mirrored by every formulation and oracle.
      .filter(col("ets") >= 0 && col("ets") < lit(1L << 56))
      .select(col("u"), packed)
    // the sorted per-user packed array the fold walks: exact form
    // collects the user's whole funnel history; capped form keeps the
    // cap smallest packed values in a bounded heap (ascending output =
    // the same sort), per-user state O(cap) even against a bot
    val sortedPacked = sortedPackedAsc(maxEventsPerUser, k)
    val grouped = packedRows
      .groupBy("u").agg(
        aggregate(sortedPacked, zero, advance)
          .getField("cnt").as("reached"))
    val wide = grouped.agg(
      count(when(col("reached") >= 1, lit(1))).as("step_1"),
      (2 to k).map(i =>
        count(when(col("reached") >= i, lit(1))).as(s"step_$i")): _*)
    funnelMelt(wide, steps, k)
  }

  /** Funnel TRANSITION statistics — the time-between-steps companion of
    * [[funnelSteps]]: for each consecutive step pair (i → i+1), how many
    * users converted and how long they took (mean / min / max of
    * ts_{i+1} − ts_i in exact integer microseconds; the mean divides
    * exact longs, cast to double at the division — oracle hash-stable).
    * The product-analytics "where does the funnel stall" report.
    *
    * Shape: the same ONE user-keyed aggregation as [[funnelSteps]], but
    * the fold carries the chain's TIMES (array<long>, length ≤ k)
    * instead of just its length; the per-transition gaps then melt via
    * one Expand (inline array) and aggregate on the k−1-row report key.
    *
    * @return (step_from, step_to, event_from, event_to, n_converted,
    *   avg_gap_us, min_gap_us, max_gap_us), ordered by step_from. */
  /** The ascending per-user packed-event array every funnel fold walks:
    * exact form collects the user's whole funnel history; capped form
    * keeps the `cap` smallest packed values in a bounded heap
    * (ascending output = the same sort), per-user state O(cap) — map
    * side included — even against a bot (shared by [[funnelSteps]] and
    * [[funnelTransitionStats]]; same disclosed under-report semantics:
    * a user whose funnel only completes after their first `cap` funnel
    * events under-reports). */
  private def sortedPackedAsc(maxEventsPerUser: Option[Int],
      k: Int): Column = maxEventsPerUser match {
    case None => array_sort(collect_list(col("p")))
    case Some(cap) =>
      require(cap >= k, s"maxEventsPerUser ($cap) must be >= the step count ($k)")
      transform(
        call_function("graft_topk_min", col("p"), lit(""), lit(cap)),
        e => e.getField("key"))
  }

  def funnelTransitionStats(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      maxGapUs: Option[Long] = None,
      maxEventsPerUser: Option[Int] = None): DataFrame = {
    require(steps.size >= 2, "transition stats need at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    val si = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val base = events.select(col(userCol).as("u"), si.as("si"),
        unix_micros(col(tsCol)).as("ets"))
      .filter(col("ets").isNotNull && col("si").isNotNull &&
        col("ets") >= 0 && col("ets") < lit(1L << 56)) // funnel time domain
    require(k <= 128, "funnel supports at most 128 steps")
    val packed = (col("ets") * lit(128L) + col("si")).as("p")
    // chain fold carrying the filled TIMES: an event appends iff its
    // step is the next unfilled one, strictly after (and within gap of)
    // the last filled time. size(acc)===0 short-circuits the
    // element_at(acc, -1) access, so the empty state is never probed.
    val zero = lit(Array.empty[Long])
    def advance(acc: Column, x: Column): Column = {
      val t = shiftrightunsigned(x, 7)
      val last = element_at(acc, -1)
      val gapOk = maxGapUs
        .map(g => size(acc) === 0 || t <= last + lit(g))
        .getOrElse(lit(true))
      val ok = x.bitwiseAND(lit(127L)).cast("int") === size(acc) &&
        (size(acc) === 0 || t > last) && gapOk
      when(ok, concat(acc, array(t))).otherwise(acc)
    }
    val perUser = base.select(col("u"), packed)
      .groupBy("u").agg(
        aggregate(sortedPackedAsc(maxEventsPerUser, k), zero, advance)
          .as("times"))
    // melt the k−1 candidate transitions per user in ONE Expand (inline
    // of a literal-index array), keep the realized ones, aggregate on
    // the tiny (step_from) report key
    val gaps = perUser.select(explode(array((1 until k).map { i =>
        struct(lit(i).as("step_from"),
          when(size(col("times")) >= i + 1,
            element_at(col("times"), i + 1) - element_at(col("times"), i))
            .as("gap"))
      }: _*)).as("tr"))
      .select(col("tr.step_from"), col("tr.gap"))
      .filter(col("gap").isNotNull)
    val nameMap = map(steps.zipWithIndex.flatMap { case (st, i) =>
      Seq(lit(i + 1), lit(st))
    }: _*)
    gaps.groupBy("step_from")
      .agg(count(lit(1)).as("n_converted"),
        sum(col("gap")).as("__sum"),
        min(col("gap")).as("min_gap_us"),
        max(col("gap")).as("max_gap_us"))
      .select(col("step_from"),
        (col("step_from") + 1).as("step_to"),
        element_at(nameMap, col("step_from")).as("event_from"),
        element_at(nameMap, col("step_from") + 1).as("event_to"),
        col("n_converted"),
        (col("__sum").cast("double") / col("n_converted").cast("double"))
          .as("avg_gap_us"),
        col("min_gap_us"), col("max_gap_us"))
  }

  /** The round-12 funnel formulation — one filtered min-agg per step
    * chained by k−1 user-keyed left joins. Identical semantics and
    * output (EventAnalyticsSpec pins equality with [[funnelSteps]] on
    * the strict-order fixtures); kept as the A/B reference for the
    * single-pass rewrite's measurement (SCALE.md records the sf1
    * 6-step comparison). */
  def funnelStepsJoinChain(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      maxGapUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    // NULL-timestamp rows are unorderable — drop them up front on BOTH
    // engines (a NULL min would otherwise count toward step-1 reach in
    // SQL's count(1) but not in count(ts_1)). Out-of-domain rows drop
    // too: the funnel family's declared domain is epoch ≤ ts < 2^56 µs
    // (the single-pass form's packing needs both bounds, and the two
    // formulations must agree on every input)
    val base = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      unix_micros(col(tsCol)).as("ets"))
      .filter(col("ets").isNotNull && col("ets") >= 0 && col("ets") < lit(1L << 56))
    var acc = base.filter(col("t") === steps.head)
      .groupBy("u").agg(min(col("ets")).as("ts_1"))
    for (i <- 1 until k) {
      val e = base.filter(col("t") === steps(i))
        .select(col("u"), col("ets"))
      val carried = (1 to i).map(j => min(col(s"ts_$j")).as(s"ts_$j"))
      val inWindow = maxGapUs.foldLeft(col("ets") > col(s"ts_$i")) {
        (cond, gap) => cond && col("ets") <= col(s"ts_$i") + lit(gap)
      }
      val next = min(when(inWindow, col("ets"))).as(s"ts_${i + 1}")
      acc = acc.join(e, Seq("u"), "left_outer")
        .groupBy("u").agg(carried.head, (carried.tail :+ next): _*)
    }
    val wide = acc.agg(
      count(col("ts_1")).as("step_1"),
      (2 to k).map(i => count(col(s"ts_$i")).as(s"step_$i")): _*)
    funnelMelt(wide, steps, k)
  }

  /** Top USER-JOURNEY paths — the "pathfinder" report of product
    * analytics (Mixpanel/Amplitude user flows): per user, the first
    * `depth` events in time order define their journey path (event
    * types joined with '>'), and the report counts users per distinct
    * path, keeping the `topN` most common. Deterministic end to end:
    * per-user order is (ts, event_type) with timestamp ties broken by
    * type name, the report orders by (n_users desc, path).
    *
    * Shape: ONE user-keyed aggregation via the bounded-heap native
    * top-k aggregate ([[graft.spark.TopKMinAgg]], `graft_topk_min`):
    * only the `depth` time-earliest events per user ever live in the
    * aggregation state — O(depth) per user on the map side, in the
    * shuffle, and on the reduce side. The collect_list+slice form this
    * replaced buffered each user's FULL history before slicing, so one
    * pathological bot with tens of millions of events skewed a single
    * task; the heap holds `depth` rows no matter what the bot sends
    * (SCALE.md records the A/B). (ets, type-name) heap order is exactly
    * the struct sort order it replaced — byte-wise on ties — and the
    * report tail stays a count on the tiny path key plus a bounded
    * TakeOrdered top-N. Nothing corpus-global except that ≤topN-row
    * sort.
    *
    * @return (path, n_users), at most topN rows. */
  def topEventPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, depth: Int, topN: Int): DataFrame = {
    require(depth >= 1 && topN >= 1, "depth and topN must be >= 1")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("t"),
        unix_micros(col(tsCol)).as("ets"))
      .filter(col("ets").isNotNull && col("t").isNotNull)
    val perUser = base.groupBy("u").agg(
      concat_ws(">",
        transform(
          call_function("graft_topk_min", col("ets"), col("t"), lit(depth)),
          e => e.getField("payload"))).as("path"))
    perUser.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("path"))
      .limit(topN)
  }

  /** Event-type TRANSITION matrix — the first-order Markov flow report
    * behind user-journey sankeys: for every consecutive event pair in
    * each user's (ts, type)-ordered history, the transition count and
    * the conditional probability P(to | from) = n / n_from. Integer
    * counts throughout; the one division casts exact longs to double —
    * oracle hash-stable.
    *
    * Shape: consecutive rows of the (u)-partitioned (ets, type)-ordered
    * WINDOW are exactly the consecutive pairs of each user's sequence,
    * so pair formation is one `lead` over a spillable sort — unlike a
    * per-user `collect_list`, a bot with tens of millions of events
    * never has to fit one task's memory (the sorter spills; the earlier
    * array form buffered the user's entire history per row). Ties on
    * ets order by type, matching a lexicographic (ets, type) array
    * sort. Then a count on the tiny (from, to) key and a
    * broadcast-sized per-from total join.
    *
    * @return (from_type, to_type, n, p), ordered by (from, to). */
  def eventTransitionMatrix(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String): DataFrame =
    eventTransitionMatrix(events, userCol, typeCol, tsCol, None)

  /** `chunkUs` variant — the BOT-SKEW formulation: the default window
    * form sorts each user's WHOLE history in one task (spillable, but
    * single-threaded — a bot with tens of millions of events serializes
    * the stage on one core). Chunking splits every user's timeline into
    * `chunkUs`-microsecond time chunks: consecutive pairs form with a
    * `lead` INSIDE each (user, chunk) window — per-task state bounded
    * by a chunk's events, and a bot's chunks sort in parallel — and the
    * chunk-boundary pairs are recovered from each chunk's (first, last)
    * event: the global (ets, type) order is the concatenation of the
    * chunk sequences in chunk order (the chunk id is monotone in ets
    * and equal timestamps share a chunk), so (last of chunk k, first of
    * the next present chunk) are exactly the consecutive pairs the
    * per-chunk windows can't see. Per-user boundary state is
    * O(time-range / chunkUs) — independent of event count. Output is
    * IDENTICAL to the default form (spec-pinned; the registered st7b
    * twin hash-checks it against the same oracle); the trade is one
    * extra aggregation over the (user, chunk) key, which is why the
    * un-skewed default keeps the plain window. */
  def eventTransitionMatrix(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, chunkUs: Option[Long]): DataFrame = {
    val base = events.select(col(userCol).as("u"), col(typeCol).as("t"),
        unix_micros(col(tsCol)).as("ets"))
      .filter(col("ets").isNotNull && col("t").isNotNull)
    val pairs = chunkUs match {
      case None =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("u").orderBy(col("ets"), col("t"))
        base.select(col("t").as("from_type"),
            lead(col("t"), 1).over(w).as("to_type"))
          .filter(col("to_type").isNotNull) // a user's last event ends no pair
      case Some(c) =>
        require(c > 0, "chunkUs must be positive")
        // exact floor division (ets may be pre-1970): pmod keeps the
        // remainder non-negative, so chunk ids stay monotone in ets
        val ck = ((col("ets") - pmod(col("ets"), lit(c))) / lit(c))
          .cast("long")
        val chunked = base.withColumn("ck", ck)
        val wc = org.apache.spark.sql.expressions.Window
          .partitionBy("u", "ck").orderBy(col("ets"), col("t"))
        val within = chunked
          .select(col("t").as("from_type"),
            lead(col("t"), 1).over(wc).as("to_type"))
          .filter(col("to_type").isNotNull)
        // per-(user, chunk) first/last by the SAME (ets, type) order —
        // struct min/max compares fields lexicographically
        val edges = chunked.groupBy("u", "ck")
          .agg(min(struct(col("ets"), col("t"))).as("first"),
            max(struct(col("ets"), col("t"))).as("last"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy("u").orderBy(col("ck"))
        val boundary = edges
          .select(col("last.t").as("from_type"),
            lead(col("first.t"), 1).over(wb).as("to_type"))
          .filter(col("to_type").isNotNull)
        within.unionByName(boundary)
    }
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Shared funnel tail: melt the one-row (step_1..step_k) count frame
    * to (step, event_type, n_users, conversion) rows via unpivot. */
  private def funnelMelt(wide: DataFrame, steps: Seq[String],
      k: Int): DataFrame = {
    val typeMap = map(steps.zipWithIndex.flatMap { case (st, i) =>
      Seq(lit(i + 1), lit(st))
    }: _*)
    wide.unpivot(Array(col("step_1").as("n1")),
        (1 to k).map(i => col(s"step_$i")).toArray, "stepname", "n_users")
      .withColumn("step", substring(col("stepname"), 6, 10).cast("int"))
      .select(col("step"),
        element_at(typeMap, col("step")).as("event_type"),
        col("n_users"),
        // n1 = 0 (no step-1 events at all) would divide 0/0 → NaN,
        // where engines' IEEE settings disagree — publish NULL: the
        // conversion of an empty funnel is undefined, not a number
        when(col("n1") === 0, lit(null))
          .otherwise(col("n_users").cast("double") / col("n1").cast("double"))
          .as("conversion"))
  }

  /** Weekly cohort retention: cohort = the epoch-week of each user's
    * first event; a user is retained at offset w if active in
    * cohort_week + w. Weeks are exact integer division of epoch
    * microseconds (no calendar/timezone arithmetic — cross-engine
    * bit-stable), offset-0 row count IS the cohort size by
    * construction, and retention divides exact longs.
    *
    * Shape: the log collapses to distinct (user, week) activity first
    * (one shuffle, map-side partial dedup), the per-user cohort min is
    * a second user-keyed agg, and the cells agg + cohort-size join run
    * on the tiny (cohort, offset) report key — at 100 TB only the
    * first dedup touches event volume.
    *
    * @return (cohort_week, week_offset, n_active, retention). */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val wk = expr(s"unix_micros($tsCol) div 604800000000").as("wk")
    // NULL weeks (NULL ts) carry no cohort information and engines
    // disagree on NULL-key ordering — excluded on both sides
    val ua = events.select(col(userCol).as("u"), wk).distinct()
      .filter(col("wk").isNotNull)
    val cohorts = ua.groupBy("u").agg(min(col("wk")).as("cohort_week"))
    val cells = ua.join(cohorts, Seq("u"))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    cells.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** DAU / MAU stickiness — the product-analytics engagement headline:
    * per day, distinct daily actives, distinct trailing-`window`-day
    * actives, and their ratio. Exact (no sketches), so the oracle
    * hash-matches; at 100 TB an operating dashboard might swap the MAU
    * branch for a sliding HLL, trading exactness it can't check for a
    * shuffle it can skip — this is the truth-side form.
    *
    * Scale: one distinct over (user, day) — the only pass over the raw
    * log, with partial aggregation map-side — then a BOUNDED `window`×
    * expansion of that already-deduped table for the trailing-window
    * membership (each user-day appears in `window` MAU days), distinct
    * again, count per day. State never exceeds (users × active days) ×
    * window — log-volume-independent. Days with zero events emit no row
    * (inner join on the DAU side), so a sparse log stays sparse.
    *
    * @return (day, dau, mau, stickiness) ordered by day. */
  def dauMau(events: DataFrame, userCol: String, tsCol: String,
      window: Int = 30): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ud = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .filter(col("u").isNotNull && col("d").isNotNull)
      .distinct()
    val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    val mau = ud
      .select(col("u"),
        explode(expr(s"sequence(d, date_add(d, ${window - 1}))")).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("mau"),
        (col("dau").cast("double") / col("mau").cast("double")).as("stickiness"))
      .orderBy("day")
  }

  /** Sketch twin of [[dauMau]] — the operating-dashboard form the exact
    * op's scaladoc promises: per-day DataSketches HLL sketches of the
    * user id, the trailing window answered by UNIONING the window's
    * daily sketches. This is the branch swap that matters at 100 TB:
    * the exact MAU's one unavoidable pass is the (user, day) distinct —
    * state proportional to user-days — while a sketch absorbs the raw
    * log through a mergeable, map-side-partial day-keyed aggregation
    * whose state is lgK-bounded PER DAY (a few KB), and the window
    * expansion then moves `window` sketches per day, not user sets.
    * HLL register state is a max over hashes, so estimates are
    * insertion-order-independent — deterministic per input set.
    *
    * ~1.6% standard error at the default lgK = 12; the `st8b` harness
    * query pins |estimate − exact| per day under an x1-style slack gate.
    *
    * @return (day, dau_est, mau_est, stickiness_est) ordered by day. */
  def dauMauApprox(events: DataFrame, userCol: String, tsCol: String,
      window: Int = 30, lgConfigK: Int = 12): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val daily = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .filter(col("u").isNotNull && col("d").isNotNull)
      .groupBy("d")
      .agg(hll_sketch_agg(col("u"), lit(lgConfigK)).as("sk"))
    val mau = daily
      .select(explode(expr(s"sequence(d, date_add(d, ${window - 1}))")).as("d"),
        col("sk"))
      .groupBy("d").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("mau_est"))
    daily.select(col("d"), hll_sketch_estimate(col("sk")).as("dau_est"))
      .join(mau, Seq("d")) // inner: days with no events emit no row, like the exact op
      .select(col("d").as("day"), col("dau_est"), col("mau_est"),
        (col("dau_est").cast("double") / col("mau_est").cast("double"))
          .as("stickiness_est"))
      .orderBy("day")
  }
}
