package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming event processing (SURVEY.md §2.9: the reference's
  * streaming surface is file-arrival CDC micro-batching, covered by
  * [[graft.ingest.Pipe]] + [[graft.cdc.ChangeStream]]; this module adds
  * the standard event-time operators a production stream pipeline needs —
  * watermarked tumbling/sliding windows and custom session state — over
  * the `events` table shape (event_id, user_id, event_type, value, ts).
  *
  * Scale: windowed aggregation is partial+final HashAggregate per
  * micro-batch with state kept in the state store keyed by (window,
  * keys); the watermark bounds state size. Sessionization uses
  * flatMapGroupsWithState — state per user_id, evicted on event-time
  * timeout, so state is O(active users), not O(events).
  */
object EventStreams {

  /** Watermarked tumbling-window counts+sums per event_type.
    * Works identically on a batch DataFrame (windows computed directly)
    * and a streaming one (late data beyond the watermark dropped). */
  def windowedStats(
      events: DataFrame,
      windowDur: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Sliding-window variant (windowDur length, slide interval). */
  def slidingStats(
      events: DataFrame, windowDur: String, slide: String, watermark: String): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"))
  }

  /** Streaming exactly-once event dedup: duplicates of `idCols` arriving
    * within the watermark horizon are dropped; state is bounded by the
    * watermark (ids older than it are evicted — the at-least-once →
    * exactly-once repair stage in front of an idempotent sink). Batch
    * DataFrames fall back to a plain dropDuplicates. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermark: String = "2 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Streaming DAU — the real-time twin of
    * [[graft.ops.EventAnalytics.dauMau]]'s DAU branch: distinct daily
    * actives per event-time day, exactly-once under duplicate delivery.
    * BOTH stateful stages ride the watermark: the per-(user, day) dedup
    * evicts a day's user set once the watermark passes it, and the
    * count aggregates on the 1-day event-time WINDOW (not a derived day
    * column — a plain day key would accrete one permanent state row per
    * day forever), so finalized windows evict too. Total state is
    * bounded by one watermark-horizon of distinct actives plus the open
    * windows. Late events inside the watermark still count toward
    * their event-time day; beyond it they drop, the standard trade.
    * Batch frames run the same dedup+window pipeline, so stream ≡ batch
    * on finalized days AT ANY SESSION TIMEZONE.
    *
    * Day semantics: UTC epoch days throughout — Spark's event-time
    * windows are epoch-aligned regardless of the session timezone, so
    * the dedup key is the epoch-day index (floor division, exact for
    * pre-1970 rows) and the emitted `day` label converts that index
    * timezone-free via date_from_unix_date. A session-local `to_date`
    * key would bucket differently from the window in any non-UTC
    * session (the batch twin [[graft.ops.EventAnalytics.dauMau]] uses
    * session-local days; the two agree under the UTC sessions every
    * graft entry point pins). Run with outputMode("update") (the count
    * row for a day re-emits as stragglers arrive). */
  def streamingDau(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame = {
    val DayUs = 86400000000L
    val us = unix_micros(col(tsCol))
    val keyed = events
      .select(col(userCol).as("u"), col(tsCol).as("ts"),
        ((us - pmod(us, lit(DayUs))) / lit(DayUs)).cast("long").as("day"))
      .filter(col("u").isNotNull && col("day").isNotNull)
    val deduped =
      if (events.isStreaming)
        keyed.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark(Seq("u", "day"))
      else keyed.dropDuplicates("u", "day")
    deduped.groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(date_from_unix_date(
          (unix_micros(col("window.start")) / lit(DayUs)).cast("int")).as("day"),
        col("dau"))
  }

  /** Streaming DAU + day-keyed HLL sketch — the real-time twin of the
    * st8b operating-dashboard form ([[graft.ops.EventAnalytics
    * .dauMauApprox]]): the same dedup+window pipeline as
    * [[streamingDau]], with each finalized day additionally carrying
    * the DataSketches HLL sketch of its active users. The sketch is
    * the MERGEABLE half of the MAU problem: trailing-window MAU needs
    * cross-day distinct-union state that would grow with users ×
    * window inside the stream, but a day's lgK-bounded sketch (a few
    * KB) unions associatively AFTER finalization — so the stream keeps
    * only the bounded per-day state it already kept (dedup rows inside
    * the watermark + one open-window row per day, both
    * watermark-evicted), and [[dauMauFromDailySketches]] answers MAU
    * over the finalized (day, dau, sk) table at read time by moving
    * `window` sketches per day, not user sets. This split is the
    * production architecture at 100 TB: the log-volume pass lives in
    * the stream with hard state bounds; the dashboard union touches
    * kilobytes.
    *
    * Run with outputMode("append"): a day's row emits ONCE, when the
    * watermark finalizes its window — exactly the rows the batch union
    * may trust. Same UTC-epoch-day semantics as [[streamingDau]]
    * (session-timezone-independent); batch frames run the identical
    * dedup+window pipeline, so stream ≡ batch on finalized days. The
    * dedup stage costs the sketch nothing (HLL registers are
    * insertion-idempotent) but keeps the emitted `dau` EXACT — the
    * st8b twin estimates both sides, this one estimates only the MAU
    * it cannot afford exactly.
    *
    * @return (day DATE, dau LONG exact, sk BINARY HLL sketch). */
  def streamingDauSketches(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", watermark: String = "1 hour",
      lgConfigK: Int = 12): DataFrame = {
    val DayUs = 86400000000L
    val us = unix_micros(col(tsCol))
    val keyed = events
      .select(col(userCol).as("u"), col(tsCol).as("ts"),
        ((us - pmod(us, lit(DayUs))) / lit(DayUs)).cast("long").as("day"))
      .filter(col("u").isNotNull && col("day").isNotNull)
    val deduped =
      if (events.isStreaming)
        keyed.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark(Seq("u", "day"))
      else keyed.dropDuplicates("u", "day")
    deduped.groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("dau"),
        hll_sketch_agg(col("u"), lit(lgConfigK)).as("sk"))
      .select(date_from_unix_date(
          (unix_micros(col("window.start")) / lit(DayUs)).cast("int")).as("day"),
        col("dau"), col("sk"))
  }

  /** The read-time MAU union over [[streamingDauSketches]]' finalized
    * (day, dau, sk) table: each day's trailing-`window` MAU estimate is
    * the HLL union of the window's daily sketches — the same
    * forward-expansion + `hll_union_agg` shape as the batch st8b twin
    * ([[graft.ops.EventAnalytics.dauMauApprox]]), so on fully-finalized
    * days the two produce IDENTICAL estimates (HLL register state is a
    * max over hashes — deterministic per input set, dedup- and
    * order-independent). A day whose trailing window is only partially
    * finalized under-unions — read the report a watermark behind the
    * stream head, the standard dashboard trade.
    *
    * @return (day, dau, mau_est, stickiness_est) ordered by day. */
  def dauMauFromDailySketches(daily: DataFrame,
      window: Int = 30): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val mau = daily
      .select(explode(expr(s"sequence(day, date_add(day, ${window - 1}))")).as("day"),
        col("sk"))
      .groupBy("day").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("mau_est"))
    daily.select(col("day"), col("dau"))
      .join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau_est"),
        (col("dau").cast("double") / col("mau_est")).as("stickiness_est"))
      .orderBy("day")
  }

  /** Streaming URL-level dedup — the STATEFUL first stage of a
    * continuous-ingest CCNet/RefinedWeb crawl pipeline (batch twin:
    * [[graft.ops.WebCuration.canonicalizeUrlsAgg]]'s keep set):
    * canonicalize each URL ([[graft.ops.WebCuration.canonUrl]]) and
    * emit only the FIRST document per canonical form, dropping every
    * later re-crawl. State = one row per distinct canonical URL inside
    * the watermark horizon (`dropDuplicatesWithinWatermark` —
    * watermark-evicted, the same bound [[streamingDau]]'s per-(user,
    * day) dedup carries); run with outputMode("append") — a kept row
    * emits exactly once, and a duplicate arriving in ANY later
    * micro-batch (or after a kill/restart, via the state store) is
    * dropped, not re-emitted.
    *
    * Disclosed semantics delta vs batch: the batch form keeps
    * `min(id)` per group, the stream keeps the first ARRIVAL. On an
    * ingest feed where ids are assigned in arrival order — the crawl
    * case this stage exists for — the two keep sets coincide
    * (EventStreamsSpec pins it); on out-of-order replays they can
    * differ within a group, never in group membership. A batch frame
    * takes the batch twin's min-id path, so one call site serves both
    * and stream ≡ batch on finalized data.
    *
    * @return (idCol, urlCol, canon_url, tsCol) — kept rows only. */
  def streamingUrlDedup(docs: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url", tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame = {
    if (docs.isStreaming) {
      docs.select(col(idCol), col(urlCol),
          graft.ops.WebCuration.canonUrl(col(urlCol)).as("canon_url"), col(tsCol))
        .withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(Seq("canon_url"))
    } else {
      // batch twin: min(id) wins — canonicalizeUrlsAgg's keep set with
      // the same physics: map-side combine collapses the hot key, the
      // fenced canon alias keeps the regex chain out of inferred
      // isnotnull filters, and the join-back is salted (AQE's skew rule
      // cannot split a join whose build side aggregates in-stage — see
      // canonicalizeUrlsAgg)
      val keyed = docs.select(col(idCol), col(urlCol),
        graft.ops.WebCuration.fence(
          graft.ops.WebCuration.canonUrl(col(urlCol))).as("canon_url"), col(tsCol))
      val groups = keyed.groupBy("canon_url").agg(min(col(idCol)).as("__keeper"))
      graft.ops.SkewJoin.salted(keyed, groups, Seq("canon_url"), 8)
        .filter(col(idCol) === col("__keeper"))
        .select(col(idCol), col(urlCol), col("canon_url"), col(tsCol))
    }
  }

  /** Stream-stream interval join: each left event pairs with right events
    * of the same user within `[l.ts - lookback, l.ts]` — the standard
    * impression⋈click enrichment. Both sides are watermarked so the join
    * state is bounded (right rows older than lookback + watermark are
    * evicted). Output columns: left.* plus the right event's id/type/value
    * as matched_*. */
  def intervalJoin(left: DataFrame, right: DataFrame, lookback: String,
      watermark: String = "2 minutes"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark("ts", watermark) else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark("ts", watermark) else right).alias("r")
    l.join(r,
      expr(s"""l.user_id = r.user_id AND
               |r.ts BETWEEN l.ts - INTERVAL $lookback AND l.ts AND
               |l.event_id <> r.event_id""".stripMargin))
      .select(col("l.event_id"), col("l.user_id"), col("l.event_type"),
        col("l.value"), col("l.ts"),
        col("r.event_id").as("matched_id"), col("r.event_type").as("matched_type"),
        col("r.ts").as("matched_ts"))
  }

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts: Timestamp)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, sumValue: Double)
  final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Custom per-key state: gap-based sessionization via
    * flatMapGroupsWithState. A session closes when no event arrives for
    * `gapMs` of event time (enforced by event-time timeout against the
    * watermark); closed sessions are emitted downstream. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "2 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.lastSeen),
              s.nEvents, s.sumValue))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case Some(s) => // gap exceeded: close the old session
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.lastSeen),
                    s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class FunnelState(pending: List[(Long, Int)], reached: Int,
    lastUs: Long, seen: Long = 0L)
  final case class FunnelStepHit(user_id: Long, step: Int,
    event_type: String, step_time: Timestamp)

  /** Streaming ordered funnel — the real-time twin of
    * [[graft.ops.EventAnalytics.funnelSteps]]: per user, the same
    * strict-sequential greedy chain (step i+1 counts only strictly after
    * step i, optionally within `maxGapUs`), emitted incrementally as
    * (user, step, step_time) transitions the moment each step becomes
    * FINAL. Downstream `groupBy(step).count()` gives live per-step reach.
    *
    * Correctness under disorder: an event folds into the chain only once
    * the watermark passes its event time — at that point nothing earlier
    * can still arrive, so folding the ready events in (ts, step) order
    * replays exactly the batch fold, even when a step-1 event ARRIVES
    * after the step-2 event it unlocks. Not-yet-final events wait in the
    * per-user pending buffer (watermark-bounded, same guarantee as the
    * engine's windowed aggs); an event-time timeout at the newest pending
    * timestamp guarantees the buffer drains even if the user goes silent.
    *
    * Domain: events outside the funnel family's declared time domain
    * (epoch ≤ ts < 2^56 µs) are dropped up front — the exact filter both
    * batch formulations apply, so stream and batch agree on every input.
    *
    * State: O(users) × (pending within the watermark horizon + two
    * scalars). A user who completes the funnel keeps a TOMBSTONE (reached
    * = k, empty buffer, no timeout — a few dozen bytes): the batch fold
    * rejects every event after completion (no step index equals k), so a
    * late step-1 event must NOT restart the funnel and re-emit step hits
    * — evicting completed state would do exactly that. The tombstone is
    * the per-user floor any exactly-once funnel carries; billions of
    * completed users cost O(users) state-store bytes, the same bound the
    * active population already holds.
    *
    * `maxEventsPerUser` is the BOT-SKEW cap, mirroring the batch twin
    * ([[graft.ops.EventAnalytics.funnelSteps]]'s parameter and the
    * st4d registered form): only each user's cap time-earliest funnel
    * events fold — a `seen` counter charges every finalized event
    * against the cap, and the pending buffer keeps at most the
    * remaining-budget earliest events (anything past the budget could
    * never fold). Without it the pending list is only watermark-bounded:
    * a bot emitting funnel-typed events INSIDE one watermark horizon
    * grows a single user's state without bound; with it per-user state
    * is O(min(cap, horizon events)) — the same disclosed under-count
    * trade as the batch cap, and stream ≡ batch holds at the same cap. */
  def streamingFunnel(events: Dataset[Event], steps: Seq[String],
      maxGapUs: Option[Long] = None,
      maxEventsPerUser: Option[Int] = None,
      watermark: String = "2 minutes"): Dataset[FunnelStepHit] = {
    maxEventsPerUser.foreach(cap => require(cap >= steps.size,
      s"maxEventsPerUser ($cap) must be >= the step count (${steps.size})"))
    import events.sparkSession.implicits._
    val k = steps.size
    val idx = steps.zipWithIndex.toMap
    val stepArr = steps.toArray
    def micros(ts: Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events.withWatermark("ts", watermark)
      .filter { e =>
        val us = micros(e.ts)
        idx.contains(e.event_type) && us >= 0 && us < (1L << 56)
      }
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelStepHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(Nil, 0, Long.MinValue))
          val incoming = it.map(e => (micros(e.ts), idx(e.event_type))).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // events at or below the watermark are FINAL — fold them in
          // (ts, step) order, the exact batch recurrence; keep the rest
          val (ready, pending0) = (prev.pending ++ incoming).partition(_._1 <= wmUs)
          var reached = prev.reached
          var last = prev.lastUs
          var seen = prev.seen
          val hits = List.newBuilder[FunnelStepHit]
          ready.sorted.foreach { case (t, si) =>
            // bot cap: only the cap time-earliest events fold — ready
            // events finalize in global (ts, step) order across batches,
            // so the running counter replays the batch cap exactly
            if (maxEventsPerUser.forall(seen < _)) {
              seen += 1
              val gapOk = maxGapUs.forall(g => reached == 0 || t <= last + g)
              if (si == reached && t > last && gapOk) {
                reached += 1
                last = t
                hits += FunnelStepHit(userId, reached, stepArr(si), toTs(t))
              }
            }
          }
          // capped pending buffer: at most the remaining cap budget of
          // TIME-EARLIEST not-yet-final events — later ones could never
          // fold, and a bot inside one watermark horizon stays O(cap)
          val pending = maxEventsPerUser match {
            case Some(cap) =>
              val budget = (cap - seen).max(0L).min(Int.MaxValue).toInt
              if (pending0.size <= budget) pending0
              else pending0.sorted.take(budget)
            case None => pending0
          }
          // completed users keep a TOMBSTONE (reached=k, Nil, no timeout)
          // instead of evicting: a late step-1 event after completion
          // folds against reached=k and is rejected — exactly the batch
          // fold — where removed state would restart the funnel and
          // over-count every step downstream
          state.update(FunnelState(pending, reached, last, seen))
          // drain guarantee: wake when the watermark passes the newest
          // buffered event, even if the user never sends another one
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).max / 1000L + 1L)
          hits.result().iterator
      }
  }

  /** Continuous upsert of a stream into a versioned store table: each
    * micro-batch routes through the bucket-pruned
    * [[graft.store.TableStore.merge]] (the foreachBatch-merge pattern
    * Delta calls streaming MERGE). End-to-end exactly-once on replay
    * comes from merge idempotence: re-merging a batch of (key, values)
    * leaves the table unchanged (MergeSpec property), so a crash between
    * the store commit and the checkpoint advance is safe.
    *
    * Scale: per-tick cost is the merge's O(batch + touchedBuckets) —
    * independent of table size; state is only the file-source/offset
    * checkpoint. */
  def mergeSink(stream: DataFrame, store: graft.store.TableStore, table: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.merge(table, batch)
      }
      .start()

  /** The streaming incremental-ingest loop: per micro-batch, the arriving
    * documents are near-dup-deduplicated against the LIVE corpus table
    * (and against earlier ids within the batch) via
    * [[graft.ops.Dedup.incrementalNearDupFilter]], and the survivors
    * merge in — so the corpus that batch N+1 dedups against already
    * contains batch N's survivors. `store.read` inside foreachBatch
    * re-resolves the manifest every tick (a fresh MVCC snapshot), which
    * is exactly the read-your-own-writes loop a continuous ingestion
    * pipeline needs.
    *
    * Exactly-once on replay: a replayed batch's rows either match
    * themselves in the corpus (same id — dropped by the corpus-partner
    * rule, nothing re-merges) or merge idempotently on their keys.
    *
    * Scale: per-tick cost is the incremental filter's O(batch + touched
    * buckets) candidate work + the bucket-pruned merge — never a
    * corpus×corpus pass; at production scale the corpus signature pass
    * is served from a precomputed signature table (see the op's note). */
  def dedupIngestSink(stream: DataFrame, store: graft.store.TableStore,
      table: String, checkpoint: String, idCol: String, textCol: String,
      minJaccard: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val survivors = graft.ops.Dedup.incrementalNearDupFilter(
            store.read(table), batch, idCol, textCol, minJaccard)
          if (!survivors.isEmpty) store.merge(table, survivors)
        }
      }
      .start()
}
