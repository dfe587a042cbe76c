package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Physical-plan guards: the optimizer wins we rely on at scale must not
  * silently regress (broadcast dims, scan pruning, filter pushdown,
  * partial aggregation). */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("fact rebuild broadcasts dims and prunes the fact scan") {
    val p = plan("s6_fact_rebuild")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), "no fact-side shuffle join expected")
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      s"lineitem scan must prune unused columns, got $readSchema")
  }

  test("shipping priority (h3): semi-join filter, pushed dates, bounded top-k") {
    val p = plan("h3_shipping_priority")
    assert(p.contains("LeftSemi"),
      "the customer segment filter must cut in as a semi join (no customer column survives)")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "the filtered customer key set must broadcast")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThan(l_shipdate") || p.contains("l_shipdate)")),
      "the ship-date filter must reach the lineitem scan")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must be a bounded TakeOrdered, never a global sort")
    assert(p.contains("partial_sum"), "revenue must aggregate map-side")
  }

  test("region volume (h5): dims broadcast, no cartesian, two-phase agg") {
    val p = plan("h5_region_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "region→nation→supplier must broadcast onto the fact scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "all six tables meet on equi-keys")
    assert(p.contains("partial_sum"), "revenue must aggregate map-side")
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).get.group(1)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"lineitem scan must prune to the join/measure columns, got $readSchema")
  }

  test("small-qty revenue (h17): decorrelated avg behind a broadcast semi join") {
    val p = plan("h17_small_qty_revenue")
    assert(p.contains("LeftSemi"),
      "the brand's part keys must restrict lineitem via semi join before any aggregate")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "the bounded part-key set must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the avg joins back on the part key — no unkeyed join")
    assert(p.contains("partial_sum"), "both aggregates must be two-phase")
  }

  test("large orders (h18): aggregate-as-filter precedes the joins, bounded top-k") {
    val p = plan("h18_large_orders")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be a bounded TakeOrdered, never a global sort")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "orders and customer join the qualifying keys on equi-keys")
    assert(p.contains("partial_sum"),
      "the HAVING aggregate must combine map-side before its shuffle")
  }

  test("q1 aggregation is two-phase (map-side partials)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "expected partial aggregation before the exchange")
  }

  test("IN-list filter is pushed to the parquet scan") {
    val p = plan("p5_filter_in")
    assert(p.contains("PushedFilters") && p.contains("In(o_orderpriority"),
      "IN filter should reach the scan")
  }

  test("IN-subquery becomes a semi join, not a cartesian") {
    val p = plan("p6_in_subquery")
    assert(p.contains("LeftSemi"), "expected a left-semi join")
  }

  test("native expressions appear in hash-heavy plans") {
    assert(plan("d1_exact_dedup").contains("graft_phash"))
    assert(plan("n1_ann_topk").contains("graft_dot"))
  }

  test("SCD2 executes its full-outer join exactly once (exploded branches)") {
    val p = plan("j12_scd2")
    assert("FullOuter".r.findAllIn(p).size <= 2, // formatted plan lists a node twice (tree + detail)
      "branch emission must not re-execute the join per union arm")
    assert(p.contains("Generate") && p.contains("explode"),
      "expected the exploded-branch shape")
  }

  test("decontamination is a hash semi-join, no cartesian or pairwise scan") {
    val p = plan("d6_decontam")
    assert(p.contains("LeftSemi"), "expected a semi join on the gram hash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no pairwise document comparison expected")
  }

  test("chunking plan has no shuffle (pure map stage)") {
    val p = plan("e11_chunking")
    // the only exchange allowed is the final presentation sort
    val shuffles = "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(p).size
    assert(shuffles == 0, s"chunking must not hash-shuffle, found $shuffles:\n$p")
  }

  test("chunking tokenizes each document exactly once (no per-chunk re-split)") {
    val p = SparkEntry.queries("e11_chunking")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(p).size
    assert(splits == 1,
      s"expected ONE tokenizer in the optimized chunk plan (O(T) per doc), got $splits:\n$p")
  }

  test("bloom decontamination probes via the native expression, not a ScalaUDF") {
    val p = plan("d7_bloom_decontam")
    assert(p.contains("graft_bloom_contains"),
      "expected the native codegen'd bloom probe in the corpus-side filter")
    assert(!p.contains("ScalaUDF"),
      "the 100 TB-side probe must not break whole-stage codegen with a UDF")
  }

  test("repetition metrics are per-doc hash aggs with partials, nothing corpus-global") {
    val p = plan("e14_repetition")
    assert(p.contains("partial_count") || p.contains("partial_max") || p.contains("partial_sum"),
      "gram counting should be two-phase")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no pairwise scan expected")
  }

  test("sequence packing windows per source shard, never a single global partition") {
    val p = plan("e15_seq_pack")
    assert(p.contains("Window"), "expected a window node")
    // the running-sum window must be keyed on source; a global cumsum
    // would appear as an empty partition spec (single-partition sort)
    assert("windowspecdefinition\\(source".r.findFirstIn(p.toLowerCase.replace("#", "")).isDefined
      || p.contains("partitionBy=[source"),
      s"window must partition by source:\n${p.linesIterator.filter(_.contains("Window")).mkString("\n")}")
  }

  test("contamination matrix joins on the gram hash, never document-pairwise") {
    val p = plan("d8_contamination_matrix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair join must be hash-keyed on the gram hash")
  }

  test("incremental agg merges partials without re-aggregating the base") {
    val p = plan("s10_incremental_agg")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "delta aggregation should be two-phase")
    assert(!p.contains("CartesianProduct"))
  }

  test("unigram surprise broadcasts the vocabulary — corpus scan never shuffles on token") {
    val p = plan("e16_unigram_bits")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "vocab must broadcast to the scoring join")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no shuffle join on the token column expected")
    assert(p.contains("partial_count"),
      "token counting must be two-phase (map-side partials absorb stopword skew)")
  }

  test("duplicated spans: hash-keyed flag join, no cartesian, native gram hash") {
    val p = plan("d9_dup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "flagging must equi-join on the gram hash")
    assert(p.contains("graft_phash"), "gram hashing must use the native expression")
  }

  test("bigram surprise broadcasts both model tables; pair formation is map-side") {
    val p = plan("e18_bigram_bits")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "bigram table and unigram backoff vocab must both broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus-side rows must never shuffle on token content")
    assert(p.contains("partial_count"),
      "gram counting must be two-phase (map-side partials)")
  }

  test("kmeans assignment unrolls to native l2 distances, no interpreted fold") {
    val p = plan("n8_cluster_sample")
    assert(p.contains("graft_l2sq"),
      "per-row centroid distances must be the codegen'd native expression")
    assert(!p.contains("zip_with"),
      "the interpreted zip_with/aggregate fold must be gone from assignment")
  }

  test("epoch mix: one per-source window, generator-bounded epochs, no cartesian") {
    val p = plan("e21_epoch_mix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "totals join on the source key")
    assert("Window".r.findAllIn(p).size >= 1 && p.contains("Generate"),
      "within-epoch cum is a window; epochs come from a bounded generator")
  }

  test("agg sampler: bounded native top-k heap, no per-stratum window sort") {
    val p = plan("e19_sample_agg")
    assert(p.contains("graft_topk_min"), "must aggregate with the native bounded heap")
    assert(p.contains("partial_graft_topk_min"),
      "map-side partial aggregation expected (per-partition state is O(k))")
    assert(!p.contains("Window"), "the window form's full stratum sort must be gone")
  }

  test("PQ: native l2 only on the broadcast query side, no interpreted folds") {
    val p = plan("n10_ann_pq")
    assert(p.contains("graft_l2sq"), "ADC tables must use the native expression")
    assert(!p.contains("zip_with"), "no interpreted distance folds anywhere")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the query side (ids + ADC tables) must broadcast")
  }

  test("pagerank: hash-keyed joins only, no cartesian in the iteration chain") {
    val p = plan("g1_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "score propagation must equi-join on node ids")
    // 3 iterations × (edges⋈scores + ⋈deg) = 6 equi-joins must be visible —
    // the returned frame is lazy by contract so this chain stays guardable
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).size >= 6,
      "expected the iters-deep hash-join chain in the returned plan")
    // the candidate pair derivation is checkpointed ONCE up front: every
    // edge/deg reference must re-scan those blocks, not re-run the LSH
    assert(p.contains("ExistingRDD"),
      "expected the eagerly-checkpointed pair list as the plan root")
  }

  test("hybrid RRF: no corpus-sized shuffle joins downstream of the two rankers") {
    val p = plan("r2_hybrid_rrf")
    assert(!p.contains("CartesianProduct"),
      "fusion is a union of bounded top-k lists, never a cross join")
    // the BM25 posting joins are term-keyed; the ANN query side broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "the bounded query/top-k sides must broadcast")
  }

  test("NB classifier: model broadcasts, counting is two-phase, no cartesian") {
    val p = plan("e24_nb_classify")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "the vocabulary-bounded model must broadcast to the token scan")
    assert(!p.contains("CartesianProduct"),
      "the per-class fan-out is a bounded broadcast, never a cartesian")
    assert(p.contains("partial_count"),
      "token counting must be two-phase (map-side partials)")
  }

  test("DSIR: both bucket models broadcast; the cut is bounded, not a global sort") {
    val p = plan("e25_dsir_select")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "target and raw bucket models must both broadcast to the scoring scan")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the raw-pool scan must never shuffle on bucket content")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-k selection must be a bounded TakeOrdered, never a global sort")
  }

  test("composed prep pipeline: every prune set broadcasts end to end") {
    val p = plan("c1_prep_pipeline")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "quality gate, dedup reps, decontam hits must all broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no corpus-sized shuffle join anywhere in the chain")
  }

  test("temperature mix: same single per-source window as e17, budgets driver-derived") {
    val p = plan("e28_temperature_mix")
    // tokenBudgetMix windows on its internal `src` projection
    assert("windowspecdefinition\\(src".r.findFirstIn(p.toLowerCase.replace("#", "")).isDefined
      || p.contains("partitionBy=[src"),
      "the running cut must window per source, never globally sort")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the derived budgets are literals — no join may appear in the mix plan")
  }

  test("kNN graph: mutual filter is a hash semi join over the bounded directed set") {
    val p = plan("n12_knn_graph")
    // the all-pairs scoring + per-node top-k window materialize ONCE
    // into the store-backed knn_truth ARTIFACT (n·k rows of committed
    // parquet) — the returned plan must be a hash-keyed reciprocal semi
    // join over that artifact scan, never a re-run of the scoring chain
    // per reference (no window rank, no vector dot anywhere in the plan)
    assert(p.contains("Scan parquet") && !p.contains("Window")
      && !p.contains("graft_dot"),
      "expected the persisted directed top-k as a parquet artifact scan")
    assert(p.contains("LeftSemi"), "mutual filter = left-semi on the swapped keys")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the reciprocal join is equi-keyed on (id, nbr) — no unkeyed join in the result plan")
  }

  test("incremental dedup: checkpointed bounded drop set, anti-join streams the batch") {
    val p = plan("d13_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the survivor filter must be an id equi-join")
    // the dropped-id set (bounded by the batch) is derived eagerly with a
    // localCheckpoint — the returned plan must anti-join the batch scan
    // against those blocks, never re-run the LSH chain per sink
    assert(p.contains("ExistingRDD"),
      "expected the eagerly-materialized dropped-id set as a checkpoint scan")
    assert(p.contains("LeftAnti"), "survivors = batch anti-join dropped ids")
  }

  test("curriculum: global rank never funnels through one partition") {
    // SCOPE: SurrogateKey.attach rebuilds the frame via
    // createDataFrame(rdd, schema), so everything upstream of the rank
    // hides behind a Scan ExistingRDD in the registered query's plan —
    // these two asserts only cover the post-rank join/agg stages.
    val p = plan("e32_curriculum")
    assert(!p.contains("Window"), "no window rank expected post-rank")
    assert(!p.contains("SinglePartition"),
      "no single-partition stage expected post-rank")
    // The load-bearing guard runs where the lineage IS visible: the
    // pre-attach sorted frame (exactly what curriculum() hands to
    // zipWithIndex) must be a distributed RANGE-partitioned sort — never
    // a row_number window, never a single-partition funnel.
    val docs = graft.Tables.load(spark, dir, "documents")
    val pre = graft.ops.CorpusOps.unigramBits(docs, "doc_id", "text", 5000)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_tokens"),
        org.apache.spark.sql.functions.col("bits_per_token"))
      .orderBy("bits_per_token", "doc_id")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(pre.contains("rangepartitioning"),
      "the global rank order must come from a range-partitioned sort")
    assert(!pre.contains("Window"), "no window rank in the scoring+sort lineage")
    // the only allowed single-partition stage is unigramBits' ONE-ROW
    // corpus-total token count (broadcast back into the scoring join)
    assert("Arguments: SinglePartition".r.findAllIn(pre).size <= 1,
      "only the scalar corpus-total agg may single-partition")
  }

  test("curation pipeline: semi-join retention cut, distributed rank, no global window") {
    // post-rank stages (same ExistingRDD scope limit as e32's guard)
    val p = plan("c2_curation_pipeline")
    assert(!p.contains("Window"), "no window rank expected post-rank")
    assert(!p.contains("SinglePartition"),
      "no single-partition stage expected post-rank")
    // pre-attach lineage, where retention → semi-join → scoring → sort
    // is actually visible: the kept set must cut in as an id-keyed
    // LEFT-SEMI (the kept set is ~30% of the corpus — never broadcast
    // material, never an unkeyed join), the retention window stays
    // lang-partitioned, and the global difficulty order comes from a
    // range-partitioned sort, not a window or single-partition funnel.
    val F = org.apache.spark.sql.functions
    val docs = graft.Tables.load(spark, dir, "documents")
    val kept = graft.ops.CorpusOps
      .qualityRetention(docs, "doc_id", "text", "lang", 0.3)
      .select("doc_id")
    val retained = docs.join(kept, Seq("doc_id"), "left_semi")
    val pre = graft.ops.CorpusOps.unigramBits(retained, "doc_id", "text", 5000)
      .select(F.col("doc_id"), F.col("n_tokens"), F.col("bits_per_token"))
      .orderBy("bits_per_token", "doc_id")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(pre.contains("LeftSemi"), "retention cut = doc-id left-semi join")
    // unigramBits broadcasts its ONE-ROW corpus total as a Cross
    // BuildRight nested-loop — the only unkeyed join the plan may carry
    assert(!pre.contains("CartesianProduct"),
      "the retention cut must stay an id equi-join")
    assert(!"BroadcastNestedLoopJoin (?!Cross BuildRight)".r.findAllIn(pre).hasNext,
      "any nested-loop join must be the scalar corpus-total broadcast")
    assert("windowspecdefinition\\(lang".r
        .findFirstIn(pre.toLowerCase.replace("#", "")).isDefined
      || pre.contains("partitionBy=[lang"),
      "the retention percent_rank must partition by lang")
    assert(pre.contains("rangepartitioning"),
      "the global rank order must come from a range-partitioned sort")
    assert("Arguments: SinglePartition".r.findAllIn(pre).size <= 1,
      "only the scalar corpus-total agg may single-partition")
  }

  test("hard negatives: candidate-bounded cosine, no corpus-wide vector join") {
    val p = plan("r4_hard_negatives")
    // the cosine joins must be id equi-joins against the lexical
    // candidate set — never an unkeyed pass over the embedding table;
    // BM25's ONE-ROW corpus-scalar broadcast (Cross BuildRight) is the
    // only unkeyed join allowed
    assert(!p.contains("CartesianProduct"),
      "cosine is computed per candidate via id equi-joins only")
    assert(!"BroadcastNestedLoopJoin (?!Cross BuildRight)".r.findAllIn(p).hasNext,
      "any nested-loop join must be the scalar corpus-stats broadcast")
    assert(p.contains("LeftSemi") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "expected hash-keyed joins for the embedding lookups")
  }

  test("anomaly windows: two agg passes + broadcast stats join, no window fn") {
    val p = plan("st3_anomaly")
    assert(!p.contains("Window"), "moments come from aggregates, not window fns")
    assert(p.contains("BroadcastHashJoin"),
      "the per-type stats (5 rows) must broadcast back onto the windows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "stats join is keyed on event_type")
  }

  test("quality retention: one language-keyed window, no global sort before it") {
    val p = plan("e31_quality_retention")
    assert("windowspecdefinition\\(lang".r.findFirstIn(p.toLowerCase.replace("#", "")).isDefined
      || p.contains("partitionBy=[lang"),
      s"percent_rank must partition by lang:\n${p.linesIterator.filter(_.contains("Window")).mkString("\n")}")
    // the score+rank pipeline needs exactly two exchanges: the lang hash
    // partitioning and the final presentation sort — nothing corpus-global
    // (FormattedMode prints exchange args on their own "Arguments:" line)
    val ex = "Arguments: hashpartitioning\\(lang".r.findAllIn(p).size
    val range = "Arguments: rangepartitioning".r.findAllIn(p).size
    assert(ex == 1 && range == 1,
      s"expected 1 lang-hash + 1 range exchange, got hash=$ex range=$range")
    assert(!p.contains("SinglePartition"), "no corpus-global single partition")
  }

  test("edit verify: candidate-bounded DP via the built-in, id equi-joins only") {
    // the public op materializes its bounded report eagerly (the ORDER
    // BY range-sampling guard), which cuts the returned frame's lineage —
    // assert on the lazy plan the op runs, via the private[graft] seam
    val docs = graft.Tables.load(spark, dir, "documents")
    val sh = graft.ops.Dedup.shingleRows(docs, "doc_id", "text", shingleN = 2)
    val p = graft.ops.Dedup.lshEditVerifiedPlan(docs, sh, "doc_id", "text",
        minSim = 0.3, prefixLen = 256, k = 16, bands = 8,
        maxBucketSize = Some(8), minEst = 0.25)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("levenshtein"),
      "the DP must be the codegen'd built-in, not a UDF")
    assert(!p.contains("ScalaUDF"), "no UDF anywhere in the verify path")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "texts attach to candidates by id equi-joins — never an unkeyed pair scan")
    // the candidate CHAIN is materialized out of the plan above — pin its
    // shapes separately (this is the shared chain under d2/d4b/d19/d20):
    // two-phase min() signatures, band/bucket equi-self-join, no UDF
    val pc = graft.ops.Dedup.minhashCandidates(sh, 16, 8, Some(8))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(pc.contains("partial_min"),
      "signature minima must aggregate map-side")
    assert(!pc.contains("ScalaUDF"), "no UDF in the LSH candidate chain")
    assert(!pc.contains("CartesianProduct") && !pc.contains("BroadcastNestedLoopJoin"),
      "the bucket self-join must stay an equi-join on (band, bucket)")
  }

  test("ngram novelty: gram-hash keyed join, two-phase aggs, nothing pairwise") {
    val p = plan("e34_ngram_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "first-owner attachment must equi-join on the gram hash")
    assert(p.contains("partial_min"),
      "min-owner must aggregate map-side before the gram shuffle")
    assert(p.contains("graft_phash"), "gram hashing must use the native expression")
  }

  test("label propagation: scores only against the seed side, vote is windowed per target") {
    val p = plan("n14_label_prop")
    // the scoring join is targets × SEEDS (the evaluation form's
    // broadcast-NL by design); the vote must stay a bounded per-target
    // window + hash agg, and the truth flag a vec_id equi-join
    assert(!p.contains("ScalaUDF"), "no UDF in the scoring or vote path")
    assert(p.contains("graft_dot"), "cosine must use the native expression")
    assert("SortMergeJoin|BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      "the truth-label attachment must be an equi-join")
  }

  test("corpus health: every branch reduces before the source-key joins") {
    val p = plan("a12_corpus_health")
    assert(!p.contains("CartesianProduct"),
      "the three report branches meet on the source key, never unkeyed")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "per-source reductions must aggregate map-side")
  }

  test("source divergence: bounded model tables broadcast, corpus never re-shuffles on token") {
    val p = plan("a11_source_divergence")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "vocabulary and per-source totals must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join on the (source, token) stream expected")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "token counting must be two-phase (map-side partials)")
  }

  test("triangle counting is equi-joined wedge enumeration, never cartesian") {
    val p = plan("g6_knn_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "wedge enumeration must join on node ids only (the exact-kNN scoring " +
        "inside the memoized edge input is the one documented NL site and is " +
        "materialized before this plan)")
    assert(p.contains("partial_count"),
      "corner and degree counts must aggregate map-side")
  }

  test("funnel: one user-keyed aggregation, no joins, step count adds no exchanges") {
    val p = plan("st4_funnel")
    // the single-pass form: ONE user-keyed aggregation computes the
    // whole chain — no join of any kind may appear, and step count must
    // not add exchanges (the round-12 join-chain re-shuffled the reach
    // set k−1 times)
    assert(!p.contains("Join"),
      "the funnel chain is one fold per user — no join anywhere in the plan")
    assert("Arguments: hashpartitioning\\(u".r.findAllIn(p).size == 1,
      "exactly ONE user-keyed exchange regardless of step count")
    assert(!p.contains("ScalaUDF"),
      "the chain fold is a codegen'd aggregate expression, not a UDF")
    assert(p.contains("Expand"),
      "the one-row count frame must melt via unpivot's Expand, not a join union")
  }

  test("event paths: bounded-heap top-k aggregate, never a full-history collect") {
    val p = plan("st6_event_paths")
    assert(p.contains("graft_topk_min"),
      "per-user journeys must aggregate through the bounded-heap top-k " +
        "(O(depth) state per user — a bot's full history must never buffer)")
    assert(!p.contains("collect_list"),
      "the collect_list+slice form buffers each user's whole history")
    assert(p.contains("ObjectHashAggregate"),
      "the typed-imperative aggregate should run in the object hash operator")
    assert(p.contains("TakeOrderedAndProject"),
      "top-N paths must be a bounded TakeOrdered, never a global sort")
  }

  test("cohort retention: activity dedups before any join") {
    val p = plan("st5_cohorts")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cells and sizes meet on the cohort key, never unkeyed")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "the (user, week) dedup and cohort min must be two-phase")
  }

  test("transitions: window pair formation over a spillable sort, no per-user array") {
    val p = plan("st7_transitions")
    assert(p.contains("Window") && p.contains("lead"),
      "pairs must form via a lead window (spillable sort)")
    assert(!p.contains("collect_list"),
      "no per-user history may buffer in an aggregation array")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "the per-from totals must broadcast onto the counts")
  }

  test("DAU/MAU: exact dedups once; HLL twin aggregates sketches, never user sets") {
    val pe = plan("st8_dau_mau")
    assert(pe.contains("partial_count") || pe.contains("HashAggregate"),
      "DAU/MAU counts must aggregate two-phase")
    val ph = plan("st8b_dau_mau_hll")
    assert(ph.contains("hll_sketch_agg") && ph.contains("hll_union_agg"),
      "the sketch branch must build per-day sketches and union them")
    assert(ph.contains("partial_hll_sketch_agg") || ph.contains("partial hll") ||
      "partial.*hll".r.findFirstIn(ph).isDefined,
      s"daily sketches must combine map-side (mergeable partials)")
    assert(!ph.contains("CartesianProduct"),
      "the window expansion is an explode, never a join")
  }

  test("unpivot lowers to one Expand over the aggregated frame, no join") {
    val p = plan("a13_unpivot")
    assert(p.contains("Expand"), "Dataset.unpivot must lower to an Expand node")
    assert(!p.contains("Join"), "the melt must not be expressed as a join/union of scans")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "the wide aggregate must still be two-phase")
    // exactly the agg's shuffle + the final sort's range exchange — the
    // Expand itself must not add one (FormattedMode prints each node
    // once in the tree and once as a "(n) Exchange" detail header)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 2,
      "Expand must run in place over the aggregated frame, not re-shuffle")
  }
}
