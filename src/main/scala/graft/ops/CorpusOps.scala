package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalytics => TA}
import graft.spark.Materialize.MaterializeOps

/** Corpus-preparation operators a training-data pipeline runs between
  * ingestion and training: chunking long documents into token windows,
  * decontaminating against a benchmark set, and deterministic stratified
  * sampling for mixture control.
  */
object CorpusOps {


  /** Split each document into overlapping token-window chunks:
    * chunk i covers tokens [i·(size−overlap), i·(size−overlap)+size).
    * Returns (idCol, chunk_id, chunk_text, n_tokens).
    *
    * Scale: pure map stage — tokenize + per-chunk slice/join, no shuffle;
    * a doc with T tokens emits ⌈max(1, T−overlap)/(size−overlap)⌉ rows.
    * The token array is MATERIALIZED ONCE per document behind a
    * projection boundary and the per-chunk lambda only slices the
    * attribute — O(T) tokenizer work per doc, not O(T·chunks). The
    * boundary survives optimization because the alias is referenced more
    * than once (chunk count + slice + token count), which blocks
    * CollapseProject from inlining the split back into the lambda
    * (PlanSpec asserts the optimized plan tokenizes exactly once).
    * `n_tokens` is derived arithmetically from the slice bounds (equal to
    * the slice length by construction), not by re-tokenizing the joined
    * chunk text. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0")
    val F = org.apache.spark.sql.functions // `size` param shadows functions.size
    val step = size - overlap
    val tk = col("__tk")
    val nChunks = greatest(lit(1L),
      ceil((F.size(tk).cast("long") - overlap).cast("double") / step).cast("long"))
    df.select(col(idCol), TA.tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), nChunks - 1), i =>
          struct(
            concat_ws(" ", slice(tk, (i * step + 1).cast("int"), lit(size))).as("chunk_text"),
            greatest(lit(0L), least(lit(size.toLong),
              F.size(tk).cast("long") - i * step)).as("n_tokens")))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col.chunk_text").as("chunk_text"),
        col("col.n_tokens").as("n_tokens"))
  }

  /** Flag corpus documents sharing any token n-gram with a benchmark set
    * (test-set decontamination). Self-pairs (same id in both sets) are
    * ignored. Returns the corpus with a `contaminated` flag.
    *
    * Scale: both sides reduce to (id, ngramHash) ROWS (one explode +
    * composed rolling hashes — no O(T²) re-tokenization, see
    * [[Dedup.shingleHashRows]]); the flag is one left-semi join on the
    * hash — the classic n-gram-overlap decontamination (GPT-3 used 13-
    * grams) with no pairwise document comparison anywhere. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int,
      portable: Boolean = true): DataFrame = {
    val corpusGrams = Dedup.shingleHashRows(corpus, idCol, textCol, n, portable = portable)
    // rename the benchmark side so the hash join resolves unambiguously
    // even when corpus and benchmark derive from the same relation
    val benchGrams = Dedup.shingleHashRows(benchmark, idCol, textCol, n, portable = portable)
      .select(col("id").as("__bench_id"), col("h").as("__bench_h"))
    val hits = corpusGrams
      .join(benchGrams, col("h") === col("__bench_h")
        && col("id") =!= col("__bench_id"), "left_semi")
      .select(col("id").as("__hit_id")).distinct().withColumn("__hit", lit(true))
    corpus
      .join(hits, col(idCol) === col("__hit_id"), "left_outer")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit_id", "__hit")
  }

  /** [[decontaminate]] with a Bloom-filter pre-prune — the 100 TB path.
    * The benchmark side's gram hashes build a Bloom filter (driver-side,
    * bounded by the BENCHMARK's size — benchmarks are MBs while the
    * corpus is TBs), which broadcasts to every task and prunes the
    * corpus gram rows map-side BEFORE the exact semi-join. The join's
    * left side shrinks from O(corpus grams) to O(true hits + fp·corpus),
    * so at fpp = 1% the shuffle practically disappears; Bloom filters
    * have NO false negatives and the exact join removes the false
    * positives, so the result is IDENTICAL to [[decontaminate]] — the
    * oracle-checked query asserts exactly that. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, fpp: Double = 0.01,
      portable: Boolean = true): DataFrame = {
    val corpusGrams = Dedup.shingleHashRows(corpus, idCol, textCol, n, portable = portable)
    // cached for the two EAGER driver-side consumers (count + bloom
    // build), then released before returning: the lazy exact-verify join
    // below re-derives the bench grams from source instead — one extra
    // tokenize of the deliberately-MB-scale benchmark side buys an op
    // that leaves no cache entry behind (caches pinned past the op are
    // the 100 TB session killer; see [[Similarity.kmeansCentroids]] for
    // the same persist→consume→unpersist contract).
    val benchGrams = Dedup.shingleHashRows(benchmark, idCol, textCol, n, portable = portable)
      .select(col("id").as("__bench_id"), col("h").as("__bench_h"))
      .persist()
    val nGrams = benchGrams.count() // one job over the SMALL side only
    val bloom = benchGrams.stat.bloomFilter("__bench_h", math.max(1L, nGrams), fpp)
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    benchGrams.unpersist(blocking = false) // the verify join recomputes it
    // native codegen'd probe (graft.spark.BloomContains) — the filter runs
    // map-side precisely to AVOID the shuffle a join-based formulation
    // would cost, and staying out of ScalaUDF keeps the scan stage inside
    // whole-stage codegen (the engine's own standard for hot paths)
    val candidates = corpusGrams.filter(
      call_function("graft_bloom_contains", lit(bloomBytes), col("h")))
    val hits = candidates
      .join(benchGrams, col("h") === col("__bench_h")
        && col("id") =!= col("__bench_id"), "left_semi")
      .select(col("id").as("__hit_id")).distinct().withColumn("__hit", lit(true))
    corpus
      .join(hits, col(idCol) === col("__hit_id"), "left_outer")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit_id", "__hit")
  }

  /** Gopher-style per-document repetition metrics (Rae et al. 2021
    * §A1.1): the fraction of the text covered by the single most
    * frequent word 2-gram (`top2_frac`) and the fraction of 5-gram
    * occurrences that are duplicates (`dup5_frac`), plus a `repetitive`
    * flag at the given thresholds. Documents with < 5 tokens are
    * dropped (no 5-gram exists). Returns
    * (idCol, top2_n, top2_frac, dup5_frac, repetitive).
    *
    * Scale: one shuffle on the id for the gram windows, then (id, gram)
    * hash aggregations with map-side partials — nothing corpus-global.
    * All counts are integers with one exactly-rounded double division
    * each, so results are bit-stable across engines. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      top2Threshold: Double = 0.18, dup5Threshold: Double = 0.3): DataFrame = {
    val toks = df.select(col(idCol), posexplode(TA.tokens(col(textCol))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
    val wd = Window.partitionBy(idCol).orderBy("p")
    val grams = toks
      .withColumn("t1", lead(col("tok"), 1).over(wd))
      .withColumn("t2", lead(col("tok"), 2).over(wd))
      .withColumn("t3", lead(col("tok"), 3).over(wd))
      .withColumn("t4", lead(col("tok"), 4).over(wd))
    val a2 = grams.filter(col("t1").isNotNull)
      .select(col(idCol), concat_ws(" ", col("tok"), col("t1")).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("n"))
      .groupBy(idCol).agg(max("n").as("top2_n"), sum("n").as("n2"))
    val a5 = grams.filter(col("t4").isNotNull)
      .select(col(idCol),
        concat_ws(" ", col("tok"), col("t1"), col("t2"), col("t3"), col("t4")).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("n"))
      .groupBy(idCol).agg(sum("n").as("n5"), count(lit(1)).as("d5"))
    val top2Frac = col("top2_n").cast("double") / col("n2").cast("double")
    val dup5Frac = (col("n5") - col("d5")).cast("double") / col("n5").cast("double")
    a2.join(a5, idCol) // inner: keeps docs with >= 5 tokens
      .select(col(idCol), col("top2_n"),
        top2Frac.as("top2_frac"), dup5Frac.as("dup5_frac"),
        (top2Frac > top2Threshold || dup5Frac > dup5Threshold).as("repetitive"))
  }

  /** LM sequence packing, GPT-style concat-then-chunk: documents are
    * concatenated in id order WITHIN their shard and cut into fixed
    * `blockTokens`-token blocks; each document reports the [start_block,
    * end_block] span it lands in. Returns
    * (idCol, shardCol, n_tokens, start_block, end_block).
    *
    * Scale: the running token total is a window sum PER SHARD — never a
    * global single-partition sort; a 100 TB corpus packs each shard
    * independently, exactly how training shards are built. */
  def packSequences(df: DataFrame, idCol: String, shardCol: String,
      textCol: String, blockTokens: Int = 512): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    df.select(col(idCol), col(shardCol),
        size(TA.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        expr(s"(cum - n_tokens) DIV $blockTokens").as("start_block"),
        expr(s"(cum - 1) DIV $blockTokens").as("end_block"))
  }

  /** Deterministic stratified sample: keep the `k` rows of each stratum
    * with the smallest portable-hash of their id — a reproducible
    * pseudo-random pick with no RNG state (same result on any cluster
    * layout, and an oracle can recompute it).
    *
    * Scale: one shuffle on the strata columns + per-partition top-k sort;
    * for very hot strata swap the window for a bounded `min_by`-style
    * aggregation. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(TA.phash(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** [[stratifiedSample]]'s hot-strata scale path: the same deterministic
    * k-per-stratum pick computed with the native bounded top-k aggregate
    * (`graft_topk_min`) instead of a window. The window form SORTS each
    * stratum in full to keep k rows; this form keeps a k-element heap per
    * stratum with map-side partial aggregation, so per-stratum state is
    * O(k) on every executor and the shuffle carries ≤ k·partitions rows
    * per stratum — a 10⁹-row stratum never materializes or sorts.
    *
    * Identical output to [[stratifiedSample]] (same hash, same ordering):
    * hash ties resolve by the id rendered as a zero-padded string, which
    * for non-negative numeric ids equals numeric order. `pad` must cover
    * the widest id (default 20 digits = any uint64); set `pad = 0` for
    * string ids (plain byte order).
    *
    * The identical-output contract assumes NON-NULL, UNIQUE ids (the
    * normal shape of a primary-key column): the heap's update skips
    * null keys/payloads where the window form sorts NULL hashes first
    * and would keep them, and an id duplicated exactly at the k-boundary
    * is kept by `row_number` but rejected by the heap's strict-less
    * offer. Null/duplicate ids are a data bug upstream; dedup or filter
    * them before sampling.
    *
    * @return (strata..., idCol) — idCol cast back to its input type. */
  def stratifiedSampleAgg(df: DataFrame, strata: Seq[String], idCol: String,
      k: Int, pad: Int = 20): DataFrame = {
    val idType = df.schema(idCol).dataType
    val idStr = col(idCol).cast("string")
    // zero-padding assumes non-negative ids that FIT the pad: a '-' sign
    // or a wider id would silently sort wrong (lpad truncates), so both
    // fail loudly instead; use pad = 0 (plain byte order) for such ids
    val payload =
      if (pad > 0)
        when(length(idStr) > pad || idStr.startsWith("-"),
          raise_error(concat(lit(s"stratifiedSampleAgg: id does not fit pad=$pad "
            + "or is negative — use pad = 0: "), idStr)))
          .otherwise(lpad(idStr, pad, "0"))
      else idStr
    df.groupBy(strata.map(col): _*)
      .agg(call_function("graft_topk_min", TA.phash(idStr), payload, lit(k))
        .as("__picks"))
      .select(strata.map(col) :+ explode(col("__picks")).as("__p"): _*)
      .select(strata.map(col) :+ col("__p.payload").cast(idType).as(idCol): _*)
  }

  /** Token-budget data mixing — subsample each source to a target token
    * budget, the operation that turns raw per-source corpora into a
    * training mix at chosen ratios (web : books : code : …). Documents
    * are taken in the same deterministic pseudo-random order as
    * [[stratifiedSample]] (portable hash of the id — layout-independent,
    * no RNG state, oracle-replayable) until the source's budget is
    * reached; the document that crosses the boundary is kept, so every
    * budget > 0 yields at least one document.
    *
    * Scale: one tokenize-count map stage, one shuffle on the source for
    * the per-source running sum — the window is per-shard exactly like
    * [[packSequences]], never a global sort. Sources with no entry in
    * `budgets` pass through whole (defaultBudget).
    *
    * @return (idCol, sourceCol, n_tokens, cum_tokens) of kept docs;
    *   cum_tokens = running total within the source in pick order. */
  def tokenBudgetMix(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue): DataFrame =
    tokenBudgetMixWithCounts(
      df.select(col(idCol), col(sourceCol),
        size(TA.tokens(col(textCol))).cast("long").as("n_tokens")),
      idCol, sourceCol, budgets, defaultBudget)

  /** [[tokenBudgetMix]] over PRE-COMPUTED per-doc token counts
    * (idCol, sourceCol, n_tokens) — the form a composed pipeline uses
    * when an upstream quality/stats stage already tokenized every
    * document (r21, guide §2.4: [[TextStats.perDoc]]'s n_tokens is the
    * same exact integer, so re-tokenizing the corpus for the mix was a
    * full duplicate map pass). */
  def tokenBudgetMixWithCounts(df: DataFrame, idCol: String,
      sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue): DataFrame = {
    val n = df.select(col(idCol).as("id"), col(sourceCol).as("src"),
      col("n_tokens").cast("long").as("n_tokens"))
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col("src") === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy("src")
      .orderBy(TA.phash(col("id").cast("string")), col("id"))
    n.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select(col("id").as(idCol), col("src").as(sourceCol),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Temperature-based source mixing (the α-weighted sampling of
    * GPT-3 / T5 / multilingual-LM training mixes, Raffel et al. JMLR'20
    * §3.4.3 — public method): per-source budgets are DERIVED from the
    * corpus itself instead of hand-chosen — source i gets budget
    * B·cᵢ^α / Σⱼ cⱼ^α where cᵢ is its token count. α < 1 flattens the
    * natural distribution (upweights small sources, the reason the
    * trick exists); α = 1 is proportional sampling.
    *
    * This is the α = 1/2 point of the family, computed INTEGER-EXACTLY:
    * wᵢ = ⌊√cᵢ⌋ (IEEE sqrt is correctly rounded and cᵢ ≪ 2⁵², so both
    * engines floor to the same integer — a cross-engine `pow` would not
    * be bit-safe), budgetᵢ = ⌊B·wᵢ / Σwⱼ⌋ in pure Long arithmetic.
    * Document pick order within a source is the same deterministic
    * portable-hash order as [[tokenBudgetMix]], which this composes.
    *
    * Scale: one map-side-combine count aggregate (bounded by #sources,
    * collected like [[graft.ops.Similarity.kmeansCentroids]]'s model
    * state), then [[tokenBudgetMix]]'s single per-source window — the
    * corpus is scanned twice (count pass + mix pass), never globally
    * sorted.
    *
    * @return (idCol, sourceCol, n_tokens, cum_tokens, budget) of kept
    *   docs — `budget` is the derived per-source cut for auditability. */
  def temperatureMix(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    val counts = df
      .select(col(sourceCol).as("src"), size(TA.tokens(col(textCol))).cast("long").as("n"))
      .groupBy("src").agg(sum("n").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val weights = counts.map { case (s, c) => (s, math.floor(math.sqrt(c.toDouble)).toLong) }
    val wTotal = weights.map(_._2).sum
    require(wTotal > 0, "temperatureMix: corpus has no tokens")
    val budgets = weights.map { case (s, w) => (s, totalBudget * w / wTotal) }.toMap
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    tokenBudgetMix(df, idCol, textCol, sourceCol, budgets, defaultBudget = 0L)
      .withColumn("budget", budgetCol)
  }

  /** Deterministic corpus shuffle + shard assignment — the training-order
    * step between mixing and sequence packing: a LLM data loader wants
    * documents in a fixed pseudo-random order, split into n equal-ish
    * shards it can stream independently. Both coordinates derive from ONE
    * portable hash h = phash("shuf|" + id): shard = h mod nShards
    * (append-stable membership, like [[hashSplit]]), position =
    * row_number within the shard ordered by (h, id) — the same
    * deterministic pseudo-random order [[stratifiedSample]] picks in, so
    * the "shuffle" needs no RNG state and replays identically on any
    * layout or engine.
    *
    * Scale: a pure map for the shard, one PER-SHARD window for the
    * position — never a global sort; the shard column is the natural
    * write-partition key, and downstream packing ([[packSequences]])
    * windows over the same shards.
    *
    * @return input columns + (shard, pos); pos is 1-based within shard. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = TA.phash(concat(lit("shuf|"), col(idCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Deterministic hash train/val/test split — membership as a PURE
    * FUNCTION of the id (stable across reruns, machines, data order and
    * appends; no RNG state, no global sort): bucket =
    * phash("split|" + id) mod Σweights, mapped through the cumulative
    * weight ranges in `splits` order. Stratification comes free: a
    * uniform hash splits every subpopulation (source, language) at the
    * same ratios in expectation, and a doc can never migrate between
    * splits as the corpus grows — the property that keeps eval sets
    * uncontaminated across corpus versions.
    *
    * Scale: a pure map, zero shuffles; the split column is a
    * partition-friendly key for downstream writes.
    *
    * @param splits ordered (name, weight), weights positive — default
    *   the classic 80/10/10. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq(("train", 8), ("val", 1), ("test", 1))): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "hashSplit weights must be positive")
    val total = splits.map(_._2).sum.toLong
    val bucket = pmod(TA.phash(concat(lit("split|"), col(idCol).cast("string"))), lit(total))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cum).tail.foldLeft(
      when(bucket < cum.head, splits.head._1)) { case (acc, ((nm, _), c)) =>
      acc.when(bucket < c, nm)
    }
    df.withColumn("split", label)
  }

  /** Per-language quality-quantile retention (the calibration step of
    * CCNet-style filtering): score every document with the composite
    * quality score, then keep the top `retention` fraction WITHIN each
    * language via a per-language percent_rank cut. The threshold is
    * data-derived — each language is cut against its OWN score
    * distribution, so a low-resource language is never starved because
    * a high-resource one scores systematically higher, and no absolute
    * cutoff needs re-tuning as the corpus grows.
    *
    * Scale: one tokenize-score map pass, then ONE shuffle on the
    * language key for the window rank — per-partition work is a sort
    * bounded by the largest language. percent_rank is
    * (rank−1)/(n−1) in exact integer counts over a deterministic
    * (quality, id) order, so the DuckDB oracle reproduces the cut
    * bit-for-bit. At 100 TB a language big enough to overflow one
    * partition's sort switches to a two-pass approximate-quantile
    * threshold (computed per language, broadcast back) — same
    * semantics, no global window.
    *
    * Edge: a single-document language has percent_rank 0 and is
    * dropped at any retention < 1 — by definition there is no
    * within-language distribution to calibrate against; route such
    * tails through an absolute floor upstream if they must survive.
    * NULL-text documents (quality undefined) are excluded BEFORE the
    * window: Spark's ORDER BY floats nulls first while DuckDB/ANSI
    * defaults to NULLS LAST, so letting them into the rank would shift
    * every other row's percent_rank differently per engine — the
    * cross-engine ordering contract only holds over non-null scores.
    *
    * @return (idCol, langCol, quality, pr) for retained docs only. */
  def qualityRetention(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, retention: Double): DataFrame = {
    require(retention > 0.0 && retention <= 1.0, "retention must be in (0, 1]")
    val scored = docs.select(col(idCol), col(langCol),
      TA.qualityScore(col(textCol)).as("quality"))
      .filter(col("quality").isNotNull)
    val pr = percent_rank().over(
      Window.partitionBy(langCol).orderBy(col("quality"), col(idCol)))
    scored.withColumn("pr", pr)
      .filter(col("pr") >= lit(1.0 - retention))
  }

  /** Difficulty-ordered curriculum construction (Bengio et al. ICML'09
    * curriculum learning, easy→hard): rank every document globally by a
    * difficulty proxy — [[unigramBits]]'s bits-per-token, so gibberish
    * and rare-token-heavy docs land in the last phases — and cut the
    * ranked corpus into `nPhases` equal training phases.
    *
    * Scale: the global rank deliberately avoids
    * `row_number() OVER (ORDER BY …)` — a windowless global window
    * funnels the entire corpus through ONE partition. Instead the
    * scored frame gets a distributed range-partitioned sort and the
    * rank comes from RDD `zipWithIndex` (partition sizes from one
    * lightweight count job + a map — the [[SurrogateKey]] pattern), so
    * ranking is fully parallel at any corpus size. Phase assignment is
    * pure integer arithmetic (`rank·nPhases div N`), bit-stable
    * cross-engine.
    *
    * @return (idCol, n_tokens, bits_per_token, difficulty_rank ∈
    *   [0,N), phase ∈ [0,nPhases)). */
  def curriculum(df: DataFrame, idCol: String, textCol: String,
      nPhases: Int, vocabSize: Int = 30000): DataFrame = {
    require(nPhases > 0, "nPhases must be positive")
    val scored = unigramBits(df, idCol, textCol, vocabSize)
      .select(col(idCol), col("n_tokens"), col("bits_per_token"))
    // strict total order (id tiebreak) -> zipWithIndex rank is unique
    // and deterministic regardless of physical layout
    val sorted = scored.orderBy(col("bits_per_token"), col(idCol))
    // phase denominator = the SCORED/ranked row count, not the raw
    // input's: NULL-text rows (dropped by the tokenize explode) and
    // duplicate ids (merged by the per-doc groupBy) never reach the
    // ranked set, and counting them would under-fill trailing phases.
    // attachWithCount surfaces N from the rank pass's own count job —
    // no extra lineage pass, no single-partition count agg.
    val (ranked, n) = SurrogateKey.attachWithCount(sorted, "difficulty_rank",
      startAfter = -1L)
    ranked
      .withColumn("phase",
        expr(s"(difficulty_rank * $nPhases) div ${math.max(n, 1L)}").cast("int"))
      .select(col(idCol), col("n_tokens"), col("bits_per_token"),
        col("difficulty_rank"), col("phase"))
  }

  /** Epoch-aware token-budget mixing — the UPSAMPLING half of the
    * mixing story [[tokenBudgetMix]] leaves open: a source smaller than
    * its budget REPEATS (epoch 0, 1, 2, …) until the budget is reached,
    * the way under-represented high-quality sources (books, reference
    * text) are multiplied in real training mixes; a source larger than
    * its budget is cut exactly like [[tokenBudgetMix]]. Documents stream
    * in the same deterministic hash order within every epoch, and the
    * budget-crossing document is kept.
    *
    * Scale: one tokenize-count pass, one per-source window for the
    * within-epoch running sum (computed ONCE and reused by every epoch),
    * a per-source totals agg, and a generator bounded by
    * ⌈budget/total⌉ epochs — no state grows with epochs. All-integer
    * arithmetic, so oracles hash-match. Sources without a budget entry
    * (or with zero tokens) are excluded.
    *
    * @return (idCol, sourceCol, epoch, n_tokens, cum_tokens);
    *   cum_tokens = epoch·total + within-epoch running sum. */
  def epochMix(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(b => b >= 0 && b < Long.MaxValue / 2),
      "epochMix budgets are token counts — must be non-negative and far from Long.MaxValue")
    val n = df.select(col(idCol).as("id"), col(sourceCol).as("src"),
      size(TA.tokens(col(textCol))).cast("long").as("n_tokens"))
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      when(col("src") === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy("src")
      .orderBy(TA.phash(col("id").cast("string")), col("id"))
    val withCum = n.withColumn("cum_w", sum(col("n_tokens")).over(w))
    val totals = n.groupBy("src").agg(sum("n_tokens").as("total"))
      .filter(col("total") > 0)
    withCum.join(totals, Seq("src"))
      .withColumn("budget", budget)
      // integer ceil-division (`div`, not `/`: long / long is IEEE double
      // in Spark and would drift from the oracle's `//` above 2^53)
      .withColumn("epochs",
        greatest(expr("(budget + total - 1) div total"), lit(1L)))
      .withColumn("epoch", explode(sequence(lit(0L), col("epochs") - 1)))
      .withColumn("cum_tokens", col("epoch") * col("total") + col("cum_w"))
      .filter(col("cum_tokens") - col("n_tokens") < col("budget"))
      .select(col("id").as(idCol), col("src").as(sourceCol), col("epoch"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Unigram-LM surprise per document — the perplexity-style quality
    * filter of CCNet-descended pipelines (Wenzek et al., "CCNet",
    * LREC'20 — public method), scored against a vocabulary learned from
    * the corpus itself: rare-/unknown-token-heavy documents (gibberish,
    * mojibake, wrong-language) score high bits-per-token and get cut.
    *
    * Bit-exactness: token surprise is the INTEGER floor-log2
    * approximation `bitlen(total) − bitlen(count)` (bitlen via the
    * binary-string length of the count — exact integer arithmetic on any
    * engine), not IEEE `log2` whose last-ulp rounding differs across
    * engines and would break hash-compared oracles. Monotone in 1/count,
    * within 1 bit of true −log2 p — ordering-faithful for filtering.
    * OOV tokens score as count 1 (Laplace floor).
    *
    * Scale: token counting is an explode + two-stage hash agg (map-side
    * partials absorb stopword skew); the vocabulary is a top-`vocabSize`
    * TakeOrdered (bounded, deterministic: count desc, token asc) that
    * BROADCASTS to the scoring join, so the 100 TB-side scan never
    * shuffles on the token; per-doc aggregation shuffles on the id only.
    *
    * @return (idCol, n_tokens, n_oov, bits_total, bits_per_token). */
  def unigramBits(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 30000): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(TA.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val vocab = counts.orderBy(desc("n"), asc("tok")).limit(vocabSize)
    val total = counts.agg(sum(col("n")).as("total"))
    def bitlen(c: Column): Column = length(bin(c)).cast("long")
    toks
      .join(broadcast(vocab), Seq("tok"), "left_outer")
      .crossJoin(broadcast(total))
      .withColumn("bits", bitlen(col("total")) - bitlen(coalesce(col("n"), lit(1L))))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("bits")).as("bits_total"))
      .withColumn("bits_per_token",
        col("bits_total").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-SOURCE token-distribution divergence from the corpus mixture —
    * the data-mixing diagnostic behind domain-reweighting methods
    * (Xie et al., "DoReMi", NeurIPS'23 measures excess loss per domain;
    * this is its model-free unigram form): for each source, the
    * KL-style gap between the source's own unigram distribution and the
    * pooled corpus distribution over a shared learned vocabulary.
    * Sources with near-zero divergence are redundant with the mixture;
    * high-divergence sources carry the distinct content a mixing policy
    * (e17/e21/e28) should weight deliberately.
    *
    * Bit-exactness: both surprises use [[unigramBits]]'s INTEGER
    * floor-log2 (`bitlen(total) − bitlen(count)`), summed as integers
    * weighted by integer counts; the single division per source happens
    * once at the end — so every value is an exact rational, identical
    * cross-engine. kl_bits = (cross_bits − self_bits)/n_tokens
    * approximates KL(source‖corpus) in bits/token (within the ±1-bit
    * floor-log2 envelope, so small values can dip below 0; the ORDERING
    * across sources — what a mixing policy consumes — is faithful).
    *
    * Scale: one (source, token) hash agg with map-side partials; the
    * top-`vocabSize` vocabulary and the per-source totals are bounded
    * and broadcast — nothing shuffles on the raw token stream twice,
    * output is one row per source.
    *
    * @return (sourceCol, n_tokens, cross_bits, self_bits, kl_bits)
    *   over in-vocabulary tokens, one row per source. */
  def sourceDivergenceBits(df: DataFrame, textCol: String,
      sourceCol: String, vocabSize: Int = 30000): DataFrame = {
    val toks = df.select(col(sourceCol).as("src"),
      explode(TA.tokens(col(textCol))).as("tok"))
    val srcCounts = toks.groupBy("src", "tok").agg(count(lit(1)).as("sn"))
    val counts = srcCounts.groupBy("tok").agg(sum(col("sn")).as("n"))
    val vocab = counts.orderBy(desc("n"), asc("tok")).limit(vocabSize)
    def bitlen(c: Column): Column = length(bin(c)).cast("long")
    val inVocab = srcCounts.join(broadcast(vocab), Seq("tok"))
    val corpusTotal = inVocab.agg(sum(col("sn")).as("ctot"))
    val srcTotals = inVocab.groupBy("src").agg(sum(col("sn")).as("stot"))
    inVocab
      .join(broadcast(srcTotals), Seq("src"))
      .crossJoin(broadcast(corpusTotal))
      .groupBy(col("src").as(sourceCol))
      .agg(
        max(col("stot")).as("n_tokens"),
        sum(col("sn") * (bitlen(col("ctot")) - bitlen(col("n")))).as("cross_bits"),
        sum(col("sn") * (bitlen(col("stot")) - bitlen(col("sn")))).as("self_bits"))
      .withColumn("kl_bits",
        (col("cross_bits") - col("self_bits")).cast("double")
          / col("n_tokens").cast("double"))
  }

  /** BPE merge learning (Sennrich et al., "Neural Machine Translation of
    * Rare Words with Subword Units", ACL'16 — public method): learn the
    * top `numMerges` byte-pair merges from the corpus — the training
    * step of every BPE/WordPiece-family tokenizer. Standard formulation:
    * count adjacent symbol pairs over the WORD-FREQUENCY table (never
    * the token stream — the state is vocabulary-bounded), merge the most
    * frequent pair everywhere, repeat.
    *
    * Merge application is the native greedy left-to-right scan
    * (`graft_bpe_apply`, [[graft.spark.BpeApplyMerges]]) — a pure
    * per-row map whose result the oracle replays POSITIONALLY in SQL
    * (for a pair (a,b) with a≠b matches can never overlap, and for a==b
    * greedy selection equals "even offset within the run of a's", so the
    * scan's output is expressible without any order-dependent fold).
    * Ties in pair counts break on (left, right) ascending, so the
    * learned table is bit-deterministic.
    *
    * Scale: per ROUND, one explode+sum over the vocabulary (map-side
    * partials), a driver-bounded top-`batchK` collect, and one map stage
    * applying the round's merges. The working vocabulary is eagerly
    * `localCheckpoint`ed every round — NOT persisted — because persist
    * caches data but leaves the logical plan nested (round i's plan
    * contains round i−1's entire plan inside its `InMemoryRelation`, and
    * Spark stringifies the full plan on every job submission, so plan
    * cost grows ~2× per round: at ~13 rounds that pinned the driver for
    * minutes and then OOMed it). A checkpoint truncates the plan to a
    * constant-size `ExistingRDD` scan, so round cost is flat in the
    * number of rounds; superseded checkpoint blocks are GC-cleaned by
    * Spark's ContextCleaner when the previous round's frame drops out
    * of scope (the [[graft.ops.Dedup.lshVerifiedPairs]] pattern). On a
    * cluster, `spark.graft.reliableCheckpoint=true` + a checkpoint dir
    * routes every round's cut through a RELIABLE checkpoint
    * ([[graft.spark.Materialize]]) so training survives executor loss.
    * `batchK = 1` is the exact serial algorithm (one Spark round-trip per
    * merge — fine for small merge tables, hours of scheduler overhead at
    * a production 30k-merge training). `batchK > 1` is the standard
    * fast-BPE batching trick: per round take the longest PREFIX of the
    * top-`batchK` pairs whose symbols AND merged-output symbols are
    * pairwise disjoint and apply them together, cutting driver
    * round-trips to ~numMerges/batchK. The output symbol `l+r` counts as
    * used too: a later pick reading or producing an earlier pick's merged
    * symbol would consume/create instances the pre-round counts never
    * saw, so it ends the prefix and is re-ranked with fresh counts.
    * Within such a prefix each merge neither creates nor destroys
    * instances of the others (disjoint symbols), so the batch equals
    * applying its members serially WITHOUT recounting; the first
    * conflicting pair is re-ranked with fresh counts next round. The one
    * divergence from serial remains the textbook one: a pair CREATED by
    * an earlier merge in the round (count ≤ its parent's) can in serial
    * outrank a later prefix pick — identical results are guaranteed only
    * when that doesn't occur (CorpusOpsSpec proves equality on such a
    * fixture and e22's oracle pins batchK = 1 bit-exact).
    *
    * @return (step, lsym, rsym, cnt) — the merge table in learn order. */
  def bpeMerges(df: DataFrame, textCol: String, numMerges: Int,
      batchK: Int = 1): DataFrame = {
    require(batchK >= 1, "batchK must be >= 1")
    val spark = df.sparkSession
    // r21 (guide §1.2/§7.3 — the bottleneck is DRIVER latency, not task
    // work): ProfileQ measured e23 at 160 jobs / 7.1 s wall with only
    // 2.5 s of stage time — ~4.5 s was inter-job driver overhead. The
    // rounds are semantic (batched BPE), but the per-round CHECKPOINT
    // job is not: a LAZY localCheckpoint cuts lineage identically while
    // folding block materialization into the next round's pair-count
    // action, removing one driver-synced job per round (plus this
    // initial one). Values are unchanged — the same plan materializes,
    // just inside the consumer's job.
    // Round-latency guard (measured after the lazy-checkpoint change:
    // still ~4 driver jobs per round, all AQE query-stage submissions
    // for the pair-count exchange): when the working table is already
    // tiny — AQE coalesced it to a handful of partitions — fold it to
    // ONE partition. CoalesceExec(1) reports SinglePartition, which
    // satisfies the pair-count aggregate's clustered distribution, so
    // each round's count query plans WITHOUT an exchange and runs as
    // exactly one driver job. (A checkpointed RDD reports Unknown
    // partitioning even at 1 partition, so the coalesce is needed even
    // then — it is what carries the SinglePartition guarantee.) Guarded
    // on the observed partition count (an RDD-metadata read, no job):
    // a production-scale vocabulary arrives in many partitions, the
    // guard never fires, and the shuffle stays — this only removes
    // per-job driver latency where the data is too small for the
    // exchange to matter.
    def compactIfTiny(d: DataFrame): DataFrame =
      if (d.rdd.getNumPartitions <= 4) d.coalesce(1) else d
    var current = compactIfTiny(df
      .select(explode(TA.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("word"), "").as("syms"))
      .materializedLazy) // constant-size plan root for every round
    // AQE machinery is the residual per-round driver cost once the
    // working set is one partition (thread-dump-measured: final-plan
    // re-optimization per action on plans with NOTHING to adapt — the
    // round queries are exchange-free). Rebind the loop to the shared
    // tiny-loop child session ([[graft.spark.TinyLoop]]); fires only
    // alongside the tiny-guard — at scale the exchange is real and AQE
    // stays on.
    current = compactIfTiny(graft.spark.TinyLoop.rebindIfTiny(current))
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(batchK, numMerges - merges.size)
      val top = current
        .select(col("freq"), explode(transform(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          (p, i) => struct(p.as("l"), element_at(col("syms"), i + 2).as("r")))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(want).collect()
      if (top.isEmpty) {
        // no adjacent pair left anywhere (every word is one symbol) —
        // stop instead of burning a full count job per remaining step
        exhausted = true
      } else {
        val picked = disjointPrefix(top.map { r =>
          (r.getString(0), r.getString(1), r.getLong(2))
        })
        picked.foreach { case (a, b, c) =>
          merges += ((merges.size + 1L, a, b, c))
        }
        // the whole round applies in ONE native call (k linear greedy
        // scans per row — see graft.spark.BpeApplyMerges for why k
        // composed column transforms are not an option: ~7^k tree nodes).
        // ONE ArrayType literal, not array(lit, lit, …): CreateArray's
        // generated source varies with arity, so rounds picking 3 vs 8
        // merges each paid a fresh Janino compile; a single array
        // literal is a constant reference in the generated code — the
        // per-round apply plan compiles once and hits the codegen cache
        // thereafter (r21, thread-dump-measured driver cost).
        val roundMerges = lit(picked.flatMap {
          case (a, b, _) => Seq(a, b)
        }.toArray)
        // LAZY localCheckpoint (r21): truncates the plan to an
        // ExistingRDD scan exactly like the eager form (persist would
        // nest the previous round's plan inside an InMemoryRelation,
        // doubling per-job plan stringification cost every round —
        // driver OOM by ~13 rounds), but materializes inside the next
        // round's count job instead of a dedicated job per round
        current = compactIfTiny(current
          .withColumn("syms", call_function("graft_bpe_apply", col("syms"), roundMerges))
          .materializedLazy)
      }
    }
    spark.createDataFrame(merges.toSeq).toDF("step", "lsym", "rsym", "cnt")
  }

  /** Longest prefix of a ranked pair list safe to merge as ONE batch:
    * every symbol a pick reads (l, r) AND the symbol it writes (l+r)
    * must be untouched by every earlier pick in the prefix. Reserving
    * the concatenation closes both conflict directions: a later pick
    * READING an earlier pick's output would consume instances created
    * mid-round that its pre-round count never saw, and a later pick
    * WRITING a symbol an earlier pick read would re-create instances
    * mid-round — either way the batch≡serial contract breaks, so the
    * conflicting pick ends the prefix and is re-ranked with fresh
    * counts next round. The head is always selected, so progress is
    * guaranteed every round. (Randomized search over small corpora
    * never reached the concat collision organically from character
    * splits — once (x,y) is merged that adjacency can never re-form —
    * so this is a defense-in-depth guard, unit-tested directly.) */
  private[graft] def disjointPrefix(
      top: Seq[(String, String, Long)]): Array[(String, String, Long)] = {
    val used = scala.collection.mutable.Set[String]()
    top.iterator.takeWhile { case (a, b, _) =>
      val ab = a + b
      val ok = !used(a) && !used(b) && !used(ab)
      if (ok) { used += a; used += b; used += ab }
      ok
    }.toArray
  }

  /** Train a BPE tokenizer on the corpus and apply it back — the full
    * train→apply→audit loop of [[bpeMerges]] packaged as one operator:
    * learn `numMerges` merges from `textCol`'s word-frequency table,
    * greedily segment every corpus token with the learned merge table
    * (the native `graft_bpe_apply` scan), and return the resulting
    * subword histogram. The histogram is the standard audit artifact of
    * tokenizer training (what fraction of mass is whole words vs
    * fragments vs single characters) and the shape the SQL surface
    * exposes as `graft_bpe_tokenize`.
    *
    * Scale: training cost is [[bpeMerges]]'s (batched rounds, bounded
    * driver merge table); the apply pass is one scan with a linear
    * greedy segmentation per token plus a subword-keyed count — the
    * merge table broadcasts as a literal array (30k merges ≈ 300 KB).
    *
    * @return (subword, n) — unordered; callers rank/limit. */
  def bpeSubwordHistogram(df: DataFrame, textCol: String, numMerges: Int,
      batchK: Int = 1): DataFrame = {
    val mergeRows = bpeMerges(df, textCol, numMerges, batchK)
      .orderBy("step").collect()
    // zero learned merges (single-char-word corpus, or an exhausted
    // vocabulary) must yield a typed empty array<string> — a bare
    // array() is array<null> and graft_bpe_apply rejects it
    val mergeArr = lit(mergeRows.flatMap(r =>
      Seq(r.getString(1), r.getString(2))))
    df.select(explode(TA.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .select(explode(call_function("graft_bpe_apply",
        split(col("word"), ""), mergeArr)).as("subword"))
      .groupBy("subword").agg(count(lit(1)).as("n"))
  }

  /** Tokenizer FERTILITY per language — mean subwords-per-word under a
    * corpus-trained BPE merge table, the standard tokenizer-evaluation
    * metric (Ács 2019 / multilingual-tokenizer audits; public method):
    * a language whose words fragment into many subwords pays more
    * sequence length per unit text, so training mixes and per-language
    * token budgets (e17/e28) should price it accordingly. High fertility
    * on a language = the merge table under-serves it.
    *
    * Exactness: the greedy segmentation is the same native
    * `graft_bpe_apply` scan as [[bpeSubwordHistogram]] (oracle replays
    * training + apply stage-unrolled); counts stay integers until the
    * one division per language.
    *
    * Scale: segmentation runs once per DISTINCT word (the vocabulary-
    * bounded table, not the token stream) and joins back to the
    * (language, word) counts — the apply cost is O(vocabulary), the
    * stream cost is one (lang, word) hash agg with map-side partials.
    *
    * @return (langCol, n_words, n_subwords, fertility), one row per
    *   language; fertility = n_subwords/n_words over token occurrences. */
  def bpeFertility(df: DataFrame, textCol: String, langCol: String,
      numMerges: Int, batchK: Int = 1): DataFrame = {
    val mergeRows = bpeMerges(df, textCol, numMerges, batchK)
      .orderBy("step").collect()
    // zero learned merges (single-char-word corpus, or an exhausted
    // vocabulary) must yield a typed empty array<string> — a bare
    // array() is array<null> and graft_bpe_apply rejects it
    val mergeArr = lit(mergeRows.flatMap(r =>
      Seq(r.getString(1), r.getString(2))))
    val lw = df.select(col(langCol).as("lang"),
        explode(TA.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))
    val seg = lw.select("word").distinct()
      .withColumn("n_sub",
        size(call_function("graft_bpe_apply", split(col("word"), ""), mergeArr))
          .cast("long"))
    lw.join(seg, Seq("word"))
      .groupBy(col("lang").as(langCol))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("n_sub")).as("n_subwords"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words").cast("double"))
  }

  /** Hashing-trick TF-IDF document vectors (Weinberger et al., "Feature
    * Hashing for Large Scale Multitask Learning", ICML'09 — public
    * method): each token lands in bucket `phash(token) mod dim`, weighted
    * tf · odds-idf, summed per bucket. Bridges the text side of the
    * library to its vector side — [[Similarity]]'s ANN / near-dup /
    * clustering operators work on text-only corpora without an external
    * embedding model, at a FIXED dim chosen up front (no vocabulary
    * dictionary to build, ship, or keep consistent across a 100 TB run).
    *
    * Bit-determinism: odds idf `(N − df + 0.5)/(df + 0.5)` (no log —
    * every arithmetic step exactly rounded, same trick as
    * [[Retrieval.bm25TopK]]), per-bucket contributions folded in sorted
    * token order, so vectors are identical on any layout and in oracles.
    *
    * Scale: tf is an explode + hash agg keyed by (doc, token); document
    * frequencies are vocabulary-bounded and join on the token; the
    * per-doc vector assembly shuffles on the doc id only. Nothing is
    * corpus-global except the broadcast doc count.
    *
    * @return (idCol, vec array<double> of length dim). */
  def hashingTfidf(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, "dim must be positive")
    val toks = df.select(col(idCol).as("id"), explode(TA.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("id", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val n = df.agg(count(lit(1)).cast("double").as("n"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    val contrib = tf.join(dft, "tok").crossJoin(broadcast(n))
      .select(col("id"), (TA.phash(col("tok")) % dim).as("bucket"),
        struct(col("tok").as("t"),
          (col("tf") * ((col("n") - col("df") + 0.5) / (col("df") + 0.5))).as("c")).as("tc"))
    val bucketVals = contrib.groupBy("id", "bucket")
      .agg(array_sort(collect_list(col("tc"))).as("tcs"))
      .select(col("id"), col("bucket"),
        aggregate(col("tcs"), lit(0.0), (a, x) => a + x.getField("c")).as("v"))
    bucketVals.groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
      .select(col("id").as(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("vec"))
  }

  /** Bigram conditional-surprise per document — the order-2 upgrade of
    * [[unigramBits]]: each token is scored by how surprising it is GIVEN
    * the previous token, which separates fluent text from bag-of-frequent-
    * words spam that an order-1 model scores as fine. Backoff to the
    * unigram model (same Laplace floor as [[unigramBits]]) when the bigram
    * is outside the learned table.
    *
    * Bit-exactness: same integer floor-log2 scheme as [[unigramBits]] —
    * in-table bigrams cost `bitlen(count(prev)) − bitlen(count(prev,cur))`
    * (≈ −log2 p(cur|prev)), backoff costs `bitlen(total) −
    * bitlen(count(cur) or 1)`. All-integer, so oracle hash-compares hold.
    *
    * Scale: bigram pair formation is a pure MAP inside the token array
    * (slice + element_at — no self-join, no window over corpus tokens);
    * counting is explode + two-stage hash aggs; both model tables are
    * bounded TakeOrdered (count desc, gram asc — deterministic) that
    * BROADCAST to the scoring joins, so the corpus-side rows never
    * shuffle on token content; the final aggregation shuffles on the doc
    * id only. Documents with <2 tokens emit no bigrams and drop out.
    *
    * @return (idCol, n_bigrams, n_backoff, bits_total, bits_per_bigram). */
  def bigramBits(df: DataFrame, idCol: String, textCol: String,
      bigramVocab: Int = 100000, unigramVocab: Int = 30000): DataFrame = {
    def bitlen(c: Column): Column = length(bin(c)).cast("long")
    val pairs = df
      .select(col(idCol).as("id"), TA.tokens(col(textCol)).as("tk"))
      .select(col("id"), explode(transform(
        slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
        (p, i) => struct(p.as("prev"), element_at(col("tk"), i + 2).as("cur")))).as("bg"))
      .select(col("id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val bgCounts = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("bn"))
    val ctx = pairs.groupBy("prev").agg(count(lit(1)).as("cn"))
    val bgModel = bgCounts.orderBy(desc("bn"), asc("prev"), asc("cur"))
      .limit(bigramVocab).join(ctx, Seq("prev"))
    val toks = df.select(explode(TA.tokens(col(textCol))).as("tok"))
    val uniCounts = toks.groupBy("tok").agg(count(lit(1)).as("un"))
    val uniVocab = uniCounts.orderBy(desc("un"), asc("tok")).limit(unigramVocab)
    val total = uniCounts.agg(sum(col("un")).as("total"))
    pairs
      .join(broadcast(bgModel), Seq("prev", "cur"), "left_outer")
      .join(broadcast(uniVocab), col("cur") === col("tok"), "left_outer")
      .crossJoin(broadcast(total))
      .withColumn("bits", when(col("bn").isNotNull,
          bitlen(col("cn")) - bitlen(col("bn")))
        .otherwise(bitlen(col("total")) - bitlen(coalesce(col("un"), lit(1L)))))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("bn").isNull, 1L).otherwise(0L)).as("n_backoff"),
        sum(col("bits")).as("bits_total"))
      .withColumn("bits_per_bigram",
        col("bits_total").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Multinomial Naive Bayes text classifier (public method — McCallum &
    * Nigam, AAAI-98 Workshop on Learning for Text Categorization):
    * learn per-class token counts from a labeled train slice in ONE
    * aggregation pass, then label each test document with the class
    * whose unigram LM compresses it best (min total surprise + prior).
    * The counting counterpart of fastText-style linear classifiers used
    * for pretraining-data domain tagging and quality gating; the
    * vector-space sibling is [[Similarity.nearestCentroidClassify]].
    *
    * Bit-exactness: same integer floor-log2 scheme as [[unigramBits]].
    * A token t costs class c `bitlen(totc + V) − bitlen(cnt(t,c) + 1)`
    * bits (Laplace add-one over the learned vocabulary, V = |vocab|);
    * tokens with no (t,c) model row — OOV anywhere or unseen in c —
    * cost the same with count 0. The class prior adds `bitlen(nDocs) −
    * bitlen(nDocs_c)`. All-integer, so the DuckDB replay hash-matches;
    * score ties break on class label ascending.
    *
    * Scale: training is one explode + (class, token) hash aggregate with
    * map-side partials; the model is vocabulary-bounded (top-`vocabSize`
    * tokens by train count, count desc / token asc — deterministic) and
    * BROADCASTS with the per-class constants to the scoring side, so
    * the corpus-side scan never shuffles on token content; scoring
    * shuffles once on the doc id, and the per-doc state is one row per
    * class, never doc × vocab.
    *
    * @return (idCol, labelCol, pred_<labelCol>, correct, bits) — the
    *   test rows labeled, with the winning class's total bits. */
  def nbClassifyBits(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String, vocabSize: Int = 30000): DataFrame = {
    def bitlen(c: Column): Column = length(bin(c)).cast("long")
    val trToks = train.select(col(labelCol).as("lbl"),
      explode(TA.tokens(col(textCol))).as("tok"))
    val cnts = trToks.groupBy("lbl", "tok").agg(count(lit(1)).as("n"))
    val vocab = cnts.groupBy("tok").agg(sum(col("n")).as("tn"))
      .orderBy(desc("tn"), asc("tok")).limit(vocabSize).select("tok")
    val model = cnts.join(vocab, Seq("tok"))
    // per-class constants: LM denominator bits + prior bits
    val vsize = vocab.agg(count(lit(1)).as("vn"))
    val nDocs = train.agg(count(lit(1)).as("nd"))
    val classes = train.groupBy(col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("ndc"))
      .join(model.groupBy("lbl").agg(sum(col("n")).as("totc")), Seq("lbl"), "left_outer")
      .crossJoin(broadcast(vsize)).crossJoin(broadcast(nDocs))
      .select(col("lbl"),
        bitlen(coalesce(col("totc"), lit(0L)) + col("vn")).as("den_bits"),
        (bitlen(col("nd")) - bitlen(col("ndc"))).as("prior_bits"))
    val teToks = test.select(col(idCol).as("id"),
      explode(TA.tokens(col(textCol))).as("tok"))
    val docStats = teToks.groupBy("id").agg(count(lit(1)).as("n_tokens"))
    // sparse matched-token bits per (doc, class); unmatched tokens cost
    // bitlen(0 + 1) = 1 each, folded in from the per-doc token count
    val matched = teToks
      .join(broadcast(model.select(col("tok"), col("lbl"),
        bitlen(col("n") + 1L).as("mb"))), Seq("tok"))
      .groupBy("id", "lbl")
      .agg(sum(col("mb")).as("mbs"), count(lit(1)).as("mc"))
    val scored = docStats.crossJoin(broadcast(classes))
      .join(matched, Seq("id", "lbl"), "left_outer")
      .select(col("id"), col("lbl"),
        (col("n_tokens") * col("den_bits")
          - (coalesce(col("mbs"), lit(0L))
            + (col("n_tokens") - coalesce(col("mc"), lit(0L))))
          + col("prior_bits")).as("bits"))
    val w = Window.partitionBy("id").orderBy(asc("bits"), asc("lbl"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(test.select(col(idCol).as("id"), col(labelCol)), Seq("id"))
      .select(col("id").as(idCol), col(labelCol),
        col("lbl").as(s"pred_$labelCol"),
        (col(labelCol) === col("lbl")).as("correct"), col("bits"))
  }

  /** DSIR-style importance selection (public method — Xie et al., "Data
    * Selection for Language Models via Importance Resampling", NeurIPS
    * 2023): pick the `k` raw-pool documents whose hashed-unigram LM
    * importance ratio p_target/p_raw is highest — i.e. the raw documents
    * that look most like the target domain, the standard way a 100 TB
    * crawl is narrowed onto a curated target before training.
    *
    * Both LMs live on HASHED token buckets (the paper's hashed-n-gram
    * trick): model state is exactly `dim` counters per side regardless
    * of corpus vocabulary, so the models always broadcast. Deterministic
    * variant: the paper's Gumbel-noise resampling is replaced by the
    * top-`k` cut on (log-weight desc, id asc) — reproducible across
    * engines and runs, which the sampled form cannot be.
    *
    * Bit-exactness: per-token log-weight is the integer floor-log2 form
    * (same bitlen scheme as [[unigramBits]]): `[bitlen(totRaw + dim) −
    * bitlen(cntRaw + 1)] − [bitlen(totTgt + dim) − bitlen(cntTgt + 1)]`
    * — raw-side surprise minus target-side surprise, Laplace add-one on
    * both, summed per document. All-integer, so the DuckDB replay
    * hash-matches.
    *
    * Scale: two bucket-count aggregates (map-side partials, `dim` rows
    * out) + one broadcast-joined scoring scan of the raw pool; the only
    * shuffle is the per-doc aggregation on the id, and the final cut is
    * a bounded TakeOrdered, never a global sort.
    *
    * @return top-`k` of (idCol, n_tokens, logw_bits, logw_per_token). */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, dim: Int = 4096): DataFrame = {
    require(dim > 0, "dim must be positive")
    require(k > 0, "k must be positive")
    def bitlen(c: Column): Column = length(bin(c)).cast("long")
    def bucketed(df: DataFrame, withId: Boolean): DataFrame = {
      val toks = if (withId)
        df.select(col(idCol).as("id"), explode(TA.tokens(col(textCol))).as("tok"))
      else df.select(explode(TA.tokens(col(textCol))).as("tok"))
      toks.withColumn("bucket", TA.phash(col("tok")) % dim).drop("tok")
    }
    val tgtModel = bucketed(target, withId = false)
      .groupBy("bucket").agg(count(lit(1)).as("tc"))
    val rawModel = bucketed(raw, withId = false)
      .groupBy("bucket").agg(count(lit(1)).as("rc"))
    val tgtTot = tgtModel.agg(sum(col("tc")).as("ttot"))
    val rawTot = rawModel.agg(sum(col("rc")).as("rtot"))
    bucketed(raw, withId = true)
      .join(broadcast(tgtModel), Seq("bucket"), "left_outer")
      .join(broadcast(rawModel), Seq("bucket"), "left_outer")
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(rawTot))
      .withColumn("lw",
        (bitlen(col("rtot") + dim) - bitlen(coalesce(col("rc"), lit(0L)) + 1L))
          - (bitlen(col("ttot") + dim) - bitlen(coalesce(col("tc"), lit(0L)) + 1L)))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lw")).as("logw_bits"))
      .withColumn("logw_per_token",
        col("logw_bits").cast("double") / col("n_tokens").cast("double"))
      .orderBy(desc("logw_bits"), asc(idCol)).limit(k)
  }

  /** Systematic probability-proportional-to-size (PPS) sampling without
    * randomness (Madow's systematic selection, 1949 — public method):
    * order documents by a deterministic hash permutation, accumulate
    * integer weights, and select every document whose running total
    * crosses a multiple of stride = ⌊total/n⌋. Inclusion probability is
    * proportional to weight (weight ≥ stride ⇒ always selected), the
    * sample is reproducible on any engine, and — unlike weighted
    * A-ES/exponential-key sampling — every arithmetic step is integer,
    * so the oracle matches bit-for-bit with no transcendental drift.
    *
    * Scale: the global running sum is the classic two-level prefix-sum —
    * the hash key is range-bucketed (bucket = key·B ÷ P is monotonic in
    * key, so per-bucket order concatenates to the global order), each
    * bucket computes its local cumsum in one window, and the B bucket
    * totals (driver-bounded) broadcast back as prefix offsets. No
    * single-partition window ever sees the corpus.
    *
    * @return (idCol, weight, cum_w) for selected rows; |result| ∈
    *   {n, n+1} by the stride-crossing arithmetic. */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String, n: Int,
      buckets: Int = 64): DataFrame = {
    require(n > 0, "n must be positive")
    val keyed = df
      .select(col(idCol), col(weightCol).cast("long").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("__key", TA.phash(col(idCol).cast("string")))
      // integer `div`, not double `/`: a double quotient can round UP
      // across an integer boundary and truncate to the wrong bucket
      .withColumn("__bk", expr(s"(__key * ${buckets}L) div ${TA.P}L"))
    val w = Window.partitionBy("__bk")
      .orderBy(col("__key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("__cumloc", sum("weight").over(w))
    // bucket totals: ≤ `buckets` rows — driver-side prefix offsets
    val totals = keyed.groupBy("__bk").agg(sum("weight").as("__bw"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = totals.map(_._2).sum
    val stride = total / n
    require(stride >= 1, s"total weight $total < n=$n — nothing to stride over")
    val offsets = totals.scanLeft((-1L, 0L)) {
      case ((_, acc), (bk, bw)) => (bk, acc + bw)
    }.sliding(2).map { case Array((_, off), (bk, _)) => (bk, off) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__bk", "__off")
    local.join(broadcast(offDf), Seq("__bk"))
      .withColumn("cum_w", col("__cumloc") + col("__off"))
      .filter(expr(s"(cum_w div $stride) > ((cum_w - weight) div $stride)"))
      .select(col(idCol), col("weight"), col("cum_w"))
  }

  /** Per-cluster keyword extraction via class-based TF-IDF (the c-TF-IDF
    * of Grootendorst's BERTopic, 2022 — public method), odds-idf form:
    * treat each cluster's concatenated documents as one pseudo-document,
    * score every (cluster, term) as tf · (K − cdf + 0.5)/(cdf + 0.5)
    * with cdf = number of clusters containing the term, and keep each
    * cluster's topM terms. The labeling step downstream of semantic
    * clustering ([[graft.ops.Similarity.kmeans]], `g4`): names what each
    * cluster IS, which is how corpus browsers and mixture dashboards
    * summarize a web-scale crawl. The odds idf ((K−cdf+0.5)/(cdf+0.5),
    * BM25's log-free idf) keeps every arithmetic step exactly rounded,
    * so scores hash-match the oracle float-for-float.
    *
    * Scale: one tokenize+explode pass, two hash aggregations with
    * map-side partials ((cluster, term) tf, then per-term cluster df —
    * both bounded by the vocabulary), a broadcast-sized join, and a
    * per-cluster top-M window. Nothing corpus-global but the explode.
    *
    * @param labels (id, cluster) assignment, e.g. [[Similarity.kmeans]].
    * @return (cluster, rank, term, score), rank ≤ topM per cluster. */
  def clusterKeywords(docs: DataFrame, idCol: String, textCol: String,
      labels: DataFrame, kClusters: Int, topM: Int): DataFrame = {
    require(kClusters > 0 && topM > 0, "kClusters and topM must be positive")
    val toks = docs
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol))
      .select(col("cluster").cast("long").as("cluster"),
        explode(TA.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("cluster", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val cdf = tf.groupBy("term").agg(count(lit(1)).cast("double").as("cdf"))
    val scored = tf.join(cdf, "term")
      .withColumn("score",
        col("tf") * (lit(kClusters.toDouble) - col("cdf") + 0.5) / (col("cdf") + 0.5))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("cluster").orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rank") <= topM)
      .select("cluster", "rank", "term", "score")
  }

  /** Per-source vocabulary profile — the lexical-diversity panel of a
    * corpus dashboard: token volume, distinct types, hapax legomena
    * (frequency-1 types: high fraction = rich/raw text, low = template
    * spam), the modal token, and the type-token ratio. A collapsing TTR
    * or hapax share across corpus versions is the classic early signal
    * of template/boilerplate flooding in one source.
    *
    * Scale: one shuffle keyed (source, token) with map-side partial
    * counts — state is per-source VOCABULARY, never the token stream —
    * then a per-source rollup of at most |vocab| rows. The modal token
    * is `max(struct(n, tok))`: deterministic (ties break on the larger
    * token), no window, no second pass.
    *
    * @return (source, n_docs, n_tokens, n_types, n_hapax, max_freq,
    *   top_token, ttr) — integers + one exact division, one row per
    *   source. */
  def vocabStats(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val toks = df.select(col(sourceCol).as("source"),
      explode(TA.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("source", "tok").agg(count(lit(1)).as("n"))
    val docs = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    tf.groupBy("source")
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"),
        max(col("n")).as("max_freq"),
        max(struct(col("n"), col("tok"))).getField("tok").as("top_token"))
      .join(docs, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("max_freq"), col("top_token"),
        (col("n_types").cast("double") / col("n_tokens").cast("double")).as("ttr"))
  }

  /** Corpus-level bigram collocations by integer-bits PMI (Church &
    * Hanks, CL'90 — mutual information for lexicography): for adjacent
    * token pairs, `pmi_bits = bitlen(N·c(ab)) − bitlen(c(a)·c(b))` in
    * floor-log2 arithmetic, the collocation-strength scale that stays
    * bit-exact cross-engine. Strong collocations (named entities, fixed
    * phrases) are what a tokenizer audit wants whole; near-zero PMI at
    * high count flags delimiter junk.
    *
    * Scale: bigram formation is a PURE MAP inside each doc's token
    * array (zip-with-next — never a self-join); both count tables are
    * token-keyed aggregations with map-side partials, and the unigram
    * side joins back BROADCAST (vocabulary-bounded). Output is the
    * top-`topK` pairs by (count desc, pair asc) — a driver-bounded
    * result like every report query here.
    *
    * @param minCount drop pairs rarer than this before ranking (PMI of
    *   singletons is noise — standard practice). */
  def collocationBits(df: DataFrame, textCol: String, topK: Int = 20,
      minCount: Int = 5): DataFrame = {
    require(topK > 0 && minCount >= 1, "topK and minCount must be positive")
    val toksArr = df.select(TA.tokens(col(textCol)).as("t"))
    val uni = toksArr.select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cn"))
    val total = uni.agg(sum(col("cn")).as("ntot"))
    // tokens are \s+-split, so they never contain a space: the joined
    // pair string round-trips losslessly
    val pairs = toksArr
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("np"))
      .filter(col("np") >= minCount)
      .withColumn("w1", split(col("pair"), " ").getItem(0))
      .withColumn("w2", split(col("pair"), " ").getItem(1))
    // bit lengths of the PRODUCTS without forming them (graft_pbits
    // widens to 128 bits internally): ntot × np wraps Long at real
    // corpus scale (ntot ~1e13, np ~1e6+) — the naive length(bin(a*b))
    // would silently poison every pmi_bits value there
    pairs
      .join(broadcast(uni.withColumnRenamed("tok", "w1")
        .withColumnRenamed("cn", "n1")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("tok", "w2")
        .withColumnRenamed("cn", "n2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("np").as("n_pair"),
        col("n1").as("n_left"), col("n2").as("n_right"),
        (call_function("graft_pbits", col("ntot"), col("np")) -
          call_function("graft_pbits", col("n1"), col("n2")))
          .as("pmi_bits"))
      .orderBy(desc("n_pair"), asc("w1"), asc("w2"))
      .limit(topK)
  }

  /** Frequency-of-frequency profile (the Good–Turing table / Zipf-tail
    * diagnostic): for each corpus frequency f, how many distinct tokens
    * occur exactly f times. The f=1,2,3 head sizes drive every smoothing
    * estimate, and a frequency class that suddenly bulges between corpus
    * versions is duplicated content announcing itself. All-integer.
    *
    * Scale: two keyed aggregations (token, then frequency), both with
    * map-side partials; the second one's key space is O(log N) distinct
    * frequencies in practice. `topK` lowest frequencies — the head is
    * where the signal lives. */
  def freqOfFreq(df: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    require(topK > 0, "topK must be positive")
    df.select(explode(TA.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .groupBy("f").agg(count(lit(1)).as("n_types"))
      .orderBy(asc("f"))
      .limit(topK)
  }
}
