package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalytics => TA, VectorAnalytics => VA}
import graft.spark.Materialize.MaterializeOps

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine (builder-prompt
  * extension surface).
  *
  * Scale design notes (the point of each algorithm IS the 100 TB path):
  *  - exact: one hash-shuffle on the content hash; map-side partial
  *    aggregation keeps the exchange at ~one row per distinct hash.
  *  - MinHash+LSH: signature is a projection; the only shuffle is the
  *    band-bucket self-join — the classic shingle→minhash→band→bucket-join
  *    plan. `maxBucketSize` drops degenerate buckets (boilerplate docs)
  *    that would otherwise go quadratic — standard practice at scale.
  *  - SimHash: projection + self-join on (block key); block on the high
  *    bits (or an entity column) so the pair space stays linear-ish.
  *  - n-gram Jaccard: exact pairwise check, so it must be blocked
  *    (`blockCols`) — intended as the verify stage after LSH candidates.
  *  - embedding near-dup: blocked pairwise cosine — the verify stage
  *    after [[Similarity.srpBuckets]] candidate generation.
  */
object Dedup {

  /** 31^k mod P for k = 1..64 as a literal array (token lengths are
    * bounded by 63 chars here; extend if longer tokens appear). */
  private lazy val pow31: Column =
    array((1 to 64).scanLeft(1L)((acc, _) => acc * 31L % TA.P).tail.map(lit(_)): _*)

  /** One row per (id, word-n-gram shingle hash), NOT deduplicated.
    *
    * Plan note (hot path): array-HOF shingle building evaluates its
    * lambda interpreted and — after projection collapse — re-runs the
    * tokenizer per element access, going quadratic in tokens/doc.
    * Instead: posexplode the token array (tokenized ONCE by the
    * generator), hash each token with the native codegen'd graft_phash,
    * and COMPOSE the n-gram hash arithmetically from per-token hashes
    * using the polynomial identity
    *   H(a ++ ' ' ++ b) = (H(a) · 31^(len(b)+1) + H(' ' ++ b)) mod P
    * via window lead()s over token position. Everything after the
    * explode is codegen'd row arithmetic; the only exchange is the
    * per-doc window shuffle — linear, partition-parallel, skew-free.
    * Values are bit-identical to hashing the joined shingle string. */
  private[graft] def shingleHashRows(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      extra: Seq[Column] = Nil, portable: Boolean = true,
      keepPos: Boolean = false): DataFrame = {
    val toks = df.select(
      (col(idCol).as("id") +: extra) :+ posexplode(TA.tokens(col(textCol))): _*)
      .withColumnRenamed("pos", "tokpos").withColumnRenamed("col", "tok")
    val w = Window.partitionBy("id").orderBy("tokpos")
    val out =
      if (!portable) {
        // production path: xxhash64 over the joined shingle string,
        // reassembled from the window of tokens (still one tokenize pass)
        val parts = (0 until n).map(j => if (j == 0) col("tok") else lead(col("tok"), j).over(w))
        val last = if (n == 1) col("tok") else lead(col("tok"), n - 1).over(w)
        toks
          .withColumn("__last", last)
          .withColumn("h", xxhash64(concat_ws(" ", parts: _*)))
          .filter(col("__last").isNotNull)
          .drop("__last")
      } else {
        val sh = (1 until n).foldLeft(call_function("graft_phash", col("tok"))) { (acc, j) =>
          (acc * lead(element_at(pow31, (length(col("tok")) + 1).cast("int")), j).over(w)
            + lead(call_function("graft_phash", concat(lit(" "), col("tok"))), j).over(w)) % lit(TA.P)
        }
        toks.withColumn("h", sh)
          .filter(col("h").isNotNull) // docs shorter than n tokens emit nothing
      }
    if (keepPos) out.drop("tok") else out.drop("tok", "tokpos")
  }

  /** Deduplicated (id, h) shingle-hash rows — the SIGNATURE TABLE of the
    * text-dedup family, split out because a dedup deployment computes it
    * once per corpus version and every consumer (LSH candidates,
    * Jaccard/containment verification, incremental ingest) reads the
    * same rows; the tokenize+window-hash+distinct pass is each
    * operator's dominant cost. min() signatures are duplicate-
    * insensitive, so the deduplicated rows are bit-identical inputs for
    * banding AND the exact set-overlap verifiers. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, portable: Boolean = true): DataFrame =
    shingleHashRows(df, idCol, textCol, shingleN, portable = portable)
      .dropDuplicates("id", "h")

  /** [[minhashLshPairs]] over PRE-COMPUTED [[shingleRows]]. */
  def minhashLshPairsWithShingles(ex: DataFrame, k: Int = 16,
      bands: Int = 8, maxBucketSize: Option[Int] = None): DataFrame =
    minhashCandidates(ex, k, bands, maxBucketSize)

  /** [[lshVerifiedPairs]] over PRE-COMPUTED [[shingleRows]] — callers
    * own the shingle frame's lifecycle; the bounded pair list is still
    * materialized eagerly before returning. */
  def lshVerifiedPairsWithShingles(ex: DataFrame, minJaccard: Double,
      k: Int = 16, bands: Int = 8,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0 (zero-overlap pairs are never emitted)")
    val candidates = minhashCandidates(ex, k, bands, maxBucketSize)
      .select("id_a", "id_b")
    verifiedJaccard(candidates, ex, minJaccard).materialized
  }

  /** [[lshContainmentPairs]] over PRE-COMPUTED [[shingleRows]]. */
  def lshContainmentPairsWithShingles(ex: DataFrame, minContainment: Double,
      k: Int = 16, bands: Int = 8,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minContainment > 0,
      "minContainment must be > 0 (zero-overlap pairs are never emitted)")
    val candidates = minhashCandidates(ex, k, bands, maxBucketSize)
      .select("id_a", "id_b")
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh"))
    candidates
      .join(ex.select(col("id").as("id_a"), col("h")), Seq("id_a"))
      .join(ex.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("containment",
        col("n_inter").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select("id_a", "id_b", "containment")
      .materialized
  }

  /** EDIT-DISTANCE verification of LSH candidates — the character-level
    * verifier of the near-dup family (vs the set-overlap verifiers
    * [[lshVerifiedPairsWithShingles]] / [[lshContainmentPairsWithShingles]]):
    * Levenshtein similarity 1 − dist/max(len) catches ORDER-preserving
    * edits (typo/OCR variants, small insertions) that bag-of-shingles
    * Jaccard scores identically to a full reshuffle, and conversely
    * scores shuffled-but-same-vocabulary pairs low. Standard second
    * verifier in production dedup stacks.
    *
    * Scale: cost is bounded by the LSH candidate count (never
    * all-pairs), and the per-pair DP is capped by `prefixLen` — the
    * O(prefixLen²) per-candidate bound a 100 TB job needs, since
    * Levenshtein on unbounded documents is quadratic in doc length.
    * `minEst` adds the SKETCH SCREEN in front of the DP (keep a
    * candidate only if its signature-agreement estimate clears the
    * floor): the per-pair DP is ~10⁴× a signature compare, so a
    * production job screens on the already-computed estimate before
    * paying for it — at sf0.1 a 4/16 floor cuts the DP set 7×. The
    * candidate list joins the two text sides as plain id equi-joins
    * (shuffle-keyed on the doc id; AQE broadcasts a side only when its
    * runtime stats allow — no hint is forced, since the candidate set
    * is unbounded at corpus scale). The DP itself is a codegen'd
    * built-in (no UDF).
    *
    * @param docs   (idCol, textCol) source rows.
    * @param ex     PRE-COMPUTED [[shingleRows]] of the same corpus (the
    *               shared signature table — candidates come from it).
    * @param minSim keep pairs with edit similarity ≥ this.
    * @param prefixLen compare only the first `prefixLen` chars (cost cap).
    * @param minEst DP only candidates whose MinHash estimate ≥ this
    *               (0.0 = verify every candidate).
    * @return (id_a, id_b, edit_sim) with id_a < id_b; identical empty
    *   prefixes score 1.0.
    *
    * @note EAGER: this op runs its Spark jobs AT CALL TIME — the
    *   screened candidate list and the full verified report are both
    *   materialized ([[graft.spark.Materialize]]) before the frame is
    *   returned, because the broadcast text joins leave no shuffle
    *   boundary above the DP and a lazy plan would re-run every
    *   levenshtein under a downstream ORDER BY's range-sampling pass.
    *   Callers that want only a restricted subset still pay the whole
    *   bounded report; plan-building callers (tests asserting join/DP
    *   shapes, pipelines that fuse their own bounds) should use the
    *   lazy [[lshEditVerifiedPlan]] seam instead. Under the default
    *   `localCheckpoint` mode the materialized blocks are NOT
    *   fault-tolerant — losing an executor makes the returned frame
    *   unrecomputable; on a real cluster set
    *   `spark.graft.reliableCheckpoint=true` (+ a checkpoint dir) to
    *   trade a storage copy for executor-loss survival. */
  def lshEditVerifiedPairs(docs: DataFrame, ex: DataFrame,
      idCol: String, textCol: String, minSim: Double,
      prefixLen: Int = 256, k: Int = 16, bands: Int = 8,
      maxBucketSize: Option[Int] = Some(10000),
      minEst: Double = 0.0): DataFrame =
    // bounded report, materialized like the sibling verify ops: the
    // broadcast text joins leave no shuffle boundary above the DP, so a
    // downstream global ORDER BY's range-sampling pass would re-run
    // every levenshtein a second time (measured 1.6× end-to-end on the
    // registered d19 at sf0.1)
    lshEditVerifiedPlan(docs, ex, idCol, textCol, minSim, prefixLen,
      k, bands, maxBucketSize, minEst).materialized

  /** The lazy plan under [[lshEditVerifiedPairs]] — split out so
    * PlanSpec can assert the DP/join shapes that the public op's eager
    * materialization cuts out of the returned frame's lineage. */
  private[graft] def lshEditVerifiedPlan(docs: DataFrame, ex: DataFrame,
      idCol: String, textCol: String, minSim: Double,
      prefixLen: Int, k: Int, bands: Int,
      maxBucketSize: Option[Int], minEst: Double): DataFrame = {
    require(minSim > 0, "minSim must be > 0")
    // bounded screened pair list, consumed by two text joins downstream —
    // materialize once (the minhashEstimationReport pattern), so the
    // signature chain can never re-compute per join arm regardless of
    // how the optimizer places the est screen
    val candidates0 = minhashCandidates(ex, k, bands, maxBucketSize)
      .filter(col("est_jaccard") >= minEst)
      .select("id_a", "id_b")
      .materialized
    // r20: the checkpointed candidate list is AQE-coalesced to ONE
    // partition at bench scale, and both text attachments below are
    // broadcast joins — narrow, so the O(prefixLen²) DP stage inherits
    // that single partition (measured: one 2.6 s task doing every DP
    // while 31 cores idled). Spread the bounded list to the session
    // parallelism before the joins; keyless round-robin on an already-
    // materialized bounded list, so assignment is deterministic and
    // values unchanged. d19: 3.9 → 1.7 s at sf0.1 (local[32], min-of-5).
    val candidates = {
      val n = candidates0.sparkSession.sparkContext.defaultParallelism
      if (n > 1 && candidates0.rdd.getNumPartitions < n)
        candidates0.repartition(n)
      else candidates0
    }
    val t = docs.select(col(idCol).as("id"),
      substring(col(textCol), 1, prefixLen).as("t"))
    candidates
      .join(t.select(col("id").as("id_a"), col("t").as("t_a")), Seq("id_a"))
      .join(t.select(col("id").as("id_b"), col("t").as("t_b")), Seq("id_b"))
      .withColumn("__mx", greatest(length(col("t_a")), length(col("t_b"))))
      .withColumn("edit_sim",
        when(col("__mx") === 0, lit(1.0))
          .otherwise(lit(1.0) -
            levenshtein(col("t_a"), col("t_b")).cast("double")
              / col("__mx").cast("double")))
      .filter(col("edit_sim") >= minSim)
      .select("id_a", "id_b", "edit_sim")
  }

  /** MinHash ESTIMATION-ERROR report — the k (signature width) tuning
    * loop, the sketch-accuracy counterpart of [[lshRecallReport]]'s
    * banding loop: for every LSH candidate pair, the signature-agreement
    * estimate m/k next to the TRUE distinct-shingle Jaccard and the
    * absolute error. Per-pair rows (no cross-pair aggregation), so every
    * value is an exact rational computed identically cross-engine and
    * the output stays bounded by the candidate count.
    * @return (id_a, id_b, est_jaccard, jaccard, abs_err), id_a < id_b. */
  def minhashEstimationReport(ex: DataFrame, k: Int = 16, bands: Int = 8,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    // bounded pair list, referenced twice (verify join + estimate join) —
    // materialize once, the lshVerifiedPairs pattern
    val candidates = minhashCandidates(ex, k, bands, maxBucketSize)
      .materialized
    verifiedJaccard(candidates.select("id_a", "id_b"), ex, minJaccard = 0.0,
        keepZero = true)
      .join(candidates, Seq("id_a", "id_b"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
      .select("id_a", "id_b", "est_jaccard", "jaccard", "abs_err")
  }

  /** Exact dedup on a content hash: one representative (min of `idCol`)
    * + multiplicity per distinct value of `keyExpr`. */
  def exact(df: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    df.withColumn("__key", keyExpr)
      .groupBy(col("__key").as("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Candidate near-dup pairs via MinHash + LSH banding.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, distinct pairs,
    * est_jaccard = matching-signature-component fraction.
    *
    * @param portable use the oracle-portable polynomial hash (tests);
    *                 false → xxhash64 (production).
    * @param maxBucketSize drop LSH buckets larger than this (skew guard).
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 8, shingleN: Int = 1,
      portable: Boolean = true,
      maxBucketSize: Option[Int] = None): DataFrame = {
    // Plan note: the signature is NOT computed with nested array lambdas
    // (array HOFs are interpreted and re-evaluate their input per outer-
    // lambda iteration — k× re-hashing, and O(tokens²) tokenizer re-runs
    // after projection collapse). Instead: one shingle-hash ROW per
    // (doc, shingle) via [[shingleHashRows]], then the k permutation
    // minima as codegen'd partial+final min() aggregates (duplicate
    // shingles don't affect a min, so no dedup pass is needed). At
    // cluster scale the heavy part (hashing) is a pure map stage with
    // map-side combine on the doc key.
    val hashed = shingleHashRows(df, idCol, textCol, shingleN, portable = portable)
    minhashCandidates(hashed, k, bands, maxBucketSize)
  }

  /** The banding half of [[minhashLshPairs]], over PRECOMPUTED shingle-hash
    * rows (id, h) — shared by [[lshVerifiedPairs]]/[[lshRecallReport]] so the
    * tokenize+hash pass runs once per op, not once per consumer. min() is
    * duplicate-insensitive, so deduplicated rows yield bit-identical
    * signatures to the raw stream. */
  private[graft] def minhashCandidates(
      hashed: DataFrame, k: Int, bands: Int,
      maxBucketSize: Option[Int]): DataFrame = {
    val rows = k / bands
    require(bands * rows == k, s"bands ($bands) must divide k ($k)")
    val minAggs = (0 until k).map { i =>
      val a = (1103515245L * i + 12345L) % TA.P
      val b = (1234567891L * i + 987654321L) % TA.P
      min((lit(a) * col("h") + lit(b)) % lit(TA.P)).as(s"s_$i")
    }
    val sigs = hashed.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"s_$i")): _*).as("sig"))
    val buckets = sigs
      .select(col("id"), col("sig"), posexplode(TA.bandSigs(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val pruned = maxBucketSize match {
      case None => buckets
      case Some(m) =>
        val sizes = buckets.groupBy("band", "bucket").count().filter(col("count") <= m)
        buckets.join(sizes.select("band", "bucket"), Seq("band", "bucket"), "left_semi")
    }
    val a = pruned.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = pruned.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), TA.sigSimilarity(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .distinct()
  }

  /** Per-document SimHash over token hashes (low `bits` bits).
    *
    * Plan note: computed as `bits` per-bit ±1 sum AGGREGATES over exploded
    * token-hash rows (codegen'd partial+final agg, one shuffle on the doc
    * id) rather than the nested-array-lambda fold, which re-evaluates the
    * token hashing per bit when interpreted. Integer sums are exactly
    * commutative, so values match the HOF/oracle definition bit-for-bit.
    * Documents with zero tokens emit no row. */
  def simhashes(df: DataFrame, idCol: String, textCol: String, bits: Int = 24): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(TA.tokens(col(textCol))).as("tok"))
      .select(col("id"), call_function("graft_phash", col("tok")).as("h"))
    val bitSums = (0 until bits).map { b =>
      val pw = 1L << b
      sum(((col("h") / lit(pw.toDouble)).cast("long") % lit(2L)) * lit(2L) - lit(1L)).as(s"b_$b")
    }
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until bits).map(b => when(col(s"b_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within blocks: pairs whose Hamming distance is
    * ≤ maxHamming. Blocked (blockCols) to keep the pair space linear. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxHamming: Int, bits: Int = 24): DataFrame = {
    val s = simhashes(df, idCol, textCol, bits)
      .join(df.select(col(idCol).as("id") +: blockCols.map(col): _*), Seq("id"))
    val a = s.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("simhash").as("sim_a"): _*)
    val b = s.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("simhash").as("sim_b"): _*)
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", TA.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** [[ngramJaccardPairs]] over PRE-COMPUTED deduplicated [[shingleRows]]
    * (id, h) plus a per-doc block-key table (id, blk) — the form a
    * pipeline uses when the corpus signature table is a durable artifact
    * (d2's shingles): the tokenize+window-hash+distinct pass — the op's
    * dominant cost, a full corpus map stage at 100 TB — is not re-run
    * per consumer; attaching the doc-local block key is one id-keyed
    * join of two narrow columns. Values are identical to the inline
    * form: same distinct (id, h) set, same block hash, same
    * set-similarity join (r21, guide §2.4 — one pass feeds all).
    * PRECONDITION: `blocks` has exactly one row per id. */
  def ngramJaccardPairsWithShingles(
      ex0: DataFrame, blocks: DataFrame, minJaccard: Double): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0 (zero-overlap pairs are never emitted)")
    val ex = ex0.select(col("id"), col("h")).join(blocks, Seq("id"))
    val sizes = ex0.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val a = ex.select(col("blk"), col("h"), col("id").as("id_a"))
    val b = ex.select(col("blk"), col("h"), col("id").as("id_b"))
    val inter = a.join(b, Seq("blk", "h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard similarity for all pairs within blocks —
    * the precise verify stage downstream of LSH candidates. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int, minJaccard: Double): DataFrame = {
    // Set-similarity-join plan: explode distinct shingle hashes, equi-join
    // on (block, hash) to COUNT intersections, and derive the union as
    // |a|+|b|−|a∩b|. No per-pair array materialization or O(|a|·|b|)
    // intersect — the heavy work is a hash-shuffle equi-join, which is
    // how set-similarity joins scale out. Zero-intersection pairs never
    // appear, which is exactly the minJaccard > 0 contract.
    require(minJaccard > 0, "minJaccard must be > 0 (zero-overlap pairs are never emitted)")
    // Blocks are disjoint per doc, so (id_a, id_b) implies the block —
    // the block key is only needed in the pair join itself; everything
    // downstream shuffles on compact long keys. A dense integer block id
    // (hash of the block columns) replaces the string columns in the join.
    val ex = shingleHashRows(df, idCol, textCol, n,
        extra = Seq(xxhash64(blockCols.map(col): _*).as("blk")))
      .dropDuplicates("id", "h") // jaccard is over DISTINCT shingle sets
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val a = ex.select(col("blk"), col("h"), col("id").as("id_a"))
    val b = ex.select(col("blk"), col("h"), col("id").as("id_b"))
    val inter = a.join(b, Seq("blk", "h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact duplicated-SPAN detection — the "exact substring dedup" stage
    * of training-data pipelines (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL'22 — public method): mark, inside
    * each document, every maximal token span whose length-`n` grams ALL
    * occur in at least `minDocs` distinct documents. Downstream pipelines
    * cut (rather than drop) these spans — boilerplate, licenses, quoted
    * passages — which document-level near-dup scoring never localizes.
    *
    * Plan (every stage key-parallel, output bounded by corpus tokens —
    * never pair-quadratic, unlike emitting (doc_a, doc_b, span) pairs):
    *  1. (id, tokpos, gram-hash) rows — the [[shingleHashRows]] plan
    *     (tokenize ONCE, native per-token hash, window-composed n-gram
    *     hash) with positions retained;
    *  2. per-hash distinct-doc counts (two-stage agg, map-side partial);
    *  3. flag positions whose gram clears `minDocs` (hash equi-join —
    *     both sides derive from stage 1, so the exchange is reused);
    *  4. merge flagged positions per doc into maximal spans with the
    *     gap-tolerant islands trick: a new island starts when the gap to
    *     the previous flagged gram exceeds n−1 — i.e. exactly when their
    *     token ranges no longer touch — so emitted spans never overlap
    *     (one per-doc window + agg, skew-free).
    *
    * Counting collides on the 61-bit gram hash, identically on the SQL
    * oracle side — flagging is bit-reproducible.
    *
    * @return (doc_id, span_start, span_end, n_dup_grams): token-position
    *   span [start, end] INCLUSIVE of the trailing n−1 tokens of its last
    *   gram; n_dup_grams = flagged gram positions merged into the span. */
  def duplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2, portable: Boolean = true): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would flag every position")
    val grams = shingleHashRows(df, idCol, textCol, n,
      portable = portable, keepPos = true)
    val docCounts = grams.dropDuplicates("h", "id")
      .groupBy("h").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    val flagged = grams.join(docCounts, Seq("h"))
    val w = Window.partitionBy("id").orderBy("tokpos")
    flagged
      // gap to the previous flagged gram; first row gets n (> n−1 → new island)
      .withColumn("gap",
        coalesce(col("tokpos") - lag(col("tokpos"), 1).over(w), lit(n)))
      .withColumn("island",
        sum(when(col("gap") > lit(n - 1), 1).otherwise(0)).over(w))
      .groupBy(col("id").as("doc_id"), col("island"))
      .agg(min(col("tokpos")).as("span_start"),
        (max(col("tokpos")) + lit(n - 1)).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .select("doc_id", "span_start", "span_end", "n_dup_grams")
  }

  /** Apply [[duplicatedSpans]] cuts — the surgery stage of substring
    * dedup: remove every flagged token span from each document and
    * re-emit the cleaned text (whitespace-normalized: tokens rejoined
    * with single spaces). Documents whose every token is flagged come
    * back with empty text rather than disappearing — a corpus cut must
    * be auditable row-for-row against its input.
    *
    * Scale: flagged positions explode to at most the corpus token count
    * (spans are disjoint by construction); the anti-join is hash-keyed
    * on (id, position); reassembly is one per-doc aggregate whose
    * collect_list is bounded by the document's own length — the same
    * per-doc bound every tokenizing op here already carries.
    *
    * @param spans output of [[duplicatedSpans]] for the SAME df.
    * @return (idCol, clean_text, n_tokens_kept, n_tokens_cut). */
  def cutSpans(df: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val flagged = spans.select(col("doc_id").as("id"),
      explode(sequence(col("span_start"), col("span_end"))).as("tokpos"))
    val toks = df.select(col(idCol).as("id"), posexplode(TA.tokens(col(textCol))))
      .withColumnRenamed("pos", "tokpos").withColumnRenamed("col", "tok")
    val kept = toks.join(flagged, Seq("id", "tokpos"), "left_anti")
      .groupBy("id")
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("tokpos"), col("tok")))),
            s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens_kept"))
    df.select(col(idCol).as("id"),
        size(TA.tokens(col(textCol))).cast("long").as("__n_total"))
      .join(kept, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        (col("__n_total") - coalesce(col("n_tokens_kept"), lit(0L))).as("n_tokens_cut"))
  }

  /** Cross-document n-gram NOVELTY profile — for each document, the
    * fraction of its distinct n-grams whose FIRST owner (minimum doc id
    * over every document containing the gram) is the document itself.
    * The per-doc companion of [[duplicatedSpans]]: where d9 localizes
    * WHICH spans repeat, novelty scores HOW derivative each document is
    * under a first-seen-keeps-credit rule — low-novelty docs are
    * template expansions / quote compilations / near-copies whose
    * content predates them in the corpus order, the per-doc signal
    * curation uses to cut generated boilerplate that exact and
    * pair-wise dedup both miss (no single pair needs to clear a
    * threshold).
    *
    * Scale: distinct (doc, gram-hash) rows → one hash shuffle on the
    * gram to find min owners (map-side partial min absorbs hot grams) →
    * the join back re-uses the same partitioning → one shuffle on the
    * doc id. Nothing pairwise, output one row per doc with ≥ n tokens.
    *
    * @return (idCol, n_grams, n_novel, novelty), novelty = n_novel/n_grams. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val grams = shingleHashRows(df, idCol, textCol, n).dropDuplicates("id", "h")
    val firstOwner = grams.groupBy("h").agg(min(col("id")).as("first_owner"))
    grams.join(firstOwner, Seq("h"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("id") === col("first_owner"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  /** Connected components over a near-dup pair graph: groups transitive
    * duplicate candidates into clusters labeled by their minimum member
    * id (the canonical representative a dedup pipeline keeps).
    *
    * Algorithm: alternating large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * algorithm). Each round is one shuffle join + aggregate like min-label
    * propagation, but the edge set contracts toward a star forest in
    * O(log n) rounds EVEN ON CHAIN GRAPHS, where plain propagation needs
    * O(diameter) rounds (a 10k-long chain: ~14 vs ~10 000). Driver
    * synchronization is bounded too: rounds run in batches of 4 with ONE
    * eager lineage cut + convergence probe per batch, not a count() per
    * round.
    *
    *  - large-star: every node u links its LARGER neighbors to the min of
    *    its closed neighborhood — long tails fold toward local minima.
    *  - small-star: every node links its smaller-or-equal neighbors (and
    *    itself) to its smallest neighbor — stars flatten onto centers.
    * Both preserve connectivity; the fixpoint is one star per component
    * centered at the component's min id.
    *
    * At fixpoint every edge is (member, center): labels read straight off
    * the edge set; nodes appearing only in self-pairs label themselves.
    *
    * @return (id, cluster) — every id that appears in a pair, labeled.
    * @param maxIter max large-star+small-star round PAIRS (a safety bound,
    *   not the expected count: 20 covers components up to ~2^20 nodes). */
  def clusterPairs(pairs: DataFrame, idACol: String = "id_a", idBCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    // r21 (guide §2.4): ONE materialized pair root feeds both the node
    // set and the edge normalization — the pair derivation (an LSH
    // candidate chain or a mutual-kNN join) previously re-ran for each.
    // A TinyLoop rebind of the contraction (AQE off, 1 shuffle
    // partition — the pagerank/BPE fix) was MEASURED AND REJECTED here:
    // the star rounds carry real per-round compute (g4's mutual-kNN
    // graph: ~8 shuffle stages × 100-220 ms per round single-task), and
    // serializing them regressed g4 2.65 → 4.2 s even as the job count
    // fell 48 → 12; the AQE-parallel rounds win despite their
    // scheduling overhead.
    val p0 = pairs.select(col(idACol), col(idBCol)).materialized
    val nodes = p0.select(col(idACol).as("id"))
      .union(p0.select(col(idBCol).as("id"))).distinct()
    var edges = p0
      .select(greatest(col(idACol), col(idBCol)).as("a"),
        least(col(idACol), col(idBCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct().materialized

    // large-star: m = min(N(u) ∪ {u}); emit (v, m) for neighbors v > u
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      sym.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    // small-star: m = min of u's smaller neighbors; emit (v, m) for each
    // smaller neighbor v and (u, m)
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b")).distinct()
      val mins = dir.groupBy("a").agg(min("b").as("mn"))
      val joined = dir.join(mins, "a")
      joined.select(col("b").as("a"), col("mn").as("b"))
        .union(mins.select(col("a"), col("mn").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }

    // Round pairs between convergence probes. 4 is measured-optimal on
    // the LSH near-dup graph (convergence lands at 3-4 round pairs;
    // probing earlier at 2 costs an extra probe AND an extra batch
    // boundary — +27% on g2 at sf0.1).
    val checkEvery = 4
    var converged = false
    var done = 0
    while (!converged && done < maxIter) {
      val batch = math.min(checkEvery, maxIter - done)
      // each star op references its input ~3× (union + join), so the
      // logical plan grows 3^ops without a lineage cut — Catalyst analysis
      // goes exponential (minutes per batch). An EAGER materialization per
      // round pair keeps the plan flat (LogicalRDD/parquet base) and
      // materializes work the next round needs anyway; on a cluster, set
      // spark.graft.reliableCheckpoint=true + a checkpoint dir
      // ([[graft.spark.Materialize]]) so the contraction survives
      // executor loss mid-round
      // cut cadence: ONE eager materialization per round pair. Measured
      // at sf0.1 (this host, min-of-3): batching the cut to every 2
      // round pairs made the contraction SLOWER (g2 cold 15.3→19.1 s) —
      // the 4-star nested plan's analysis/codegen cost exceeds the
      // saved job-launch overhead — so per-pair stays.
      for (_ <- 1 to batch) edges = smallStar(largeStar(edges)).materialized
      done += batch
      // star forest iff no chains (an edge's center is another edge's
      // member) and every member points at exactly one center
      val chains = edges.as("e1")
        .join(edges.as("e2"), col("e1.b") === col("e2.a"), "left_semi").count()
      converged = chains == 0 &&
        edges.groupBy("a").agg(countDistinct("b").as("c")).filter(col("c") > 1).count() == 0
    }
    val memberLabels = edges.groupBy("a").agg(min("b").as("cluster"))
      .withColumnRenamed("a", "id")
    // centers and self-pair-only nodes label themselves
    nodes.join(memberLabels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** Keep one representative (min id) per duplicate cluster: rows whose
    * id is not a non-representative member of any pair cluster. */
  def dropDuplicateClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val toDrop = clusterPairs(pairs).filter(col("id") =!= col("cluster")).select("id")
    df.join(toDrop.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** Quality-aware canonical-representative selection per duplicate
    * cluster — the "keep the BEST copy, not the first" upgrade of
    * [[dropDuplicateClusters]]' min-id policy (the spirit of SemDeDup's
    * keep-one-per-semantic-cluster, Abbas et al. 2023, with a pluggable
    * per-doc score standing in for centroid proximity): label the pair
    * graph's components ([[clusterPairs]]), join each member's score,
    * and keep the arg-max (score DESC, id ASC tie-break) per cluster.
    *
    * Returns (cluster, rep_id, rep_score, n_members) — one row per
    * component of the pair graph. Docs outside the graph are their own
    * representatives and don't appear.
    *
    * Scale: labels cost the O(log n)-round star contraction; the score
    * join and the arg-max shuffle only (id, score) label rows — never
    * text — and max/count aggregate with map-side partials, so the
    * largest dup cluster bounds one partial's key width, not a sort. */
  def clusterRepresentatives(pairs: DataFrame, scored: DataFrame,
      idCol: String, scoreCol: String): DataFrame =
    representativesFromLabels(clusterPairs(pairs), scored, idCol, scoreCol)

  /** [[clusterRepresentatives]] taking PRE-COMPUTED component labels
    * ((id, cluster), e.g. [[clusterPairs]]' output) — the form a real
    * pipeline uses: at 100 TB you run the O(log n) contraction ONCE per
    * corpus version and every downstream policy (drop-to-min-id,
    * keep-best-copy, cluster stats) reads the same label table instead
    * of re-contracting the pair graph per consumer. */
  def representativesFromLabels(labels: DataFrame, scored: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    labels
      .join(scored.select(col(idCol).as("id"), col(scoreCol).cast("double").as("__s")), "id")
      .groupBy("cluster")
      .agg(
        max(struct(col("__s").as("s"), (-col("id")).as("ni"), col("id").as("i"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("m.i").as("rep_id"), col("m.s").as("rep_score"),
        col("n_members"))
  }

  /** The complete text near-dup pipeline in one call:
    * LSH candidate generation → exact n-gram-Jaccard verification →
    * transitive clustering → keep the min-id representative per cluster.
    * This is the shape a 100 TB dedup job runs: every stage is one of
    * the operators above, so cost is LSH-linear plus pairwise work only
    * on candidates.
    *
    * @param minJaccard exact-similarity threshold for a verified dup pair.
    */
  def nearDupFilter(
      df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.8,
      k: Int = 16, bands: Int = 8, shingleN: Int = 2,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame =
    dropDuplicateClusters(df, idCol,
      lshVerifiedPairs(df, idCol, textCol, minJaccard, k, bands, shingleN,
        portable = true, maxBucketSize = maxBucketSize))

  /** LSH candidate pairs exact-verified by true n-gram Jaccard — the
    * OUTPUT-BOUNDED form of the standalone set-similarity query: the
    * answer never exceeds the LSH candidate count, so it stays linear on
    * near-dup-dense corpora where an unblocked [[ngramJaccardPairs]]
    * grows quadratically.
    *
    * Plan note: the intersection count is keyed by the CANDIDATE PAIR,
    * not by the shared shingle. A shingle-keyed self-join (the
    * [[ngramJaccardPairs]] plan with all candidate docs in one block)
    * materializes a row for every co-shingled doc pair — a stopword
    * 2-gram appearing in m docs explodes to m² rows, the exact quadratic
    * blowup LSH exists to avoid (measured 36× the candidate-join cost at
    * sf0.1). Joining candidates→shingles(id_a)→shingles(id_b) instead
    * costs Σ_candidates |shingles(a)| — linear in candidates × doc
    * length, and popular shingles only ever meet pairs LSH already
    * nominated. Returns (id_a, id_b, jaccard) with jaccard the TRUE
    * distinct-shingle Jaccard (not the signature estimate). */
  def lshVerifiedPairs(
      df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double,
      k: Int = 16, bands: Int = 8, shingleN: Int = 2,
      portable: Boolean = true,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0 (zero-overlap pairs are never emitted)")
    // ONE shingle pass feeds every consumer — the k signature minima (min
    // is duplicate-insensitive, so the deduplicated rows are signature-
    // exact), the per-doc sizes, and both sides of the intersection join.
    // Persisted so tokenize+hash+distinct runs once, not three times; the
    // cache is CORPUS-sized, so it must not outlive the op: the
    // candidate-bounded pair list (small by the output-bound argument
    // above) is materialized eagerly below and the shingle cache released
    // before returning.
    val ex = shingleRows(df, idCol, textCol, shingleN, portable = portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EAGER materialization of the bounded result inside WithShingles
    // (same pattern as [[Similarity.kmeansCentroids]]'s persist→fold→
    // unpersist): the checkpointed blocks are result-sized and
    // GC-cleaned by Spark's ContextCleaner when the returned frame goes
    // out of scope, unlike an explicit persist, which CacheManager pins
    // until unpersist.
    val pairs = lshVerifiedPairsWithShingles(ex, minJaccard, k, bands, maxBucketSize)
    ex.unpersist(blocking = false) // corpus-sized cache dies with the op
    pairs
  }

  /** Exact distinct-shingle Jaccard for a bounded CANDIDATE pair list,
    * against precomputed deduplicated shingle rows `ex` (id, h, …).
    * The intersection count is keyed by the candidate pair (see
    * [[lshVerifiedPairs]]'s plan note) — popular shingles only ever meet
    * pairs the candidate stage already nominated. */
  private[graft] def verifiedJaccard(
      candidates: DataFrame, ex: DataFrame, minJaccard: Double,
      keepZero: Boolean = false): DataFrame = {
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val overlaps = candidates
      .join(ex.select(col("id").as("id_a"), col("h")), Seq("id_a"))
      .join(ex.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    // zero-overlap candidates vanish from the inner overlap join; the
    // estimation report needs them (est > 0, true j = 0 is exactly the
    // error it measures), so keepZero re-attaches them with n_inter = 0
    val inter =
      if (!keepZero) overlaps
      else candidates.join(overlaps, Seq("id_a", "id_b"), "left_outer")
        .select(col("id_a"), col("id_b"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** LSH recall evaluation in ONE shingle pass — ground-truth near-dup
    * pairs (exact blocked Jaccard, the offline tuning sample) vs what the
    * LSH+verify path finds, bucketed by true Jaccard (floor(j·10)). The
    * report shows exactly where the banding S-curve loses pairs.
    *
    * Plan: the deduplicated shingle rows are computed ONCE (with the
    * block key attached) and persisted; the truth side's set-similarity
    * self-join and the signature minima re-scan the same cached blocks
    * — previously three independent tokenize+hash passes. The "found"
    * side joins the CANDIDATE list directly (no per-candidate verify
    * pass — see the inline note: against truth rows the verify filter
    * is provably a no-op). The truth side is deliberately
    * pair-quadratic within blocks (it IS the ground truth), so this is
    * a tuning-sample-scale op, never a corpus pass. The bounded report
    * is materialized eagerly and the corpus-sized cache released before
    * returning.
    *
    * @return (bucket, n_truth, n_found, recall), one row per non-empty
    *   decile bucket of true Jaccard ≥ minJaccard. */
  def lshRecallReport(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], minJaccard: Double,
      k: Int = 16, bands: Int = 8, shingleN: Int = 2,
      portable: Boolean = true,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0 (zero-overlap pairs are never emitted)")
    val ex = shingleHashRows(df, idCol, textCol, shingleN,
        extra = Seq(xxhash64(blockCols.map(col): _*).as("blk")),
        portable = portable)
      .dropDuplicates("id", "h") // blk is functionally dependent on id
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val report = lshRecallReportWithShingles(ex, minJaccard, k, bands,
      maxBucketSize)
    ex.unpersist(blocking = false)
    report
  }

  /** [[lshRecallReport]] over PRE-COMPUTED deduplicated shingle rows
    * carrying the block key — (id, blk, h), e.g. the durable signature
    * artifact joined with a per-doc block table (r21, guide §2.4: the
    * tokenize+hash+distinct pass is the report's dominant map cost and
    * a pipeline computes it once per corpus version). Callers own the
    * frame's lifecycle (persist or store-backed); the bounded report is
    * still materialized eagerly before returning. */
  def lshRecallReportWithShingles(ex: DataFrame, minJaccard: Double,
      k: Int = 16, bands: Int = 8,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0 (zero-overlap pairs are never emitted)")
    // truth: the [[ngramJaccardPairs]] set-similarity plan over the block key
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val ta = ex.select(col("blk"), col("h"), col("id").as("id_a"))
    val tb = ex.select(col("blk"), col("h"), col("id").as("id_b"))
    val truth = ta.join(tb, Seq("blk", "h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
    // found: the LSH candidate list itself (r21, guide §1.2 — don't
    // compute what you throw away). The old form re-verified every
    // candidate's true Jaccard (a full second intersection-count
    // aggregation + two size joins — ProfileQ: ~2 of d12's 39 s of task
    // time, plus 4 exchanges) only for the report to LEFT-JOIN it
    // against `truth` and count matches. But a truth row for a pair
    // already certifies jaccard ≥ minJaccard (jaccard is intrinsic to
    // the pair — the same value the verify pass recomputes), so
    //   truth ⋉ verified(candidates)  ≡  truth ⋉ candidates:
    // candidates failing the verify threshold can never match a truth
    // row, and candidates crossing blocks never appear in truth. The
    // recall a production run measures is unchanged; the whole verify
    // re-aggregation drops out of the plan (oracle replay green at
    // sf0.01 + sf0.001).
    val found = minhashCandidates(ex, k, bands, maxBucketSize)
      .select(col("id_a").as("fa"), col("id_b").as("fb"))
    val report = truth
      .join(found, col("id_a") === col("fa") && col("id_b") === col("fb"),
        "left_outer")
      .withColumn("bucket", floor(col("jaccard") * 10).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_truth"), count(col("fa")).as("n_found"))
      .withColumn("recall",
        col("n_found").cast("double") / col("n_truth").cast("double"))
      .materialized // report-sized; frees the caller's cache for release
    report
  }

  /** MinHash-containment pairs — the ASYMMETRIC complement of
    * [[lshVerifiedPairs]]: containment C = |A∩B| / min(|A|, |B|), the
    * fraction of the SMALLER document's shingles present in the larger.
    * Jaccard misses the quote/boilerplate case (a 50-shingle license
    * block inside a 5000-shingle document has j ≈ 0.01 but C = 1.0);
    * containment is how substring-level inclusion is caught at document
    * granularity (Broder's resemblance/containment pair, 1997 — public
    * method).
    *
    * Same one-shingle-pass plan as [[lshVerifiedPairs]] (shared cached
    * rows feed signatures, sizes, and the intersection join); candidates
    * still come from the Jaccard-tuned banding sketch, so very skewed
    * size ratios need smaller bands upstream — the standard caveat.
    *
    * @return (id_a, id_b, containment) with id_a < id_b, containment ≥
    *   minContainment. */
  def lshContainmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      minContainment: Double,
      k: Int = 16, bands: Int = 8, shingleN: Int = 2,
      portable: Boolean = true,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minContainment > 0,
      "minContainment must be > 0 (zero-overlap pairs are never emitted)")
    val ex = shingleRows(df, idCol, textCol, shingleN, portable = portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = lshContainmentPairsWithShingles(ex, minContainment, k, bands,
      maxBucketSize)
    ex.unpersist(blocking = false)
    pairs
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023 — public method):
    * semantic near-dup removal via LEARNED coarse clusters — k-means
    * over the embedding space — instead of text shingles. Within each
    * cluster, any pair at cosine ≥ minCosine marks the LARGER id a
    * duplicate; survivors keep their cluster label. The keep-min-id
    * policy is the pairwise-greedy form: the drop decision is local to
    * the pair (no transitive closure), so a → b → c chains keep a and
    * drop both b and c — deterministic, order-free, and exactly one
    * EXISTS in the oracle where a component-based policy needs a
    * recursive CC replay.
    *
    * Scale: training is [[Similarity.kmeansCentroids]]' bounded Lloyd
    * loop; assignment is a broadcast argmin map; the pair scan is
    * cluster-blocked (the whole point of the coarse quantizer — pairs
    * never cross clusters), so per-partition work is bounded by the
    * largest cluster, with √n·k cluster counts the paper's recipe for
    * keeping blocks balanced at corpus scale.
    *
    * @return (idCol, cluster) survivors, cluster ∈ [0, kClusters). */
  def semDedupKmeans(
      df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, kClusters: Int = 20, iters: Int = 5): DataFrame =
    semDedupWithLabels(df, idCol, vecCol,
      graft.ops.Similarity.kmeans(df, idCol, vecCol, kClusters, iters)
        .withColumnRenamed("id", idCol),
      minCosine)

  /** [[semDedupKmeans]] over PRE-COMPUTED (idCol, cluster) labels — the
    * pipeline form where one trained quantizer serves SemDeDup, IVF
    * search, and sampling together ([[Similarity.assignClusters]]);
    * identical semantics, no per-consumer retraining. */
  def semDedupWithLabels(
      df: DataFrame, idCol: String, vecCol: String,
      labels: DataFrame, minCosine: Double): DataFrame = {
    val assign = labels
      .select(col(idCol), col("cluster").cast("long").as("cluster"))
    val withC = df.join(assign, Seq(idCol))
    val drops = embeddingNearDupPairs(withC, idCol, vecCol, Seq("cluster"), minCosine)
      .select(col("id_b").as(idCol)).distinct()
    assign.join(drops, Seq(idCol), "left_anti")
  }

  /** PageRank centrality over an undirected pair graph (Page et al.,
    * 1999 — public method), unnormalized form: score = (1−d) + d·Σ_nbrs
    * score/deg. A dedup pipeline uses it to pick CANONICAL
    * representatives: in a near-dup cluster the most-connected variant
    * (the one everything else resembles) is usually the clean original,
    * where min-id picks an arbitrary copy.
    *
    * Bit-determinism: per-node neighbor contributions fold in ascending
    * neighbor-id order (sorted-struct trick), and the (1−d) base is
    * computed 1.0 − d in BOTH engines (0.15 is not exactly representable;
    * writing the subtraction keeps the bits identical). Oracle = the
    * iterations unrolled as CTEs.
    *
    * Scale: each iteration is one edge⋈score join (shuffles on node id)
    * + one grouped fold; per-node state is its neighbor list, bounded by
    * the LSH bucket cap upstream when the graph comes from
    * [[minhashLshPairs]]. The candidate PAIR list (output-bounded by the
    * LSH bucket cap) is materialized ONCE up front with an eager
    * `localCheckpoint` — so the expensive candidate derivation never
    * re-runs, its blocks are GC-cleaned by Spark's ContextCleaner when
    * the op's result goes out of scope (no CacheManager pin to leak),
    * and every edge/degree reference in the iteration chain is a cheap
    * block re-scan. The returned scores frame stays LAZY: the iters-deep
    * hash-join chain is visible to plan guards and computed exactly once
    * at the caller's sink — an eager checkpoint here would pay the
    * pipeline in its own job and then re-read blocks for the sink
    * (measured 2.5× slower at sf0.1), for a lineage that is already
    * constant-depth thanks to the checkpointed root.
    *
    * r20: node degree is STATIC across iterations, so it is attached to
    * the edge list ONCE (one join, materialized with the pair list)
    * instead of re-joined inside every iteration — DataFrame plans have
    * no common-subtree reuse, so the old per-iteration `deg` reference
    * re-ran the degree aggregation AND one extra sort-merge join per
    * round inside the final nested plan (iters joins + iters agg
    * recomputations removed; plan: 6 SMJ → 3 for iters = 3). Values are
    * bit-identical — same (score, deg) pairs divide, same grouped
    * fold. */
  def pagerankCentrality(pairs: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    // r21: tiny-loop rebind (same rationale and guard as [[clusterPairs]]
    // — the iteration chain's exchanges are driver-latency-bound at
    // bench scale; values are partitioning-insensitive by the sorted-
    // struct fold contract; no-op at scale).
    val p = graft.spark.TinyLoop.rebindIfTiny(
      pairs.select("id_a", "id_b").materialized)
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val edgesDeg = edges.join(deg, Seq("src")).materialized
    var scores = edges.select(col("src").as("id")).distinct()
      .withColumn("score", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(scores.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          struct(col("src"), (col("score") / col("deg")).as("c")).as("sc"))
      scores = contribs.groupBy(col("dst").as("id"))
        .agg(array_sort(collect_list(col("sc"))).as("scs"))
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * aggregate(col("scs"), lit(0.0),
            (a, x) => a + x.getField("c"))).as("score"))
    }
    scores
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected edge list (any orientation — each pair is normalized to
    * `least < greatest`, so the canonical shape [[Similarity.knnGraph]] /
    * [[minhashLshPairs]] emit AND arbitrary SQL pair tables with
    * reversed rows are both counted correctly; self-loops and NULL
    * endpoints drop): the standard
    * graph-quality diagnostic for a curation neighbor graph — a node
    * whose neighbors interconnect (coefficient → 1) sits in a tight
    * semantic clique; coefficient → 0 flags hub-like or noisy
    * neighborhoods.
    *
    * Shape: wedge enumeration as two equi-joins on the ordered edge
    * list (x<y<z, so every triangle is produced exactly once), then one
    * explode+count per corner. All joins are keyed on node ids — no
    * cartesian, and wedge count is Σ deg² which a bounded-degree graph
    * (kNN: deg ≤ k) keeps linear in edges. At cluster scale the edge
    * list pre-partitions by source node and the three corners count
    * map-side. Coefficient = 2·tri/(deg·(deg−1)) from exact longs, cast
    * to double at the division only (cross-engine hash-stable); nodes
    * of degree < 2 publish NULL — no wedge exists, the ratio is
    * undefined, not zero.
    *
    * @return (id, degree, n_triangles, clustering_coeff). */
  def triangleCounts(edges: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    // referenced 4× (two wedge sides, the closing probe, degrees) —
    // one bounded materialization, the pagerank pair-list pattern.
    // least/greatest NORMALIZES orientation instead of filtering it:
    // an edge supplied as (b, a) is the same undirected edge, and
    // silently dropping it would corrupt degrees and counts.
    val e = edges
      .select(least(col(idACol), col(idBCol)).as("a"),
        greatest(col(idACol), col(idBCol)).as("b"))
      .filter(col("a") < col("b")).distinct().materialized
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = wedges.join(e.as("e3"),
      col("x") === col("e3.a") && col("z") === col("e3.b"))
      .select("x", "y", "z")
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("id"), "left_outer")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_coeff",
        when(col("degree") >= 2,
          (lit(2L) * col("n_triangles")).cast("double")
            / (col("degree") * (col("degree") - 1)).cast("double")))
  }

  /** Winnowing fingerprints (public method — Schleimer, Wilkerson &
    * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — the MOSS algorithm): slide a window of `window`
    * consecutive `shingleN`-gram hashes over each document and record
    * the window's MINIMUM hash (rightmost occurrence on ties — the
    * paper's robust-winnowing tie rule), deduplicated. Guarantees every
    * shared substring of ≥ window+shingleN−1 tokens produces at least
    * one matching fingerprint, at ~2/(window+1) the density of the full
    * gram set — the local, position-aware upgrade of a global min-hash.
    *
    * Scale: one shingle-hash pass (the [[shingleHashRows]] map stage),
    * then a single per-doc ordered window — one shuffle on the doc id,
    * state bounded by `window`. No joins, nothing corpus-global; the
    * fingerprint set is what downstream overlap detection joins on,
    * at 1/Θ(window) the row count of raw gram matching.
    *
    * @return (idCol, fp_pos, fp_hash) distinct — fp_pos is the 0-based
    *   gram position the selected fingerprint starts at. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, window: Int = 4,
      portable: Boolean = true): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val grams = shingleHashRows(df, idCol, textCol, shingleN,
      portable = portable, keepPos = true)
    val w = Window.partitionBy("id").orderBy("tokpos")
    val wr = w.rowsBetween(Window.currentRow, window - 1)
    grams
      // windows that would run past the last gram emit nothing (the
      // paper's definition: exactly len - window + 1 windows per doc)
      .withColumn("__full", lead(col("h"), window - 1).over(w).isNotNull)
      // rightmost-min: lexicographic struct min on (hash, -pos)
      .withColumn("__sel",
        min(struct(col("h").as("h"), (-col("tokpos")).as("np"))).over(wr))
      .filter(col("__full"))
      .select(col("id").as(idCol),
        (-col("__sel.np")).cast("long").as("fp_pos"),
        col("__sel.h").as("fp_hash"))
      .distinct()
  }

  /** Document-overlap report over [[winnowFingerprints]] — the MOSS
    * output: pairs of documents sharing ≥ `minShared` distinct
    * fingerprint hashes, with the shared count. The winnowing guarantee
    * makes this a COMPLETE detector for overlaps of ≥ window+shingleN−1
    * tokens, at ~2/(window+1) the join fan-in of raw gram matching.
    *
    * Scale: the pair space is keyed by the fingerprint hash, and
    * `maxDocFreq` drops fingerprints appearing in more documents (the
    * boilerplate guard — same role as LSH's bucket cap), so a hash seen
    * in m docs fans out m² only up to the cap; everything else is
    * hash-keyed equi-joins + one (id_a, id_b) aggregate. */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, window: Int = 4, minShared: Int = 3,
      maxDocFreq: Int = 8, portable: Boolean = true): DataFrame = {
    // r20: the distinct fingerprint table is referenced THREE times in
    // this plan (the doc-frequency cut, and both sides of the pair
    // self-join) and DataFrame plans have no common-subtree reuse — the
    // full shingle-hash + winnow-window pass re-ran per reference.
    // Materialize it once (the pagerank pair-list pattern; at corpus
    // scale this table is the natural durable artifact of the MOSS
    // stage, like d2's shingles). Measured: d15 1.50 → 0.92 s at sf0.1
    // (local[32], min-of-5).
    val dh = winnowFingerprints(df, idCol, textCol, shingleN, window, portable)
      .select(col(idCol).as("id"), col("fp_hash")).distinct().materialized
    val rare = dh.groupBy("fp_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    val pr = dh.join(rare.select("fp_hash"), Seq("fp_hash"), "left_semi")
    pr.select(col("fp_hash"), col("id").as("id_a"))
      .join(pr.select(col("fp_hash"), col("id").as("id_b")), Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Incremental near-dup filter — the OPERATIONAL dedup shape at corpus
    * scale: a NEW ingest batch is deduplicated against the EXISTING
    * corpus (and against earlier batch members) without ever pairing the
    * corpus with itself. Returns the batch rows that survive.
    *
    * A batch document is dropped when an LSH candidate partner — any
    * corpus document, or a batch document with a SMALLER id — verifies
    * at true n-gram Jaccard ≥ `minJaccard`. "Corpus or earlier id" is
    * first-writer-wins ingestion semantics: representatives already in
    * the corpus stay authoritative, and within the batch the smallest id
    * of a dup group survives (independent of whether the earlier member
    * itself survives — each doc checks the same fixed partner set, so
    * the decision is per-row deterministic and order-free).
    *
    * Scale: the signature pass is per-document (one map + min-agg over
    * the UNION — at production scale the corpus band rows and distinct
    * shingle rows are precomputed once and stored alongside the corpus,
    * making per-batch cost O(batch + touched buckets); the plan shape
    * here is identical, just with the corpus side derived inline). The
    * candidate bucket join keeps the BATCH side on the right, so a
    * bucket holding c corpus + n batch docs emits c·n + n² candidate
    * rows — never the (c+n)² a full-corpus re-dedup would pay. The skew
    * guard (`maxBucketSize`, union-wide — same cap the full-corpus run
    * would apply) and the pair-keyed verification join carry over from
    * [[lshVerifiedPairs]] unchanged. */
  def incrementalNearDupFilter(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, minJaccard: Double = 0.8,
      k: Int = 16, bands: Int = 8, shingleN: Int = 2,
      portable: Boolean = true,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0")
    val rows = k / bands
    require(bands * rows == k, s"bands ($bands) must divide k ($k)")
    val all = corpus.select(col(idCol), col(textCol), lit(false).as("__new"))
      .unionByName(batch.select(col(idCol), col(textCol), lit(true).as("__new")))
    // r20: ONE shingle-hash pass feeds both the signature aggregation
    // and the verification join (the verify side previously re-ran
    // shingleHashRows over the same union — a full duplicate
    // tokenize+window-hash pass). Cached for the op's lifetime exactly
    // like lshRecallReport's shared rows; __new is functionally
    // dependent on id, so dropDuplicates(id, h) below yields the same
    // (id, h) set the plain pass produced. Measured: d13 1.66 → 1.49 s
    // at sf0.1 (min-of-5; the pass is cheap at test scale — the win is
    // the removed second corpus tokenize+hash pass, which at 100 TB is
    // a full map stage over the union).
    val hashed = shingleHashRows(all, idCol, textCol, shingleN,
        extra = Seq(col("__new")), portable = portable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = incrementalNearDupFilterCore(hashed, batch, idCol, minJaccard,
      k, bands, maxBucketSize)
    hashed.unpersist(blocking = false)
    out
  }

  /** [[incrementalNearDupFilter]] over PRE-COMPUTED shingle-hash rows
    * (id, h, __new) — the form the scaladoc above has always promised
    * at production scale: the corpus's distinct shingle rows are a
    * durable store artifact (d2's signature table), so a per-batch run
    * tokenizes NOTHING that is already ingested (r21 — this also
    * retires the corpus-scale MEMORY_AND_DISK cache the inline form
    * carries, the round-20 verdict's known trade: the artifact scan
    * replaces it). Rows may be deduplicated or raw — the signature
    * minima are duplicate-insensitive and the verify side deduplicates
    * itself. `batch` supplies the surviving rows' columns and must
    * cover exactly the ids flagged `__new`. */
  def incrementalNearDupFilterWithShingles(shingles: DataFrame,
      batch: DataFrame, idCol: String, minJaccard: Double = 0.8,
      k: Int = 16, bands: Int = 8,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0")
    require(bands * (k / bands) == k, s"bands ($bands) must divide k ($k)")
    incrementalNearDupFilterCore(shingles, batch, idCol, minJaccard,
      k, bands, maxBucketSize)
  }

  private def incrementalNearDupFilterCore(hashed: DataFrame,
      batch: DataFrame, idCol: String, minJaccard: Double,
      k: Int, bands: Int, maxBucketSize: Option[Int]): DataFrame = {
    val rows = k / bands
    val minAggs = (0 until k).map { i =>
      val a = (1103515245L * i + 12345L) % TA.P
      val b = (1234567891L * i + 987654321L) % TA.P
      min((lit(a) * col("h") + lit(b)) % lit(TA.P)).as(s"s_$i")
    }
    val sigs = hashed.groupBy("id", "__new").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), col("__new"),
        array((0 until k).map(i => col(s"s_$i")): _*).as("sig"))
    val buckets = sigs
      .select(col("id"), col("__new"), posexplode(TA.bandSigs(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val pruned = maxBucketSize match {
      case None => buckets
      case Some(m) =>
        val sizes = buckets.groupBy("band", "bucket").count().filter(col("count") <= m)
        buckets.join(sizes.select("band", "bucket"), Seq("band", "bucket"), "left_semi")
    }
    val a = pruned.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("__new").as("new_a"))
    val b = pruned.filter(col("__new"))
      .select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(!col("new_a") || col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // true-Jaccard verification, pair-keyed (the lshVerifiedPairs plan),
    // over the SAME cached shingle rows as the signature pass
    val ex = hashed.dropDuplicates("id", "h")
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val dropped = candidates
      .join(ex.select(col("id").as("id_a"), col("h")), Seq("id_a"))
      .join(ex.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .filter(col("n_inter").cast("double")
        / (col("n_a") + col("n_b") - col("n_inter")).cast("double") >= minJaccard)
      .select(col("id_b").as(idCol)).distinct()
      .materialized // bounded by the batch size; frees any caller cache
    batch.join(dropped, Seq(idCol), "left_anti")
  }

  /** The embedding near-dup pipeline: SRP-LSH bucket candidates → exact
    * cosine verification → transitive clustering → representative filter. */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95, planes: Int = 12): DataFrame = {
    val buckets = graft.ops.Similarity.srpBuckets(df, idCol, vecCol, planes)
    val withBucket = df.join(buckets.withColumnRenamed("id", idCol), Seq(idCol))
    val verified = embeddingNearDupPairs(withBucket, idCol, vecCol, Seq("bucket"), minCosine)
    dropDuplicateClusters(df, idCol, verified)
  }

  /** Embedding-cosine near-dup pairs within blocks (e.g. an LSH bucket or
    * coarse-cluster assignment): pairs with cosine ≥ threshold. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      blockCols: Seq[String], minCosine: Double): DataFrame = {
    // Norms are computed ONCE PER VECTOR before the pair join (per-pair
    // work is just the dot fold) — same float→double→fold values, so
    // bit-exactness vs the oracle is preserved.
    val s = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
        transform(col(vecCol), x => x.cast("double")).as("v"): _*)
      .withColumn("nrm", VA.norm(col("v")))
    val a = s.select(blockCols.map(col) :+ col("id").as("id_a")
      :+ col("v").as("v_a") :+ col("nrm").as("n_a"): _*)
    val b = s.select(blockCols.map(col) :+ col("id").as("id_b")
      :+ col("v").as("v_b") :+ col("nrm").as("n_b"): _*)
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VA.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
