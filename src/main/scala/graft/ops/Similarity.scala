package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorAnalytics => VA}
import graft.spark.Materialize.MaterializeOps

/** Approximate-nearest-neighbor search over an embedding column
  * (builder-prompt extension surface).
  *
  * Three tiers, trading recall for scan cost:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the full corpus; Q·N·dim flops, one shuffle for the per-query top-k.
  *    The baseline and the verify oracle for the approximate tiers.
  *  - [[ivfTopK]]: IVF-style — partition the corpus by a coarse assignment
  *    (precomputed cluster / label column), probe only the `nprobe`
  *    partitions whose centroids are nearest the query. Scan cost drops to
  *    nprobe/K of the corpus; this is the 100 TB path (the coarse column
  *    becomes the parquet partition key, so pruning happens at the scan).
  *  - [[Dedup.minhashLshPairs]]-style SRP bucketing ([[srpBuckets]]):
  *    hash-join candidates only, no distance to most of the corpus.
  */
object Similarity {

  /** Exact cosine top-k: for each query row, the k nearest corpus rows
    * (excluding self-matches by id). Query side is broadcast — it is the
    * small side by construction. Ties broken by corpus id ascending.
    *
    * Plan-shape note (r21, the n7 audit): the non-equi pair join plans
    * as a BroadcastNestedLoopJoin whose BUILD side is the broadcast
    * QUERY set — bounded by the caller's contract (this op is the
    * exact/evaluation tier; every registered caller passes ≤ tens of
    * query rows). The streamed corpus side is never shuffled, so the
    * shape is scale-safe exactly as long as the query batch is
    * driver-broadcastable, which is the op's stated precondition. */
  /** (id, v: array<double>, nrm) projection — norms computed once per
    * vector, before any pair join (bit-exact: cast-then-fold, same as
    * computing them per pair). */
  private def normalized(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vAs: String, nAs: String): DataFrame =
    df.select(col(idCol).as(idAs), transform(col(vecCol), x => x.cast("double")).as(vAs))
      .withColumn(nAs, VA.norm(col(vAs)))

  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(normalized(queries, idCol, vecCol, "query_id", "qv", "qn"))
    val c = normalized(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VA.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Deterministic per-group centroids: fold the vectors in ascending
    * id order (bit-exact across engines), divide by count. Returns
    * (groupCol, centroid array<double>, n).
    *
    * Scale: a single `collect_list` over the group would materialize a hot
    * label's entire vector set in one row (OOM at 100× skew). Instead the
    * fold is HIERARCHICAL: vectors are chunked by their rank within the
    * group (row_number, so chunking is deterministic for any id type),
    * each chunk is folded in id order, then the chunk sums are folded in
    * chunk order. Per-row materialization is bounded by `chunkSize`
    * vectors (level 1) / #chunks partial sums (level 2) regardless of
    * group size. When every group fits one chunk the result is
    * bit-identical to the flat fold (the level-2 fold adds one term to an
    * exact 0.0), so oracle folds keep matching. */
  def centroids(df: DataFrame, groupCol: String, idCol: String, vecCol: String,
      chunkSize: Int = 1024): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol))
    val ranked = df
      .select(col(groupCol), col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chunk", floor((col("__rn") - 1) / chunkSize).cast("long"))
    // native elementwise-sum with the identical per-dim left fold as the
    // previous aggregate(zip_with(+)) HOF (see graft.spark.VecSum) — the
    // struct-strip transform is O(chunk) pointer work, the O(chunk·dim)
    // adds run in the codegen'd loop
    def foldSum(vs: Column) =
      call_function("graft_vecsum", transform(vs, sv => sv("v")))
    val chunkSums = ranked
      .groupBy(col(groupCol), col("__chunk"))
      .agg(sort_array(collect_list(struct(col("__rn").as("id"), col("__v").as("v")))).as("vs"))
      .select(col(groupCol), col("__chunk"), foldSum(col("vs")).as("cs"),
        size(col("vs")).cast("long").as("cnt"))
    chunkSums
      .groupBy(col(groupCol))
      .agg(
        sort_array(collect_list(struct(col("__chunk").as("id"), col("cs").as("v")))).as("vs"),
        sum("cnt").as("n"))
      .select(
        col(groupCol),
        VA.divide(foldSum(col("vs")), col("n").cast("double")).as("centroid"),
        col("n"))
  }

  /** IVF-style ANN: probe the `nprobe` groups whose centroids are nearest
    * each query (by cosine), then exact top-k within the probed groups.
    * `groupCol` is the coarse quantization — a cluster id, label, or any
    * partition key the corpus is laid out by.
    *
    * Plan-shape note (r21, the n7 audit): the probe-selection cross
    * join (`queries × centroids`) plans as a BroadcastNestedLoopJoin
    * whose BUILD side is the CENTROID table — exactly K rows (the
    * number of coarse cells, 20-32 here; thousands at most in any IVF
    * deployment), so the nested-loop side is bounded by construction
    * and the streamed query side never shuffles for it. The scoring
    * join's strategy is left to AQE — see the inline note. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, groupCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val cents = centroids(corpus, groupCol, idCol, vecCol)
      .withColumn("c_nrm", VA.norm(col("centroid")))
    val q = normalized(queries, idCol, vecCol, "query_id", "qv", "qn")
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("c_cos").desc, col(groupCol))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("c_cos", VA.dot(col("qv"), col("centroid")) / (col("qn") * col("c_nrm")))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col(groupCol))
    val c = corpus.select(col(groupCol), col(idCol).as("neighbor_id"),
        transform(col(vecCol), x => x.cast("double")).as("cv"))
      .withColumn("cn", VA.norm(col("cv")))
    // No broadcast hint on the probe side (r21): with a BOUNDED query
    // batch AQE broadcasts it at runtime anyway (its actual size is
    // known at the shuffle boundary), but when the caller evaluates the
    // WHOLE corpus as queries (the n13b recall sweep) the probe table is
    // queries × nprobe full vectors — a forced broadcast built a ~75 MB
    // driver-side hash relation per run (and at 100 TB would exceed the
    // 8 GB broadcast cap outright). AQE's size-based choice keeps the
    // bounded case a broadcast join and gives the corpus-sized case a
    // parallel shuffled join with skew splitting on the low-cardinality
    // cluster key.
    val scored = probes
      .join(c, Seq(groupCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VA.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Brute-force top-k over int8-QUANTIZED vectors — the memory-bound
    * scale path: codes are 4× smaller than float32 (8× than float64), so
    * 4× more corpus fits per executor and the scan is bandwidth-bound on
    * a quarter of the bytes. Quantized cosine is scale-free (the
    * per-vector scales cancel), and the integer MACs are exact in
    * doubles, so ranking is deterministic — quantization error is the
    * only approximation. Compose with [[ivfTopK]]'s probe pruning for the
    * full IVF-PQ-style pipeline; exact re-rank of the top candidates via
    * [[bruteForceTopK]] recovers full precision when needed. */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def prep(df: DataFrame, idAs: String, vAs: String, nAs: String): DataFrame =
      df.select(col(idCol).as(idAs),
          transform(col(vecCol), x => x.cast("double")).as("__v"))
        .withColumn("__s", VA.int8Scale(col("__v")))
        .withColumn(vAs, VA.quantizeInt8(col("__v"), col("__s")))
        .withColumn(nAs, sqrt(VA.dot(col(vAs), col(vAs))))
        .drop("__v", "__s")
    val q = broadcast(prep(queries, "query_id", "qa", "na"))
    val c = prep(corpus, "neighbor_id", "cv", "cn")
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos", VA.dot(col("qa"), col("cv")) / (col("na") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "qcos")
  }

  /** IVF probe pruning composed with int8-quantized scanning and an exact
    * re-rank — the IVF-PQ-style pipeline [[quantizedTopK]]'s scaladoc
    * promises. Three bounded stages:
    *
    *  1. probe: top-`nprobe` coarse partitions per query by exact cosine
    *     against the [[centroids]] (k_clusters rows, broadcast);
    *  2. quantized scan: int8 codes of the probed partitions only —
    *     nprobe/K of the corpus at a quarter of the float32 bandwidth —
    *     keep the top-`shortK` candidates per query (integer MACs are
    *     exact, so the shortlist is deterministic);
    *  3. exact re-rank: the Q×shortK shortlist (broadcast — it is tiny by
    *     construction) point-joins back to the full-precision vectors and
    *     the final top-`k` is ordered by exact double cosine.
    *
    * Recall is bounded by stages 1–2 (probe coverage × quantization); the
    * re-rank restores exact ORDERING within the candidates, which is what
    * production IVF-PQ deployments run. `shortK` defaults to 4·k.
    *
    * Scale: the corpus is scanned once (codes only, within probed
    * partitions); nothing all-pairs; the re-rank join's left side is
    * query-bounded. With the corpus parquet partitioned by `groupCol`,
    * stage 2's pruning happens at the scan. */
  def ivfQuantizedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, groupCol: String,
      k: Int, nprobe: Int, shortK: Int = 0): DataFrame = {
    val sk = if (shortK > 0) shortK else 4 * k
    require(sk >= k, s"shortK=$sk must be >= k=$k")
    val cents = centroids(corpus, groupCol, idCol, vecCol)
      .withColumn("c_nrm", VA.norm(col("centroid")))
    // query side: exact (qv, qn) for probing + int8 codes (qa, na) for
    // the quantized scan
    val q = normalized(queries, idCol, vecCol, "query_id", "qv", "qn")
      .withColumn("__s", VA.int8Scale(col("qv")))
      .withColumn("qa", VA.quantizeInt8(col("qv"), col("__s")))
      .withColumn("na", sqrt(VA.dot(col("qa"), col("qa"))))
      .drop("__s")
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("c_cos").desc, col(groupCol))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("c_cos", VA.dot(col("qv"), col("centroid")) / (col("qn") * col("c_nrm")))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nprobe)
      .select(col("query_id"), col("qa"), col("na"), col(groupCol))
    // corpus codes: the only full scan — int8 arrays, not the doubles
    val codes = corpus.select(col(groupCol), col(idCol).as("neighbor_id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__s", VA.int8Scale(col("__v")))
      .withColumn("qcv", VA.quantizeInt8(col("__v"), col("__s")))
      .withColumn("qcn", sqrt(VA.dot(col("qcv"), col("qcv"))))
      .select(col(groupCol), col("neighbor_id"), col("qcv"), col("qcn"))
    val shortW = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("neighbor_id"))
    val shortlist = broadcast(probes).join(codes, Seq(groupCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos", VA.dot(col("qa"), col("qcv")) / (col("na") * col("qcn")))
      .withColumn("q_rank", row_number().over(shortW))
      .filter(col("q_rank") <= sk)
      .select("query_id", "neighbor_id")
    // exact re-rank: shortlist is Q·shortK rows — broadcast it against the
    // corpus vectors so the corpus never shuffles
    val qe = normalized(queries, idCol, vecCol, "query_id", "qv", "qn")
    val ce = normalized(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    ce.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(qe), Seq("query_id"))
      .withColumn("cosine", VA.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Signed-random-projection bucket per row — join rows on `bucket` to
    * get cosine-similar candidate pairs without scanning the corpus. */
  def srpBuckets(df: DataFrame, idCol: String, vecCol: String, planes: Int): DataFrame =
    df.select(col(idCol).as("id"), VA.srpBucket(col(vecCol), planes).as("bucket"))

  /** Exact MUTUAL k-nearest-neighbor graph over the embedding column —
    * the edge set SemDeDup-style semantic clustering and graph-based
    * curation build on: an (a, b) edge exists iff b is among a's k
    * nearest AND a is among b's k nearest (the standard symmetrization
    * that drops hub-to-satellite edges a τ-ball graph keeps). Cosine is
    * direction-symmetric bit-exactly — the index-ordered dot fold
    * multiplies the same component pairs either way — so the mutual
    * join never disagrees with itself on the score.
    *
    * Scale: this is the EXACT O(n²/k)-edge formulation — the per-node
    * top-k window bounds the directed set to n·k rows, but the scoring
    * self-join is all-pairs (fine to the ~10⁶-vector range where one
    * side broadcasts; the bench plan runs it as a broadcast
    * nested-loop). Past that, block the self-join first: join on
    * [[srpBuckets]] (or a [[kmeans]] cell) per side so only same-bucket
    * pairs score, then take the same mutual top-k — the recall-vs-exact
    * gap of that composition is measurable with the n4-style recall
    * query. Ties break on neighbor id ascending, so the graph is
    * deterministic.
    *
    * @return (id_a, id_b, cosine) with id_a < id_b, one row per mutual
    *   edge — feeds [[graft.ops.Dedup.clusterPairs]] directly. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    // EAGER materialization of the bounded directed set (n·k rows, the
    // lshVerifiedPairs pattern): the mutual join references it twice, and
    // a lazy plan re-expands the all-pairs scoring + per-node window sort
    // under BOTH references — exchange reuse recovers some of it on the
    // bare query, but a composition that iterates over the edges (the
    // g4 clustering) measured 38% faster with the cut at sf0.1;
    // checkpointed blocks are GC-cleaned when the result drops from scope
    knnGraphFromDirected(knnDirected(df, idCol, vecCol, k).materialized)

  /** The symmetrization half of [[knnGraph]], over a PRE-COMPUTED
    * [[knnDirected]] frame — split out because the directed top-k lists
    * are the expensive quadratic stage and a curation pipeline computes
    * them ONCE per corpus version while several consumers (the mutual
    * graph, recall evaluations, semantic clustering) re-read them.
    * Callers own the directed frame's lifecycle and should pass it
    * MATERIALIZED (localCheckpoint / persisted table): the mutual join
    * references it twice, and a lazy plan re-expands the all-pairs
    * scoring under both references. */
  def knnGraphFromDirected(directed: DataFrame): DataFrame =
    directed.as("x")
      .join(directed.as("y"),
        col("x.id") === col("y.nbr") && col("x.nbr") === col("y.id"), "left_semi")
      .filter(col("x.id") < col("x.nbr"))
      .select(col("x.id").as("id_a"), col("x.nbr").as("id_b"), col("x.cosine"))

  /** One-step kNN LABEL PROPAGATION — the k-nearest-neighbor classifier
    * over a labeled seed set (Fix & Hodges 1951 / the standard
    * semi-supervised labeling move): each target row takes the majority
    * label of its k cosine-nearest SEEDS. The non-parametric sibling of
    * [[nearestCentroidClassify]]: centroids assume one convex region per
    * label, neighbor votes follow arbitrary label boundaries — the
    * labeling tool a curation pipeline uses to spread a small hand-
    * labeled domain/quality set over the corpus. Deterministic end to
    * end: neighbor rank breaks ties (cosine desc, seed id asc), the
    * vote breaks ties (count desc, label asc).
    *
    * Scale: this is the EXACT evaluation form — the scoring join is
    * targets × seeds (fine while one side broadcasts; seed sets are
    * small by construction). Past that, block the join by a learned
    * kmeans cell exactly as [[ivfTopK]]/n13b does for the same
    * recall-vs-cost trade, then apply the identical vote.
    *
    * @return (idCol, pred_label, votes) — one row per target with ≥ 1
    *   scored seed; `votes` = how many of the k neighbors carried the
    *   winning label. */
  def knnLabelPropagate(seeds: DataFrame, targets: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val t = normalized(targets, idCol, vecCol, "id", "tv", "tn")
    val s = normalized(seeds, idCol, vecCol, "nbr", "sv", "sn")
      .join(seeds.select(col(idCol).as("nbr"), col(labelCol).as("nbr_label")),
        Seq("nbr"))
    val w = Window.partitionBy("id").orderBy(col("cosine").desc, col("nbr"))
    val topk = t.join(s, col("id") =!= col("nbr"))
      .withColumn("cosine", VA.dot(col("tv"), col("sv")) / (col("tn") * col("sn")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("id", "nbr_label")
    val wv = Window.partitionBy("id").orderBy(col("votes").desc, col("nbr_label"))
    topk.groupBy("id", "nbr_label").agg(count(lit(1)).as("votes"))
      .withColumn("__r", row_number().over(wv)).filter(col("__r") === 1)
      .select(col("id").as(idCol), col("nbr_label").as("pred_label"), col("votes"))
  }

  /** Directed exact top-k neighbor lists — [[knnGraph]]'s first stage,
    * public because the recall evaluation needs the pre-mutualized
    * lists of BOTH the exact and the blocked path.
    * @return (id, nbr, cosine), k rows per id, ties on nbr ascending. */
  def knnDirected(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val a = normalized(df, idCol, vecCol, "id", "av", "an")
    val b = normalized(df, idCol, vecCol, "nbr", "bv", "bn")
    val w = Window.partitionBy("id").orderBy(col("cosine").desc, col("nbr"))
    a.join(b, col("id") =!= col("nbr"))
      .withColumn("cosine", VA.dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("id"), col("nbr"), col("cosine"))
  }

  /** SRP-blocked directed top-k — the 100 TB path [[knnGraph]]'s scaladoc
    * promises: the corpus side carries its [[srpBuckets]] signed-random-
    * projection bucket and the scoring join is EQUI-KEYED on it, so only
    * probed-bucket pairs score (expected pair count (probes/2^planes)·n²
    * instead of n²; the join is a plain hash join, broadcastable per
    * bucket). The query side probes its OWN bucket plus every Hamming-1
    * neighbor (each single plane-bit flipped — the standard multiprobe
    * recovery for near-hyperplane vectors, XOR being integer-exact in
    * both engines); a true neighbor ≥2 plane-flips away is still missed,
    * and that residual loss is exactly what the n13 evaluation measures
    * against [[knnDirected]] — the planes/probes tuning loop. A probed
    * pair is matched at most once (the neighbor lives in one bucket).
    * Nodes whose probed buckets hold fewer than k others return short
    * lists.
    *
    * `hamming` widens the probe ring: 1 = self + every single-bit flip
    * (planes+1 probes), 2 adds every two-bit flip (+C(planes,2)) — the
    * recovery for true neighbors split across TWO near-hyperplanes. The
    * measured operating points at sf0.01 (1k vecs, dim 64, k=5; n13b
    * pins the production one): planes=4/h=1 → 0.50 recall@5 scoring
    * 5/16 of pairs; planes=4/h=2 → 0.84 at 11/16; planes=6/h=2 → 0.62
    * at 22/64; planes=8/h=2 → 0.48 at 37/256. Scoring fraction scales
    * as probes/2^planes, so at corpus scale you hold the fraction and
    * buy recall with MORE PLANES + the wider ring (the recall-vs-cost
    * table lives in SCALE.md). */
  def knnDirectedBlocked(df: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int, hamming: Int = 1, tables: Int = 1): DataFrame = {
    require(hamming == 1 || hamming == 2, "hamming must be 1 or 2")
    require(tables >= 1, "tables must be >= 1")
    def ring(bk: Column): Seq[Column] =
      Seq(bk) ++
        (0 until planes).map(p => bk.bitwiseXOR(lit(1L << p))) ++
        (if (hamming >= 2)
          for { p <- 0 until planes; q <- (p + 1) until planes }
            yield bk.bitwiseXOR(lit((1L << p) | (1L << q)))
        else Nil)
    // table t hashes with plane family t·planes.. — L independent
    // tables; probe keys are (table, bucket) so the scoring join stays
    // a single equi-keyed hash join across all tables
    val a = normalized(df, idCol, vecCol, "id", "av", "an")
      .withColumn("pr", explode(array((0 until tables).flatMap { t =>
        ring(VA.srpBucket(col("av"), planes, t * planes)).map(bk =>
          struct(lit(t).as("t"), bk.as("b")))
      }: _*)))
      .select(col("id"), col("av"), col("an"),
        col("pr.t").as("tbl"), col("pr.b").as("bk"))
    val b = normalized(df, idCol, vecCol, "nbr", "bv", "bn")
      .withColumn("pr", explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"), VA.srpBucket(col("bv"), planes, t * planes).as("b"))
      }: _*)))
      .select(col("nbr"), col("bv"), col("bn"),
        col("pr.t").as("tbl"), col("pr.b").as("bk"))
    val w = Window.partitionBy("id").orderBy(col("cosine").desc, col("nbr"))
    // Score BEFORE any dedup: the candidate rows still carry both 64-dim
    // vectors, and pushing them through a dropDuplicates exchange moves
    // ~40× more bytes than the (id, nbr, cosine) triple — scoring first
    // shrinks the shuffle to the triple (measured 12.1 s → 3.9 s on the
    // n13 eval at sf0.1). With ONE table a pair matches at most once
    // (the neighbor lives in exactly one bucket and the probe ring is
    // duplicate-free), so no dedup runs at all; with L tables a
    // multiply-found candidate must occupy ONE rank, and the dedup keys
    // identical (id, nbr, cosine) values — same vectors, same dot — so
    // first-wins is value-deterministic.
    val scored = a.join(b, Seq("tbl", "bk")).filter(col("id") =!= col("nbr"))
      .withColumn("cosine", VA.dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .select("id", "nbr", "cosine")
    val uniq = if (tables > 1) scored.dropDuplicates("id", "nbr") else scored
    uniq
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("id"), col("nbr"), col("cosine"))
  }

  /** Deterministic Lloyd's k-means over the embedding column — trains the
    * coarse quantizer for [[ivfTopK]] when no natural partition column
    * exists. Initialization is the first k vectors by ascending id (no
    * RNG — reproducible across runs); distance is squared L2.
    *
    * Scale: each iteration is one broadcast of k centroids + a map-side
    * nearest-centroid assignment + the [[centroids]] hierarchical fold
    * for the new means — ONE array aggregate regardless of dimension (no
    * dim-wide column explosion at dim 768+), per-row materialization
    * bounded by the fold's chunk size, no driver-side data beyond k×dim
    * centroids. The sorted fold also makes every mean bit-deterministic
    * (id-ordered additions), so a SQL oracle can replay the full training
    * run exactly.
    *
    * @return (id, cluster) assignments; cluster ∈ [0, k). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 10): DataFrame =
    assignClusters(df, idCol, vecCol, kmeansCentroids(df, idCol, vecCol, k, iters))

  /** Nearest-centroid assignment against an already-trained codebook —
    * the consumer half of [[kmeans]], exposed separately because a real
    * pipeline trains the quantizer ONCE and many downstream stages
    * (IVF search, SemDeDup, balanced sampling, cluster keywords) assign
    * against the same centroids; retraining per consumer would repeat
    * the 2·iters driver-synced Lloyd jobs for an identical result
    * (training is deterministic). One broadcast-literal argmin map, no
    * shuffle.
    *
    * @return (id, cluster); cluster ∈ [0, cents.length). */
  def assignClusters(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Seq[Double]]): DataFrame = {
    val v = df.select(col(idCol).as("id"), transform(col(vecCol), x => x.cast("double")).as("v"))
    v.select(col("id"), nearestIdx(col("v"), cents).as("cluster"))
  }

  /** The kmeans TRAINING loop alone: returns the k learned centroids
    * (driver-side k×dim — bounded), for callers that need the CODEBOOK
    * rather than assignments (product quantization trains one per
    * subspace). [[kmeans]] delegates here, so training is one code path. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Seq[Double]] = {
    val v = df.select(col(idCol).as("id"), transform(col(vecCol), x => x.cast("double")).as("v"))
    // Training runs 2 jobs per Lloyd iteration (assign + mean fold) plus
    // the init scan — persist the projected working set once so those
    // 2·iters+1 actions read the (id, v) cache instead of rescanning the
    // source each time. MEMORY_AND_DISK: at 100 TB the projection is the
    // two columns only, and spilling a partition beats a full re-scan.
    v.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Seq[Double]] = v.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1))
    for (_ <- 1 to iters) {
      val assigned = v.withColumn("cluster", nearestIdx(col("v"), cents))
      val means = centroids(assigned, "cluster", "id", "v")
        .collect() // k rows of (cluster, mean, n) — driver-bounded
        .map(r => r.getAs[Int]("cluster") -> r.getSeq[Double](1)).toMap
      cents = cents.zipWithIndex.map { case (old, i) =>
        means.getOrElse(i, old) // empty cluster keeps its centroid
      }
    }
    // Drop the training cache before handing back — the caller's actions
    // re-derive the projection in a single scan, and no cache outlives us.
    v.unpersist(blocking = false)
    cents
  }

  /** TRUE product quantization top-k (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI'11 — public
    * method): split each vector into `m` subvectors, train an
    * independent `codebookK`-word kmeans codebook per subspace
    * ([[kmeansCentroids]]), encode the corpus as m small codes, and
    * answer queries by ASYMMETRIC DISTANCE COMPUTATION — each query
    * precomputes its m×K table of exact subspace distances ONCE, then
    * every corpus vector costs only m table lookups + (m−1) adds.
    *
    * This is the memory-bound ANN scale path beyond int8: codes are
    * m·⌈log2 K⌉ bits per vector (4 bytes here vs 256 for float32[64] —
    * 64× less scan bandwidth), and scan cost is independent of dim.
    * Compose with an IVF probe for partition pruning (as `n6` does for
    * the int8 variant), and exact re-rank of the shortlist when full
    * precision matters.
    *
    * Deterministic end to end: per-subspace training is the id-ordered
    * [[kmeansCentroids]] loop, encoding ties break first-wins, the ADC
    * sum adds subspace terms in ascending-s order — oracle-replayable.
    *
    * @return (query_id, rank, neighbor_id, adist) — adist the ADC
    *   estimate of squared L2, ascending. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      m: Int, codebookK: Int, kmIters: Int, k: Int): DataFrame =
    pqTopKWithCodebooks(corpus, queries, idCol, vecCol,
      pqCodebooks(corpus, idCol, vecCol, m, codebookK, kmIters), k)

  /** The PQ TRAINING half alone — m per-subspace codebooks of
    * `codebookK` words each (driver-side m×K×(dim/m) doubles, bounded).
    * Split out for the same reason as [[assignClusters]]: a pipeline
    * trains the codebooks once per corpus version, then encode/search
    * reuse them across consumers and query batches. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, codebookK: Int, kmIters: Int): IndexedSeq[Array[Seq[Double]]] = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val d = dim / m
    def sub(vc: Column, s: Int): Column =
      slice(transform(vc, x => x.cast("double")), lit(s * d + 1), lit(d))
    (0 until m).map { s =>
      kmeansCentroids(corpus.select(col(idCol), sub(col(vecCol), s).as("__sub")),
        idCol, "__sub", codebookK, kmIters)
    }
  }

  /** [[pqTopK]] against PRE-TRAINED codebooks ([[pqCodebooks]]). The
    * subspace width comes from the codebooks themselves — no corpus
    * probe job here (the self-contained form already paid one). */
  def pqTopKWithCodebooks(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      books: IndexedSeq[Array[Seq[Double]]], k: Int): DataFrame = {
    val m = books.length
    require(m > 0 && books.forall(_.nonEmpty), "need at least one non-empty codebook")
    val d = books.head.head.length
    require(books.forall(_.forall(_.length == d)),
      s"all codebook words must have the same subspace width $d")
    def sub(vc: Column, s: Int): Column =
      slice(transform(vc, x => x.cast("double")), lit(s * d + 1), lit(d))
    val enc = corpus.select(col(idCol).as("neighbor_id") +:
      (0 until m).map(s => nearestIdx(sub(col(vecCol), s), books(s)).as(s"__c$s")): _*)
    // ADC tables ride the (broadcast) query side: m×K exact subspace
    // distances per query, computed once — the per-pair work below is
    // lookups only, never an l2 over the vectors
    val q = broadcast(queries.select(
      Seq(col(idCol).as("query_id")) ++
      (0 until m).map(s => array(books(s).map(c =>
        call_function("graft_l2sq", sub(col(vecCol), s),
          array(c.map(lit(_)): _*))): _*).as(s"__t$s")): _*))
    val adist = (0 until m)
      .map(s => element_at(col(s"__t$s"), col(s"__c$s") + 1))
      .reduce(_ + _) // ascending-s left fold — mirrored by the oracle
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    q.join(enc, col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adist")
  }

  /** Nearest-centroid (Rocchio) classifier: label each test vector with
    * the label whose TRAIN-set centroid is squared-L2-nearest — the
    * model-free domain/topic classifier a curation pipeline runs when it
    * has a few labeled seed sets and a large unlabeled corpus (label
    * propagation for mixture bookkeeping, not model-grade accuracy).
    *
    * Deterministic: centroids fold id-ordered ([[centroids]]), argmin
    * ties break on the label — an oracle replays it bit-exactly.
    *
    * Scale: centroids is one grouped pass over train (chunk-bounded
    * state); scoring BROADCASTS the #labels centroid rows against the
    * test scan (native `graft_l2sq` per pair), so nothing shuffles on
    * vector content; the per-vector argmin is a #labels-bounded window.
    *
    * @return (idCol, labelCol, pred_<labelCol>, correct). */
  def nearestCentroidClassify(train: DataFrame, test: DataFrame,
      idCol: String, vecCol: String, labelCol: String): DataFrame = {
    val cents = centroids(train, labelCol, idCol, vecCol)
      .select(col(labelCol).as("__plabel"), col("centroid"))
    val t = test.select(col(idCol).as("__id"), col(labelCol).as("__label"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val w = Window.partitionBy("__id").orderBy(col("__dist"), col("__plabel"))
    t.crossJoin(broadcast(cents))
      .withColumn("__dist", call_function("graft_l2sq", col("__v"), col("centroid")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__label").as(labelCol),
        col("__plabel").as(s"pred_$labelCol"),
        (col("__plabel") === col("__label")).as("correct"))
  }

  /** Cluster-balanced (topic-balanced) subsample: assign every vector to
    * a learned [[kmeans]] cluster, then keep the `perCluster` rows of each
    * cluster with the smallest portable-hash of their id — the embedding-
    * space counterpart of [[CorpusOps.stratifiedSample]]. This is the
    * data-mixing step that keeps a subsampled training corpus TOPICALLY
    * balanced instead of letting the head topics dominate a uniform draw.
    *
    * Deterministic end to end (kmeans init/means are id-ordered and the
    * pick order is the portable hash), so an oracle can replay it.
    *
    * Scale: kmeans cost is the trainer's (k·dim driver state only); the
    * sample itself is one shuffle on the cluster id + per-partition
    * top-k — no global sort, no RNG state.
    *
    * @return (idCol, cluster) of kept rows. */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, perCluster: Int): DataFrame =
    clusterBalancedSampleWithLabels(
      kmeans(df, idCol, vecCol, k, iters).withColumnRenamed("id", idCol),
      idCol, perCluster)

  /** [[clusterBalancedSample]] over PRE-COMPUTED (idCol, cluster)
    * labels — the form a pipeline uses when one trained quantizer
    * serves several consumers (see [[assignClusters]]). */
  def clusterBalancedSampleWithLabels(labels: DataFrame, idCol: String,
      perCluster: Int): DataFrame =
    CorpusOps.stratifiedSample(
      labels.select(col(idCol), col("cluster")),
      Seq("cluster"), idCol, perCluster)

  /** Index of the nearest centroid (squared L2, first-wins ties).
    *
    * Centroids are plan-time literals, so the k distances unroll into k
    * native `graft_l2sq` calls — a codegen'd subtract-multiply-add loop
    * per centroid with the same fold order as the previous HOF form
    * (`aggregate(zip_with(...))`), which interpreted three lambda frames
    * per element and made assignment the kmeans-training hot path.
    * Bit-identical results (same op sequence), ~an order of magnitude
    * less per-row overhead at k·dim scale. */
  private def nearestIdx(v: Column, cents: Array[Seq[Double]]): Column = {
    val dists = array(cents.map(c =>
      call_function("graft_l2sq", v, array(c.map(lit(_)): _*))): _*)
    array_position(dists, array_min(dists)).cast("int") - 1
  }
}
