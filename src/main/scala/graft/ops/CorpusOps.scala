package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalytics => TA}

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
    * The chunk-index `transform` re-evaluates the token split per chunk
    * (array HOFs are interpreted), costing O(T·chunks) per doc — fine
    * while chunks ≪ T; for pathological giant docs, pre-materialize the
    * token array via a subquery boundary. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0")
    val F = org.apache.spark.sql.functions // `size` param shadows functions.size
    val step = size - overlap
    val toks = TA.tokens(col(textCol))
    val nChunks = greatest(lit(1L),
      ceil((F.size(toks).cast("long") - overlap).cast("double") / step).cast("long"))
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0L), nChunks - 1), i =>
          concat_ws(" ", slice(toks, (i * step + 1).cast("int"), lit(size))))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_text"),
        F.size(TA.tokens(col("col"))).cast("long").as("n_tokens"))
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
    val spark = corpus.sparkSession
    val corpusGrams = Dedup.shingleHashRows(corpus, idCol, textCol, n, portable = portable)
    // cached: the benchmark grams feed three consumers (count, bloom
    // build, exact verify join) and are the deliberately small side
    val benchGrams = Dedup.shingleHashRows(benchmark, idCol, textCol, n, portable = portable)
      .select(col("id").as("__bench_id"), col("h").as("__bench_h"))
      .persist()
    val nGrams = benchGrams.count() // one job over the SMALL side only
    val bloom = benchGrams.stat.bloomFilter("__bench_h", math.max(1L, nGrams), fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    // a UDF is warranted here: no builtin expresses broadcast-Bloom
    // membership, and the filter runs map-side precisely to AVOID the
    // shuffle a join-based formulation would cost
    val mightContain = udf((h: Long) => bloomB.value.mightContainLong(h))
    val candidates = corpusGrams.filter(mightContain(col("h")))
    val hits = candidates
      .join(benchGrams, col("h") === col("__bench_h")
        && col("id") =!= col("__bench_id"), "left_semi")
      .select(col("id").as("__hit_id")).distinct().withColumn("__hit", lit(true))
    corpus
      .join(hits, col(idCol) === col("__hit_id"), "left_outer")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit_id", "__hit")
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
}
