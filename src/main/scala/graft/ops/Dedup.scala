package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalytics => TA, VectorAnalytics => VA}

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
    val rows = k / bands
    require(bands * rows == k, s"bands ($bands) must divide k ($k)")
    val hashes =
      if (portable) TA.shingleHashes(col(textCol), shingleN)
      else array_distinct(transform(TA.shingles(TA.tokens(col(textCol)), shingleN), xxhash64(_)))
    val sigs = df
      .filter(size(TA.tokens(col(textCol))) >= shingleN)
      .select(col(idCol).as("id"), TA.minhash(hashes, k).as("sig"))
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

  /** Per-document SimHash over token hashes (low `bits` bits). */
  def simhashes(df: DataFrame, idCol: String, textCol: String, bits: Int = 24): DataFrame =
    df.select(col(idCol).as("id"), TA.simhash(TA.tokenHashes(col(textCol)), bits).as("simhash"))

  /** SimHash near-dup pairs within blocks: pairs whose Hamming distance is
    * ≤ maxHamming. Blocked (blockCols) to keep the pair space linear. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxHamming: Int, bits: Int = 24): DataFrame = {
    val s = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
      TA.simhash(TA.tokenHashes(col(textCol)), bits).as("simhash"): _*)
    val a = s.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("simhash").as("sim_a"): _*)
    val b = s.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("simhash").as("sim_b"): _*)
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", TA.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for all pairs within blocks —
    * the precise verify stage downstream of LSH candidates. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int, minJaccard: Double): DataFrame = {
    val s = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
      TA.shingleHashes(col(textCol), n).as("sh"): _*)
    val a = s.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("sh").as("sh_a"): _*)
    val b = s.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("sh").as("sh_b"): _*)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-dup pairs within blocks (e.g. an LSH bucket or
    * coarse-cluster assignment): pairs with cosine ≥ threshold. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      blockCols: Seq[String], minCosine: Double): DataFrame = {
    val s = df.select((col(idCol).as("id") +: blockCols.map(col)) :+ col(vecCol).as("v"): _*)
    val a = s.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("v").as("v_a"): _*)
    val b = s.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("v").as("v_b"): _*)
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VA.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
