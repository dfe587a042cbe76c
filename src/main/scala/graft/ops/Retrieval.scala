package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalytics => TA}
import graft.spark.Materialize.MaterializeOps

/** Ranked text retrieval for training-data pipelines: BM25 top-k — the
  * lexical complement of the embedding ANN operators in [[Similarity]]
  * (a corpus-curation stack needs both: ANN for semantic lookup, BM25
  * for exact-term lookup and hard-negative mining).
  *
  * Scale design: everything reduces to (doc, term) / (query, term) ROWS.
  *  - per-doc term stats: one explode + two hash aggregations with
  *    map-side partials (no per-doc arrays cross the wire);
  *  - document frequencies: one aggregation over (term, doc) pairs;
  *  - scoring: query terms ⋈ postings on `term` — the shuffle is
  *    O(postings of the query vocabulary), never O(corpus);
  *  - corpus-wide scalars (N, total length) ride a broadcast cross join.
  * Per-(query, doc) scores fold over the matched terms in SORTED term
  * order, so results are bit-deterministic on any cluster layout — and
  * with `idf = "odds"` every arithmetic step is an IEEE exactly-rounded
  * op (+ − × ÷ only, no transcendentals), which is what lets the DuckDB
  * oracle hash-match the scores float-for-float.
  */
object Retrieval {

  /** BM25 top-k: (qid, doc_id, score, rank), `rank <= k` per query,
    * ranked by score desc with doc_id tiebreak.
    *
    * @param idf `"lucene"` (default): ln((N − df + 0.5)/(df + 0.5) + 1) —
    *            the standard dampened idf for production ranking;
    *            `"odds"`: (N − df + 0.5)/(df + 0.5) — log-free so scores
    *            are bit-identical across engines (oracle-checked form).
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, qidCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      idf: String = "lucene"): DataFrame =
    bm25TopKWithPostings(bm25Postings(docs, idCol, textCol), queries,
      qidCol, qTextCol, k, k1, b, idf)

  /** The (doc_id, term, tf) postings table alone — BM25's inverted
    * index. Split out because a retrieval deployment materializes the
    * index once per corpus version and every query batch (plain BM25,
    * PRF, hybrid fusion) reads the same postings; recomputing the
    * corpus explode + aggregation per call is the single largest cost
    * of each retrieval operator. Derivable stats (per-doc length = Σ tf,
    * integer-exact in doubles; document frequency; corpus scalars) are
    * one cheap aggregation each on top, so only this table needs to be
    * stored. */
  def bm25Postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TA.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))

  /** [[bm25TopK]] against a PRE-COMPUTED postings table
    * ([[bm25Postings]] — or a stored copy of it). Per-doc length is
    * Σ_terms tf (≡ the token count, exact: integer-valued doubles far
    * below 2^53), so scores are bit-identical to the self-contained
    * form. */
  def bm25TopKWithPostings(tf: DataFrame, queries: DataFrame,
      qidCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      idf: String = "lucene"): DataFrame = {
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val gl = dl.agg(count(lit(1)).cast("double").as("n"),
      sum("dl").as("tot")) // token counts ≪ 2^53: the double sum is exact
    val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val qterms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(TA.tokens(col(qTextCol)))).as("term"))

    val idfC: Column = idf match {
      case "odds" => (col("n") - col("df") + 0.5) / (col("df") + 0.5)
      case "lucene" => log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      case other => sys.error(s"unknown idf variant $other")
    }
    // operand order written to match the oracle SQL token-for-token: every
    // op is exactly rounded, so identical order ⇒ identical bits
    val tfn = col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / (col("tot") / col("n"))))

    val contribs = qterms
      .join(tf, "term").join(dft, "term").join(dl, "doc_id")
      .crossJoin(broadcast(gl))
      .select(col("qid"), col("doc_id"),
        struct(col("term").as("t"), (idfC * tfn).as("c")).as("tc"))
    val scored = contribs.groupBy("qid", "doc_id")
      .agg(array_sort(collect_list(col("tc"))).as("tcs"))
      .select(col("qid"), col("doc_id"),
        aggregate(col("tcs"), lit(0.0), (acc, x) => acc + x.getField("c")).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "score", "rank")
  }

  /** BM25 with pseudo-relevance feedback (Rocchio-style query
    * expansion — public method): score once, take each query's top
    * `fbDocs` documents as pseudo-relevant, add the `fbTerms` terms with
    * the highest summed tf·idf mass in that feedback set (excluding the
    * original terms), and score again with the expanded query — the
    * classic recall lift for short/underspecified queries.
    *
    * Bit-determinism: both scoring passes fold contributions in sorted
    * term order ([[bm25TopK]]'s trick); expansion weights fold their
    * ≤fbDocs contributions in doc-id order; term selection ties break on
    * the term. Everything odds-idf (no log), so the oracle hash-matches.
    *
    * Scale: two posting-join passes, each bounded by the (expanded)
    * query vocabulary; the feedback set is queries × fbDocs rows; the
    * expansion candidate pool is the feedback docs' vocabularies, never
    * the corpus vocabulary.
    *
    * Plan note: the (doc, term) postings feed BOTH scoring passes plus
    * the expansion weights — five lazy references that would each replay
    * the corpus tokenize+explode+agg. The postings are persisted for the
    * op's lifetime instead; per-doc length comes from summing the cached
    * postings (Σ_terms tf ≡ token count, integer-exact in doubles), so
    * the explode runs ONCE total. The tiny chained intermediates
    * (feedback docs → expansion terms) and the bounded top-k result are
    * materialized eagerly so the first scoring pass never re-runs inside
    * the second, and the corpus-sized cache is released before returning.
    *
    * @return (qid, doc_id, score, rank), rank <= k by expanded score. */
  def bm25PrfTopK(docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, qidCol: String, qTextCol: String,
      k: Int, fbDocs: Int = 5, fbTerms: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = bm25Postings(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the returned frame is eagerly materialized inside, so the cache
    // can be released before handing back
    val out = bm25PrfTopKWithPostings(tf, queries, qidCol, qTextCol,
      k, fbDocs, fbTerms, k1, b)
    tf.unpersist(blocking = false)
    out
  }

  /** [[bm25PrfTopK]] against a PRE-COMPUTED postings table — callers
    * own the postings' lifecycle (persist/checkpoint/store); both
    * scoring passes, the feedback weights, and per-doc lengths all read
    * the given frame. Result is eagerly materialized (queries × k rows)
    * before returning, exactly like the self-contained form. */
  def bm25PrfTopKWithPostings(tf: DataFrame, queries: DataFrame,
      qidCol: String, qTextCol: String,
      k: Int, fbDocs: Int = 5, fbTerms: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // r20: dl is referenced by BOTH scoring passes plus gl, dft by both
    // passes plus the expansion weights — with no common-subtree reuse
    // each reference re-aggregated the full postings scan (6 extra
    // shuffles in the final plan). Both stats are bounded (one row per
    // doc / per term) — materialize each once per op call.
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl")).materialized
    val gl = dl.agg(count(lit(1)).cast("double").as("n"), sum("dl").as("tot"))
    val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .materialized
    val q0 = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(TA.tokens(col(qTextCol)))).as("term"))

    val idfC = (col("n") - col("df") + 0.5) / (col("df") + 0.5)
    val tfn = col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / (col("tot") / col("n"))))
    def scoreOf(qterms: DataFrame): DataFrame = qterms
      .join(tf, "term").join(dft, "term").join(dl, "doc_id")
      .crossJoin(broadcast(gl))
      .select(col("qid"), col("doc_id"),
        struct(col("term").as("t"), (idfC * tfn).as("c")).as("tc"))
      .groupBy("qid", "doc_id")
      .agg(array_sort(collect_list(col("tc"))).as("tcs"))
      .select(col("qid"), col("doc_id"),
        aggregate(col("tcs"), lit(0.0), (acc, x) => acc + x.getField("c")).as("score"))

    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    val fb = scoreOf(q0)
      .withColumn("r", row_number().over(w)).filter(col("r") <= fbDocs)
      .select("qid", "doc_id")
    val expTerms = fb
      .join(tf, "doc_id").join(dft, "term").crossJoin(broadcast(gl))
      .select(col("qid"), col("term"),
        struct(col("doc_id").as("d"), (col("tf") * idfC).as("c")).as("dc"))
      .groupBy("qid", "term")
      .agg(array_sort(collect_list(col("dc"))).as("dcs"))
      .select(col("qid"), col("term"),
        aggregate(col("dcs"), lit(0.0), (acc, x) => acc + x.getField("c")).as("wt"))
      .join(q0, Seq("qid", "term"), "left_anti") // never re-add original terms
      .withColumn("rw", row_number().over(
        Window.partitionBy("qid").orderBy(col("wt").desc, col("term"))))
      .filter(col("rw") <= fbTerms)
      .select("qid", "term")
      // queries × fbTerms rows — eager, so the pass-1 scoring chain above
      // is paid exactly once and never replays under the final pass
      .materialized
    scoreOf(q0.unionByName(expTerms))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "score", "rank")
      .materialized // queries × k rows; frees the postings reads
  }

  /** BM25 hard-negative mining (the lexical-negatives recipe of dense-
    * retriever training — Karpukhin et al., "Dense Passage Retrieval",
    * EMNLP'20, public method): per query, the top BM25 hits that are
    * NOT semantic neighbors of the query — cosine between the query's
    * and the candidate's embeddings below `maxCosine`. Lexically
    * confusable but semantically wrong is exactly the negative that
    * teaches a dense retriever to look past term overlap; filtering by
    * cosine guards against FALSE negatives (the lexical hit that is
    * actually relevant).
    *
    * Bit-determinism: BM25 scores via the odds-idf sorted fold
    * ([[bm25TopK]]), cosine via the index-ordered `graft_dot` fold over
    * pre-cast doubles — both already oracle-pinned shapes.
    *
    * Scale: the lexical candidate set bounds everything — cosines are
    * computed for queries × `kLex` candidate pairs via id equi-joins
    * against the embedding table, never corpus-wide; the final cut is
    * one bounded per-query window.
    *
    * @param emb embedding table; `embIdCol` must align with the doc id
    *            space of the postings.
    * @return (qid, doc_id, score, cosine, rank), rank ≤ k per query by
    *         BM25 score among surviving negatives. */
  def bm25HardNegativesWithPostings(tf: DataFrame, seeds: DataFrame,
      qidCol: String, qTextCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      kLex: Int, maxCosine: Double, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val VA = graft.functions.VectorAnalytics
    val lex = bm25TopKWithPostings(tf, seeds, qidCol, qTextCol, kLex, k1, b,
        idf = "odds")
      .filter(col("doc_id") =!= col("qid"))
      .drop("rank")
    val n = emb.select(col(embIdCol).as("__vid"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__nrm", sqrt(VA.dot(col("__v"), col("__v"))))
    lex
      .join(n.select(col("__vid").as("qid"), col("__v").as("__qv"),
        col("__nrm").as("__qn")), Seq("qid"))
      .join(n.select(col("__vid").as("doc_id"), col("__v").as("__cv"),
        col("__nrm").as("__cn")), Seq("doc_id"))
      .withColumn("cosine",
        VA.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
      .filter(col("cosine") < maxCosine)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "score", "cosine", "rank")
  }

  /** Self-contained form of [[bm25HardNegativesWithPostings]]. */
  def bm25HardNegatives(docs: DataFrame, seeds: DataFrame,
      idCol: String, textCol: String, qidCol: String, qTextCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      kLex: Int, maxCosine: Double, k: Int): DataFrame =
    bm25HardNegativesWithPostings(bm25Postings(docs, idCol, textCol), seeds,
      qidCol, qTextCol, emb, embIdCol, vecCol, kLex, maxCosine, k)

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09 —
    * public method): fuse N ranked lists into one, score(q, d) =
    * Σ_lists 1/(k0 + rank). The standard way to combine the lexical
    * ([[bm25TopK]]) and semantic ([[Similarity.bruteForceTopK]] /
    * `ivfTopK`) views of a corpus without score calibration — only
    * ranks cross lists, never raw scores.
    *
    * Bit-determinism: each contribution is one exactly-rounded IEEE
    * division; per-(query, doc) contributions fold in LIST-INDEX order
    * (same sorted-struct trick as [[bm25TopK]]), so the fused score is
    * bit-identical on any cluster layout and in the oracle.
    *
    * Scale: inputs are already top-k lists, so every stage is bounded by
    * queries × k × #lists rows — the union/agg/window never see corpus-
    * sized data.
    *
    * @param ranked ranked lists, each with columns (qid, doc_id, rank).
    * @return (qid, doc_id, rrf, rank), rank <= topK per query. */
  def rrfFuse(ranked: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    // ids keep their input types (string ids fuse fine); all lists must
    // agree on the qid/doc_id types or the union below rejects the plan
    val tagged = ranked.zipWithIndex.map { case (df, i) =>
      df.select(col("qid"), col("doc_id"),
        struct(lit(i).as("l"),
          (lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double"))).as("c")).as("tc"))
    }
    val fused = tagged.reduce(_ unionByName _)
      .groupBy("qid", "doc_id")
      .agg(array_sort(collect_list(col("tc"))).as("tcs"))
      .select(col("qid"), col("doc_id"),
        aggregate(col("tcs"), lit(0.0), (acc, x) => acc + x.getField("c")).as("rrf"))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= topK)
      .select("qid", "doc_id", "rrf", "rank")
  }
}
