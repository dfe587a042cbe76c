package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{CorpusOps, Dedup, Retrieval, Similarity}

/** The SQL table-function surface must return EXACTLY what the Scala API
  * returns — same rows, same values — and compose with ordinary SQL
  * (outer filters, CTAS, INSERT bodies, store-table name resolution). */
class TableFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  private def sess() = graft.GraftSession(spark,
    Files.createTempDirectory("graft_tf").toString, 2)

  /** Order-insensitive row comparison (same plan ⇒ same values, but the
    * SQL path may emit partitions in a different order). */
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("graft_neardup_filter: SQL call equals Dedup.nearDupFilter") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    val viaSql = g.sql(
      "SELECT * FROM TABLE(graft_neardup_filter(docs_tf, 'doc_id', 'text', 0.8))").get
    val viaApi = Dedup.nearDupFilter(docs, "doc_id", "text", minJaccard = 0.8)
    assert(rows(viaSql) == rows(viaApi))
    // composes: an outer filter applies to the op's result like any view
    val filtered = g.sql("SELECT doc_id FROM TABLE(graft_neardup_filter(" +
      "docs_tf, 'doc_id', 'text', 0.8)) WHERE doc_id < 100").get
    assert(rows(filtered) ==
      rows(viaApi.filter(col("doc_id") < 100).select("doc_id")))
  }

  test("graft_decontaminate: SQL call equals CorpusOps.decontaminate") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    docs.filter(col("doc_id") % 10 === 0).createOrReplaceTempView("bench_tf")
    val viaSql = g.sql("SELECT doc_id, contaminated FROM TABLE(" +
      "graft_decontaminate(docs_tf, bench_tf, 'doc_id', 'text', 8))").get
    val viaApi = CorpusOps
      .decontaminate(docs, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
      .select("doc_id", "contaminated")
    assert(rows(viaSql) == rows(viaApi))
  }

  test("graft_bm25_topk: SQL call equals Retrieval.bm25TopK") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    docs.filter(col("doc_id") < 5).createOrReplaceTempView("queries_tf")
    val viaSql = g.sql("SELECT * FROM TABLE(graft_bm25_topk(" +
      "docs_tf, queries_tf, 'doc_id', 'text', 'doc_id', 'text', 5))").get
    val viaApi = Retrieval.bm25TopK(docs, docs.filter(col("doc_id") < 5),
      "doc_id", "text", "doc_id", "text", k = 5)
    assert(rows(viaSql) == rows(viaApi))
  }

  test("graft_kmeans_ivf_topk: SQL call equals the kmeans + ivfTopK pipeline") {
    val g = sess()
    embs.createOrReplaceTempView("embs_tf")
    embs.filter(col("vec_id") < 10).createOrReplaceTempView("eq_tf")
    val viaSql = g.sql("SELECT * FROM TABLE(graft_kmeans_ivf_topk(" +
      "embs_tf, eq_tf, 'vec_id', 'embedding', 8, 3, 5, 2))").get
    val km = Similarity.kmeans(embs, "vec_id", "embedding", k = 8, iters = 3)
      .withColumnRenamed("id", "vec_id")
    val viaApi = Similarity.ivfTopK(embs.join(km, Seq("vec_id")),
      embs.filter(col("vec_id") < 10), "vec_id", "embedding", "cluster",
      k = 5, nprobe = 2)
    assert(rows(viaSql) == rows(viaApi))
  }

  test("graft_token_budget_mix: SQL call equals CorpusOps.tokenBudgetMix") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    // default budget omitted: unlisted sources pass through whole
    val viaSql = g.sql("SELECT * FROM TABLE(graft_token_budget_mix(" +
      "docs_tf, 'doc_id', 'text', 'source', 'src0=200,src1=100'))").get
    val viaApi = CorpusOps.tokenBudgetMix(docs, "doc_id", "text", "source",
      Map("src0" -> 200L, "src1" -> 100L))
    assert(rows(viaSql) == rows(viaApi))
    // explicit default budget caps every unlisted source
    val viaSqlDef = g.sql("SELECT * FROM TABLE(graft_token_budget_mix(" +
      "docs_tf, 'doc_id', 'text', 'source', 'src0=200', 50))").get
    val viaApiDef = CorpusOps.tokenBudgetMix(docs, "doc_id", "text", "source",
      Map("src0" -> 200L), defaultBudget = 50L)
    assert(rows(viaSqlDef) == rows(viaApiDef))
  }

  test("remaining table functions each equal their Scala API call") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    docs.filter(col("doc_id") % 10 === 0).createOrReplaceTempView("bench_tf")
    embs.createOrReplaceTempView("embs_tf")
    embs.filter(col("vec_id") < 10).createOrReplaceTempView("eq_tf")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_epoch_mix(" +
      "docs_tf, 'doc_id', 'text', 'source', 'src0=2000,src1=100'))").get) ==
      rows(CorpusOps.epochMix(docs, "doc_id", "text", "source",
        Map("src0" -> 2000L, "src1" -> 100L))))
    assert(rows(g.sql("SELECT doc_id, contaminated FROM TABLE(" +
      "graft_decontaminate_bloom(docs_tf, bench_tf, 'doc_id', 'text', 8))").get) ==
      rows(CorpusOps.decontaminateBloom(docs,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
        .select("doc_id", "contaminated")))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_neardup_pairs(" +
      "docs_tf, 'doc_id', 'text', 0.8))").get) ==
      rows(Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.8)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_chunk(" +
      "docs_tf, 'doc_id', 'text', 32, 8))").get) ==
      rows(CorpusOps.chunk(docs, "doc_id", "text", size = 32, overlap = 8)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_brute_topk(" +
      "embs_tf, eq_tf, 'vec_id', 'embedding', 5))").get) ==
      rows(Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_bm25_prf_topk(" +
      "docs_tf, bench_tf, 'doc_id', 'text', 'doc_id', 'text', 5, 3, 8))").get) ==
      rows(Retrieval.bm25PrfTopK(docs, docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", "doc_id", "text", k = 5, fbDocs = 3, fbTerms = 8)))
    assert(rows(g.sql("SELECT vec_id FROM TABLE(graft_semantic_dedup(" +
      "embs_tf, 'vec_id', 'embedding', 0.99))").get) ==
      rows(Dedup.semanticDedup(embs, "vec_id", "embedding", minCosine = 0.99)
        .select("vec_id")))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_nb_classify(" +
      "docs_tf, bench_tf, 'doc_id', 'text', 'source', 500))").get) ==
      rows(CorpusOps.nbClassifyBits(docs, docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", "source", vocabSize = 500)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_dsir_select(" +
      "docs_tf, bench_tf, 'doc_id', 'text', 20))").get) ==
      rows(CorpusOps.dsirSelect(docs, docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", k = 20)))
    docs.filter(col("doc_id") % 10 =!= 0).createOrReplaceTempView("pool_tf")
    val incSql = g.sql("SELECT doc_id FROM TABLE(graft_incremental_neardup(" +
      "pool_tf, bench_tf, 'doc_id', 'text', 0.3))").get
    assert(rows(incSql) ==
      rows(Dedup.incrementalNearDupFilter(docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", minJaccard = 0.3)
        .select("doc_id")))
    assert(incSql.count() > 0)
    val pairsG3 = Dedup.minhashLshPairs(docs, "doc_id", "text", k = 16,
      bands = 8, shingleN = 2, maxBucketSize = Some(8)).select("id_a", "id_b")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_cluster_reps(" +
      "docs_tf, 'doc_id', 'text'))").get) ==
      rows(Dedup.clusterRepresentatives(pairsG3,
        docs.select(col("doc_id"),
          graft.functions.TextAnalytics.qualityScore(col("text")).as("q")),
        "doc_id", "q")))
    // explicit score column: n_chars stands in for a model-made score
    assert(rows(g.sql("SELECT * FROM TABLE(graft_cluster_reps(" +
      "docs_tf, 'doc_id', 'text', 'n_chars'))").get) ==
      rows(Dedup.clusterRepresentatives(pairsG3,
        docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars")))
    assert(rows(g.sql("SELECT doc_id, split FROM TABLE(graft_hash_split(" +
      "docs_tf, 'doc_id'))").get) ==
      rows(CorpusOps.hashSplit(docs, "doc_id").select("doc_id", "split")))
    assert(rows(g.sql("SELECT doc_id, split FROM TABLE(graft_hash_split(" +
      "docs_tf, 'doc_id', 'tr=1,te=1'))").get) ==
      rows(CorpusOps.hashSplit(docs, "doc_id", Seq(("tr", 1), ("te", 1)))
        .select("doc_id", "split")))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_temperature_mix(" +
      "docs_tf, 'doc_id', 'text', 'source', 500))").get) ==
      rows(CorpusOps.temperatureMix(docs, "doc_id", "text", "source",
        totalBudget = 500L)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_knn_graph(" +
      "embs_tf, 'vec_id', 'embedding', 3))").get) ==
      rows(Similarity.knnGraph(embs, "vec_id", "embedding", k = 3)))
    assert(rows(g.sql("SELECT doc_id, shard, pos FROM TABLE(graft_shuffle_shards(" +
      "docs_tf, 'doc_id', 4))").get) ==
      rows(CorpusOps.shuffleShards(docs, "doc_id", 4)
        .select("doc_id", "shard", "pos")))
    assert(rows(g.sql("SELECT doc_id, lang FROM TABLE(graft_quality_retention(" +
      "docs_tf, 'doc_id', 'text', 'lang', 0.5))").get) ==
      rows(CorpusOps.qualityRetention(docs, "doc_id", "text", "lang", 0.5)
        .select("doc_id", "lang")))
    assert(rows(g.sql("SELECT doc_id, phase FROM TABLE(graft_curriculum(" +
      "docs_tf, 'doc_id', 'text', 4, 100))").get) ==
      rows(CorpusOps.curriculum(docs, "doc_id", "text", 4, 100)
        .select("doc_id", "phase")))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_winnow_overlap(" +
      "docs_tf, 'doc_id', 'text', 3, 4, 2, 8))").get) ==
      rows(Dedup.winnowOverlapPairs(docs, "doc_id", "text",
        shingleN = 3, window = 4, minShared = 2, maxDocFreq = 8)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_bpe_tokenize(" +
      "docs_tf, 'text', 6))").get) ==
      rows(CorpusOps.bpeSubwordHistogram(docs, "text", numMerges = 6)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_hash_tfidf(" +
      "docs_tf, 'doc_id', 'text', 16))").get) ==
      rows(CorpusOps.hashingTfidf(docs, "doc_id", "text", dim = 16)))
    // pagerank composes over the pair table another table function made
    Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").createOrReplaceTempView("prpairs_tf")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_pagerank(" +
      "prpairs_tf, 3, 0.85))").get) ==
      rows(Dedup.pagerankCentrality(
        Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.5)
          .select("id_a", "id_b"), iters = 3, damping = 0.85)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_triangles(" +
      "prpairs_tf))").get) ==
      rows(Dedup.triangleCounts(
        Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.5)
          .select("id_a", "id_b"))))
    // the artifact catalog: SQL listing equals the Scala listing, and
    // building an artifact makes it appear (the session shares one
    // JVM-scoped root, so force at least one artifact to exist)
    graft.store.Artifacts.table(spark, "tfspec", "k1", Seq("id")) {
      docs.select("doc_id").limit(3).toDF("id")
    }
    assert(rows(g.sql("SELECT * FROM TABLE(graft_artifacts())").get) ==
      rows(graft.store.Artifacts.listing(spark)))
    assert(graft.store.Artifacts.listing(spark)
      .collect().exists(_.getString(0).startsWith("artifact_tfspec_")))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_winnow_fp(" +
      "docs_tf, 'doc_id', 'text', 3, 4))").get) ==
      rows(Dedup.winnowFingerprints(docs, "doc_id", "text",
        shingleN = 3, window = 4)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_dup_spans(" +
      "docs_tf, 'doc_id', 'text', 3))").get) ==
      rows(Dedup.duplicatedSpans(docs, "doc_id", "text", n = 3)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_cut_spans(" +
      "docs_tf, 'doc_id', 'text', 3))").get) ==
      rows(Dedup.cutSpans(docs, "doc_id", "text",
        Dedup.duplicatedSpans(docs, "doc_id", "text", n = 3))))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_semdedup_kmeans(" +
      "embs_tf, 'vec_id', 'embedding', 0.2, 8, 3))").get) ==
      rows(Dedup.semDedupKmeans(embs, "vec_id", "embedding", 0.2,
        kClusters = 8, iters = 3)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_containment_pairs(" +
      "docs_tf, 'doc_id', 'text', 0.3))").get) ==
      rows(Dedup.lshContainmentPairs(docs, "doc_id", "text", 0.3)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_pps_sample(" +
      "docs_tf, 'doc_id', 'n_chars', 50))").get) ==
      rows(CorpusOps.ppsSample(docs, "doc_id", "n_chars", n = 50)))
    val kmLabels = Similarity.kmeans(embs, "vec_id", "embedding", k = 8, iters = 3)
    kmLabels.createOrReplaceTempView("klabels_tf")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_cluster_keywords(" +
      "docs_tf, klabels_tf, 'doc_id', 'text', 8, 5))").get) ==
      rows(CorpusOps.clusterKeywords(docs, "doc_id", "text", kmLabels,
        kClusters = 8, topM = 5)))
    val shEv = Dedup.shingleRows(docs, "doc_id", "text", shingleN = 2)
    assert(rows(g.sql("SELECT * FROM TABLE(graft_edit_pairs(" +
      "docs_tf, 'doc_id', 'text', 0.3))").get) ==
      rows(Dedup.lshEditVerifiedPairs(docs, shEv, "doc_id", "text",
        minSim = 0.3)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_minhash_est(" +
      "docs_tf, 'doc_id', 'text'))").get) ==
      rows(Dedup.minhashEstimationReport(shEv)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_ngram_novelty(" +
      "docs_tf, 'doc_id', 'text', 5))").get) ==
      rows(Dedup.ngramNovelty(docs, "doc_id", "text", n = 5)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_source_divergence(" +
      "docs_tf, 'text', 'source', 500))").get) ==
      rows(CorpusOps.sourceDivergenceBits(docs, "text", "source",
        vocabSize = 500)))
    embs.filter(col("vec_id") % 4 === 0).createOrReplaceTempView("eseed_tf")
    embs.filter(col("vec_id") % 4 =!= 0).createOrReplaceTempView("etgt_tf")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_knn_classify(" +
      "eseed_tf, etgt_tf, 'vec_id', 'embedding', 'label', 5))").get) ==
      rows(Similarity.knnLabelPropagate(embs.filter(col("vec_id") % 4 === 0),
        embs.filter(col("vec_id") % 4 =!= 0),
        "vec_id", "embedding", "label", k = 5)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_bpe_fertility(" +
      "docs_tf, 'text', 'lang', 6))").get) ==
      rows(CorpusOps.bpeFertility(docs, "text", "lang", numMerges = 6)))
  }

  test("graft_hard_negatives: SQL call equals Retrieval.bm25HardNegatives") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    embs.createOrReplaceTempView("embs_tf")
    docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
      .createOrReplaceTempView("seeds_tf")
    val viaApi = Retrieval.bm25HardNegatives(docs,
      docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), col("text").as("qtext")),
      "doc_id", "text", "qid", "qtext",
      embs, "vec_id", "embedding", kLex = 20, maxCosine = 0.1, k = 10)
    assert(rows(g.sql("SELECT * FROM TABLE(graft_hard_negatives(" +
      "docs_tf, seeds_tf, embs_tf, 'doc_id', 'text', 'qid', 'qtext', " +
      "'vec_id', 'embedding', 20, 0.1, 10))").get) == rows(viaApi))
    // the false-negative guard binds: every survivor is dissimilar
    assert(viaApi.filter(col("cosine") >= 0.1).count() == 0)
  }

  test("With* artifact forms equal their self-contained ops bit-for-bit") {
    // the shared-artifact split (shingle table / postings / codebooks)
    // must be invisible in results — same rows, same values
    val ex = Dedup.shingleRows(docs, "doc_id", "text", shingleN = 2)
    assert(rows(Dedup.lshVerifiedPairsWithShingles(ex, 0.3,
        k = 16, bands = 8, maxBucketSize = Some(8))) ==
      rows(Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.3,
        k = 16, bands = 8, shingleN = 2, maxBucketSize = Some(8))))
    assert(rows(Dedup.lshContainmentPairsWithShingles(ex, 0.3,
        k = 16, bands = 8, maxBucketSize = Some(8))) ==
      rows(Dedup.lshContainmentPairs(docs, "doc_id", "text", 0.3,
        k = 16, bands = 8, shingleN = 2, maxBucketSize = Some(8))))
    val tf = Retrieval.bm25Postings(docs, "doc_id", "text")
    val seeds = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    assert(rows(Retrieval.bm25TopKWithPostings(tf, seeds,
        "qid", "qtext", k = 10, idf = "odds")) ==
      rows(Retrieval.bm25TopK(docs, seeds, "doc_id", "text",
        "qid", "qtext", k = 10, idf = "odds")))
    val cents = Similarity.kmeansCentroids(embs, "vec_id", "embedding",
      k = 8, iters = 3)
    assert(rows(Similarity.assignClusters(embs, "vec_id", "embedding", cents)) ==
      rows(Similarity.kmeans(embs, "vec_id", "embedding", k = 8, iters = 3)))
  }

  test("graft_funnel / graft_cohorts: SQL calls equal EventAnalytics") {
    val g = sess()
    val ev = graft.Tables.events(spark, dir)
    ev.createOrReplaceTempView("events_tf")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_funnel(events_tf, " +
      "'user_id', 'event_type', 'ts', 'signup,click,purchase'))").get) ==
      rows(graft.ops.EventAnalytics.funnelSteps(ev, "user_id", "event_type",
        "ts", Seq("signup", "click", "purchase"))))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_funnel(events_tf, " +
      "'user_id', 'event_type', 'ts', 'signup,click,purchase', " +
      "86400000000))").get) ==
      rows(graft.ops.EventAnalytics.funnelSteps(ev, "user_id", "event_type",
        "ts", Seq("signup", "click", "purchase"),
        maxGapUs = Some(86400000000L))))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_funnel_gaps(events_tf, " +
      "'user_id', 'event_type', 'ts', 'signup,click,purchase'))").get) ==
      rows(graft.ops.EventAnalytics.funnelTransitionStats(ev, "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"))))
    // the bot-capped production forms (st4d/st4e) from SQL: 7th arg
    assert(rows(g.sql("SELECT * FROM TABLE(graft_funnel(events_tf, " +
      "'user_id', 'event_type', 'ts', 'signup,click,purchase', " +
      "86400000000, 8))").get) ==
      rows(graft.ops.EventAnalytics.funnelSteps(ev, "user_id", "event_type",
        "ts", Seq("signup", "click", "purchase"),
        maxGapUs = Some(86400000000L), maxEventsPerUser = Some(8))))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_funnel_gaps(events_tf, " +
      "'user_id', 'event_type', 'ts', 'signup,click,purchase', " +
      "86400000000, 8))").get) ==
      rows(graft.ops.EventAnalytics.funnelTransitionStats(ev, "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"),
        maxGapUs = Some(86400000000L), maxEventsPerUser = Some(8))))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_event_paths(events_tf, " +
      "'user_id', 'event_type', 'ts', 4, 20))").get) ==
      rows(graft.ops.EventAnalytics.topEventPaths(ev, "user_id",
        "event_type", "ts", depth = 4, topN = 20)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_transitions(events_tf, " +
      "'user_id', 'event_type', 'ts'))").get) ==
      rows(graft.ops.EventAnalytics.eventTransitionMatrix(ev, "user_id",
        "event_type", "ts")))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_cohorts(events_tf, " +
      "'user_id', 'ts'))").get) ==
      rows(graft.ops.EventAnalytics.cohortRetention(ev, "user_id", "ts")))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_dau_mau(events_tf, " +
      "'user_id', 'ts', 7))").get) ==
      rows(graft.ops.EventAnalytics.dauMau(ev, "user_id", "ts", window = 7)))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_dau_mau_hll(events_tf, " +
      "'user_id', 'ts', 7))").get) ==
      rows(graft.ops.EventAnalytics.dauMauApprox(ev, "user_id", "ts", window = 7)))
  }

  test("graft_asof_join / graft_range_join: SQL calls equal TemporalJoins") {
    val g = sess()
    val ev = graft.Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts_us")
    val views = graft.ops.DedupLatest(
      ev.filter(col("event_type") === "view")
        .select("user_id", "event_id", "ts_us", "value"),
      Seq("user_id", "ts_us"), Seq(col("event_id").desc))
    clicks.createOrReplaceTempView("clicks_tf")
    views.createOrReplaceTempView("views_tf")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_asof_join(clicks_tf, " +
      "views_tf, 'user_id', 'ts_us', 'event_id=view_event_id,value=view_value'))").get) ==
      rows(graft.ops.TemporalJoins.asofBackward(clicks, views,
        Seq("user_id"), "ts_us",
        Map("event_id" -> "view_event_id", "value" -> "view_value"))))
    assert(rows(g.sql("SELECT * FROM TABLE(graft_asof_join(clicks_tf, " +
      "views_tf, 'user_id', 'ts_us', 'event_id=view_event_id', 'forward'))").get) ==
      rows(graft.ops.TemporalJoins.asofForward(clicks, views,
        Seq("user_id"), "ts_us", Map("event_id" -> "view_event_id"))))
    val iv = ev.groupBy(col("user_id").as("interval_id"))
      .agg(min(col("ts_us")).as("start_us"))
      .filter(col("interval_id") < 20)
      .withColumn("end_us", col("start_us") + lit(3600000000L))
    ev.select("event_id", "ts_us").createOrReplaceTempView("pts_tf")
    iv.createOrReplaceTempView("iv_tf")
    assert(rows(g.sql("SELECT * FROM TABLE(graft_range_join(pts_tf, iv_tf, " +
      "'ts_us', 'start_us', 'end_us', 600000000))").get) ==
      rows(graft.ops.TemporalJoins.pointInRange(ev.select("event_id", "ts_us"),
        iv, "ts_us", "start_us", "end_us", 600000000L)))
  }

  test("graft_scan_where: micro-partition-pruned read equals a plain filter") {
    val g = sess()
    import org.apache.spark.sql.types._
    g.store.createTable("facts", StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType))),
      keys = Seq("id"))
    // time-correlated appends: each batch covers a disjoint id range
    (0 until 4).foreach { b =>
      import spark.implicits._
      g.store.append("facts",
        (0 until 100).map(i => (b * 100L + i, s"g$b")).toDF("id", "grp"))
    }
    val viaSql = g.sql("SELECT * FROM TABLE(graft_scan_where(facts, " +
      "'id >= 150 AND id < 250'))").get
    val expect = g.store.read("facts")
      .filter(col("id") >= 150L && col("id") < 250L)
    assert(rows(viaSql) == rows(expect))
    // the Scala surface proves files were actually pruned
    val pruned = g.store.scanWhere("facts",
      col("id") >= 150L && col("id") < 250L)
    assert(pruned.inputFiles.length < g.store.read("facts").inputFiles.length,
      "manifest stats should exclude the non-matching batches' files")
    // string predicate through the SQL quoting ('' escape)
    val s2 = g.sql(
      "SELECT count(*) AS n FROM TABLE(graft_scan_where(facts, 'grp = ''g3''')) ").get
    assert(s2.head().getLong(0) == 100L)
  }

  test("graft_join_prune_info: the plan-time join-prune decision is SQL-visible") {
    val g = sess()
    import org.apache.spark.sql.types._
    g.store.createTable("jp_facts", StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType))),
      keys = Seq("id"))
    (0 until 4).foreach { b =>
      import spark.implicits._
      g.store.append("jp_facts",
        (0 until 100).map(i => (b * 100L + i, s"g$b")).toDF("id", "grp"))
    }
    graft.store.JoinKeyPrune.clearEventsForTesting()
    // KB-scale fixture: open the benefit gate so the rule under test fires
    spark.conf.set(graft.store.JoinKeyPrune.MinFactBytesConf, "0")
    try {
      import spark.implicits._
      val dim = Seq((150L, "x"), (160L, "y")).toDF("id", "label")
      assert(g.store.read("jp_facts").join(dim, "id").count() == 2)
    } finally spark.conf.unset(graft.store.JoinKeyPrune.MinFactBytesConf)
    val info = g.sql("SELECT * FROM TABLE(graft_join_prune_info())").get
      .collect().filter(_.getAs[String]("store_table") == "jp_facts")
    assert(info.nonEmpty, "the probe decision must surface without driver logs")
    assert(info.exists(_.getAs[Boolean]("pruned")),
      "a range-batched fact joined to a 2-key dim must report pruned=true")
    assert(info.exists(r =>
      r.getAs[Int]("files_kept") < r.getAs[Int]("files_total")))
    assert(info.exists(_.getAs[String]("probe").startsWith("keys(id:")),
      s"probe descriptor should name the key and its cardinality: " +
        info.map(_.getAs[String]("probe")).mkString(","))
  }

  test("table functions resolve store tables and feed CTAS / INSERT bodies") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    g.sqlScript(
      """CREATE TABLE corpus KEYS (doc_id) AS SELECT doc_id, text, source FROM docs_tf;
        |CREATE TABLE mix AS SELECT * FROM TABLE(graft_token_budget_mix(
        |  corpus, 'doc_id', 'text', 'source', 'src0=200,src1=100'))""".stripMargin)
    val expect = CorpusOps.tokenBudgetMix(docs.select("doc_id", "text", "source"),
      "doc_id", "text", "source", Map("src0" -> 200L, "src1" -> 100L))
    assert(rows(g.table("mix")) == rows(expect))
    // INSERT INTO … SELECT FROM TABLE(…) — the warehouse idiom for
    // materializing a cleaned corpus
    g.sqlScript(
      """CREATE TABLE kept (doc_id BIGINT) KEYS (doc_id);
        |INSERT INTO kept SELECT doc_id FROM TABLE(graft_neardup_filter(
        |  corpus, 'doc_id', 'text', 0.8))""".stripMargin)
    val keptExpect = Dedup.nearDupFilter(docs.select("doc_id", "text", "source"),
      "doc_id", "text", minJaccard = 0.8).select("doc_id")
    assert(rows(g.table("kept")) == rows(keptExpect))
  }

  test("outer predicates push through the table-function boundary to the scan") {
    // the substituted view is the operator's LAZY frame, so Catalyst
    // optimizes the enclosing query and the op as one tree — an outer
    // filter on the id must reach the parquet scan, not run post-hoc
    val g = sess()
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("docs_pq")
    val df = g.sql("SELECT doc_id, chunk_id FROM TABLE(graft_chunk(" +
      "docs_pq, 'doc_id', 'text', 32)) WHERE doc_id < 100").get
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("LessThan(doc_id,100)"),
      s"expected the outer filter at the scan:\n${p.take(1500)}")
  }

  test("unknown table functions and malformed literals error loudly") {
    val g = sess()
    docs.createOrReplaceTempView("docs_tf")
    val e1 = intercept[RuntimeException](
      g.sql("SELECT * FROM TABLE(graft_no_such_fn(docs_tf, 'a'))"))
    assert(e1.getMessage.contains("unknown table function"))
    val e2 = intercept[IllegalArgumentException](
      g.sql("SELECT * FROM TABLE(graft_neardup_filter(docs_tf, doc_id, 'text'))"))
    assert(e2.getMessage.contains("string literal"))
    val e3 = intercept[IllegalArgumentException](
      g.sql("SELECT * FROM TABLE(graft_bm25_topk(docs_tf, 'x'))"))
    assert(e3.getMessage.contains("arguments"))
  }

  test("numeric table-function arguments get user-facing validation") {
    val g = sess()
    graft.Tables.events(spark, dir).createOrReplaceTempView("events_tf")
    docs.createOrReplaceTempView("docs_tf2")
    // non-numeric → named-function diagnostic, not a raw NumberFormatException
    val e1 = intercept[IllegalArgumentException](g.sql(
      "SELECT * FROM TABLE(graft_dau_mau(events_tf, 'user_id', 'ts', 'thirty'))"))
    assert(e1.getMessage.contains("graft_dau_mau") &&
      e1.getMessage.contains("integer"), e1.getMessage)
    // zero/negative window rejected at the argument, not deep in dauMau
    val e2 = intercept[IllegalArgumentException](g.sql(
      "SELECT * FROM TABLE(graft_dau_mau_hll(events_tf, 'user_id', 'ts', 0))"))
    assert(e2.getMessage.contains("window_days") &&
      e2.getMessage.contains("positive"), e2.getMessage)
    // the sweep covers every numeric site, not just dau_mau
    val e3 = intercept[IllegalArgumentException](g.sql(
      "SELECT * FROM TABLE(graft_chunk(docs_tf2, 'doc_id', 'text', 'big'))"))
    assert(e3.getMessage.contains("graft_chunk") &&
      e3.getMessage.contains("integer"), e3.getMessage)
    // long-typed args validate positivity too: chunk_us = 0 must name the
    // function and argument, not surface EventAnalytics' bare require
    val e4 = intercept[IllegalArgumentException](g.sql(
      "SELECT * FROM TABLE(graft_transitions(events_tf, 'user_id', 'event_type', 'ts', 0))"))
    assert(e4.getMessage.contains("graft_transitions") &&
      e4.getMessage.contains("chunk_us") &&
      e4.getMessage.contains("positive"), e4.getMessage)
  }

  test("graft_gopher_rules / graft_c4_clean / graft_url_dedup equal the Scala API") {
    val g = sess()
    val raw = docs.withColumn("raw", graft.ops.WebCuration.webRawText(
      col("doc_id"), graft.functions.TextAnalytics.tokens(col("text"))))
    raw.createOrReplaceTempView("web_tf")
    assert(rows(g.sql(
      "SELECT * FROM TABLE(graft_gopher_rules(web_tf, 'doc_id', 'raw'))").get) ==
      rows(graft.ops.WebCuration.gopherRules(raw, "doc_id", "raw")))
    // threshold + stopword/symbol overrides flow through (min_words=10
    // keeps short docs; the synthetic vocabulary only contains 'the'/'a'
    // of any function-word list, so the discrimination check passes the
    // fixture's own lists — the same pattern the e40/c3 oracles use)
    val synth = graft.ops.WebCuration.syntheticStopwords.mkString(",")
    val loose = g.sql("SELECT count(1) AS n FROM TABLE(graft_gopher_rules(" +
      s"web_tf, 'doc_id', 'raw', 10, '$synth', '#')) WHERE keep")
      .get.collect()(0).getLong(0)
    val strict = g.sql("SELECT count(1) AS n FROM TABLE(graft_gopher_rules(" +
      s"web_tf, 'doc_id', 'raw', 50, '$synth', '#')) WHERE keep")
      .get.collect()(0).getLong(0)
    assert(loose > strict && strict > 0,
      s"synthetic-list overrides must discriminate: loose=$loose strict=$strict")
    // and the explicit-list SQL call equals the Scala call with the same
    // lists (full parity including overrides)
    assert(rows(g.sql("SELECT * FROM TABLE(graft_gopher_rules(" +
      s"web_tf, 'doc_id', 'raw', 50, '$synth', '#'))").get) ==
      rows(graft.ops.WebCuration.gopherRules(raw, "doc_id", "raw",
        stopwords = graft.ops.WebCuration.syntheticStopwords,
        symbols = Seq("#"))))
    assert(rows(g.sql(
      "SELECT * FROM TABLE(graft_c4_clean(web_tf, 'doc_id', 'raw'))").get) ==
      rows(graft.ops.WebCuration.c4Clean(raw, "doc_id", "raw")))
    val urls = docs.withColumn("url",
      concat(lit("https://WWW.Example.COM/p/"), (col("doc_id") % 5).cast("string"),
        lit("?q=1")))
    urls.createOrReplaceTempView("urls_tf")
    val viaSql = g.sql(
      "SELECT * FROM TABLE(graft_url_dedup(urls_tf, 'doc_id', 'url'))").get
    assert(rows(viaSql) ==
      rows(graft.ops.WebCuration.canonicalizeUrls(urls, "doc_id", "url")))
    // canonical groups collapse the case/www/query noise: 5 keepers
    assert(viaSql.filter(col("keep")).count() == 5)
  }
}
