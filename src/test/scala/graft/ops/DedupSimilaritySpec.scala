package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{TextAnalytics => TA, VectorAnalytics => VA}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "a"),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "a"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog", "en", "a"), // near dup of 1
    (4L, "completely different content about spark engines", "en", "a"),
    (5L, "der schnelle braune fuchs und der faule hund", "de", "b")
  ).toDF("doc_id", "text", "lang", "source")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs, "doc_id", TA.phash(col("text")))
    assert(out.count() == 4)
    val dup = out.filter(col("n_copies") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("rep_id") == 1L)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", k = 16, bands = 8, shingleN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L)), "exact dup pair missing")
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 1.0)
    assert(ids.contains((1L, 3L)) || ids.contains((2L, 3L)), "near dup pair missing")
    assert(!ids.exists { case (a, b) => Set(a, b).contains(4L) && Set(a, b).contains(5L) })
  }

  test("minhash LSH maxBucketSize drops degenerate buckets") {
    val boiler = (1L to 20L).map(i => (i, "same same same same")).toDF("doc_id", "text")
    val all = Dedup.minhashLshPairs(boiler, "doc_id", "text", k = 16, bands = 8, shingleN = 1)
    val capped = Dedup.minhashLshPairs(boiler, "doc_id", "text", k = 16, bands = 8, shingleN = 1,
      maxBucketSize = Some(5))
    assert(all.count() == 190) // 20 choose 2 — quadratic blowup
    assert(capped.count() == 0) // every bucket oversized → dropped
  }

  test("simhash: identical docs same hash, near dups close, distinct far") {
    val s = Dedup.simhashes(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    val hamNear = java.lang.Long.bitCount(s(1L) ^ s(3L))
    val hamFar = java.lang.Long.bitCount(s(1L) ^ s(4L))
    assert(hamNear < hamFar, s"near=$hamNear far=$hamFar")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", Seq("lang"), maxHamming = hamNear)
    assert(pairs.filter(col("id_a") === 1 && col("id_b") === 2).count() == 1)
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, blocked cross-lang") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang"), n = 2, minJaccard = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.get((1L, 3L)).exists(j => j > 0.5 && j < 1.0))
    assert(!pairs.keySet.exists { case (a, b) => b == 5L || a == 5L }) // other lang block
  }

  private def vecs = Seq(
    (1L, Array(1f, 0f, 0f), 0), (2L, Array(0.99f, 0.1f, 0f), 0),
    (3L, Array(0f, 1f, 0f), 0), (4L, Array(0f, 0f, 1f), 1),
    (5L, Array(0f, 0.1f, 0.99f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("embedding near-dup pairs within label blocks") {
    val out = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", Seq("label"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (4L, 5L)))
  }

  test("brute-force top-k exact, ranked, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1), "vec_id", "embedding", 2)
      .collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
  }

  test("IVF probes nearest partitions only") {
    // query near label-1 axis: with nprobe=1 only label-1 vectors searched
    val q = Seq((99L, Array(0f, 0f, 1f), -1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfTopK(vecs, q, "vec_id", "embedding", "label", k = 3, nprobe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(out == Set(4L, 5L)) // label-0 vectors never scanned
  }

  test("centroids: hierarchical fold is exact across chunk boundaries under skew") {
    // one hot group (100 vectors) vs tiny groups — chunkSize=4 forces 25
    // level-1 chunks for the hot group, so no row ever materializes more
    // than 4 vectors; the result must equal the plain sequential fold
    val skewed = ((1L to 100L).map(i => (i, Array(i * 0.25f, 1f / i, 3f), "hot")) ++
      Seq((101L, Array(1f, 2f, 3f), "cold"))).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroids(skewed, "label", "vec_id", "embedding", chunkSize = 4)
      .collect().map(r => r.getString(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    val expHot = (0 until 3).map { d =>
      (1L to 100L).map(i => Array(i * 0.25f, 1f / i, 3f)(d).toDouble).sum / 100.0
    }
    assert(out("hot")._2 == 100L && out("cold")._2 == 1L)
    out("hot")._1.zip(expHot).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-9, s"got $got exp $exp")
    }
    assert(out("cold")._1 == Seq(1.0, 2.0, 3.0))
    // single-chunk result is bit-identical to the flat fold (chunkSize > n)
    val flat = Similarity.centroids(skewed, "label", "vec_id", "embedding", chunkSize = 1024)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(flat("cold") == out("cold")._1)
  }

  test("kmeans coarse quantizer lifts IVF recall over the arbitrary label shard") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val nExact = exact.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / nExact
    val labelRecall = recall(
      Similarity.ivfTopK(e, queries, "vec_id", "embedding", "label", k = 5, nprobe = 2))
    val km = Similarity.kmeans(e, "vec_id", "embedding", k = 20, iters = 5)
      .withColumnRenamed("id", "vec_id")
    val kmRecall = recall(
      Similarity.ivfTopK(e.join(km, Seq("vec_id")), queries, "vec_id", "embedding",
        "cluster", k = 5, nprobe = 2))
    // same probe budget (2 of 20 partitions): a LEARNED quantizer must
    // beat arbitrary sharding — this is the production answer to the
    // honest low recall n4_ann_recall measures on `label`
    info(f"label-IVF recall@5 = $labelRecall%.2f, kmeans-IVF recall@5 = $kmRecall%.2f")
    assert(kmRecall > labelRecall,
      s"kmeans-IVF recall $kmRecall must beat label-IVF recall $labelRecall")
  }

  test("kmeans separates well-separated blobs and feeds ivfTopK") {
    val blobs = (
      (1L to 10L).map(i => (i, Array(10f + i * 0.01f, 0f, 0f), 0)) ++
      (11L to 20L).map(i => (i, Array(0f, 10f + i * 0.01f, 0f), 0))
    ).toDF("vec_id", "embedding", "label")
    val assign = Similarity.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val c1 = (1L to 10L).map(assign).toSet
    val c2 = (11L to 20L).map(assign).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2, s"blobs must split: $assign")

    // trained clusters work as the IVF coarse quantizer
    val clustered = blobs.join(
      Similarity.kmeans(blobs, "vec_id", "embedding", 2, 5)
        .withColumnRenamed("id", "vec_id"), Seq("vec_id"))
    val q = Seq((99L, Array(0f, 10f, 0f), -1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfTopK(clustered, q, "vec_id", "embedding", "cluster", k = 3, nprobe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(out.subsetOf((11L to 20L).toSet), s"probe must stay in the y-axis blob: $out")
  }

  test("pqTopK: ADC ranking finds the true neighborhood on separated blobs") {
    // two 16-dim blobs; PQ with 4 subspaces of 4 dims
    def blob(base: Float, ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(16)(d => base + (i * 17 + d * 3) % 7 * 0.01f))
    }
    val vecs = (blob(10f, 1 to 12) ++ blob(-10f, 13 to 24)).toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", m = 4, codebookK = 4, kmIters = 3, k = 5)
    val neighbors = out.collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(neighbors.subsetOf((2L to 12L).toSet),
      s"ADC top-5 must stay inside the query's blob: $neighbors")
    // adist ascending with rank
    val ranked = out.orderBy("rank").collect().map(_.getAs[Double]("adist"))
    assert(ranked.toSeq == ranked.sorted.toSeq)
    // deterministic re-run (training, encoding, and ADC are all replayable)
    val again = Similarity.pqTopK(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", m = 4, codebookK = 4, kmIters = 3, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(again == out.orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("pagerankCentrality: hubs outrank leaves, symmetric graphs tie, runs repeat") {
    // star: 100 -- {1,2,3}; plus a detached symmetric pair 200 -- 201
    val pairs = Seq((100L, 1L), (100L, 2L), (100L, 3L), (200L, 201L))
      .toDF("id_a", "id_b")
    val pr = Dedup.pagerankCentrality(pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 100L, 200L, 201L))
    assert(pr(100L) > pr(1L), "the hub must outrank its leaves")
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L), "symmetric leaves tie exactly")
    assert(pr(200L) == pr(201L), "a symmetric pair ties exactly")
    val again = Dedup.pagerankCentrality(pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == pr, "bit-deterministic across runs")
  }

  test("nearestCentroidClassify labels holdout vectors by their blob") {
    val all = (
      (1L to 20L).map(i => (i, Array(10f + i * 0.01f, 0f, 0f), 0)) ++
      (21L to 40L).map(i => (i, Array(0f, 10f + i * 0.01f, 0f), 1))
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.nearestCentroidClassify(
        all.filter(col("vec_id") % 4 =!= 0), all.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", "label")
      .collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Boolean]("correct")),
      "well-separated blobs must classify perfectly")
    assert(out.forall(r => r.getAs[Int]("pred_label") == r.getAs[Int]("label")))
  }

  test("clusterBalancedSample caps every cluster and samples within it") {
    // unbalanced blobs: 30 on the x-axis, 5 on the y-axis
    val blobs = (
      (1L to 30L).map(i => (i, Array(10f + i * 0.01f, 0f, 0f))) ++
      (31L to 35L).map(i => (i, Array(0f, 10f + i * 0.01f, 0f)))
    ).toDF("vec_id", "embedding")
    val picked = Similarity.clusterBalancedSample(
      blobs, "vec_id", "embedding", k = 2, iters = 5, perCluster = 4).collect()
    val byCluster = picked.groupBy(_.getAs[Int]("cluster")).view.mapValues(
      _.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(byCluster.size == 2)
    // the 30-vector cluster is capped at 4; the 5-vector one too
    assert(byCluster.values.forall(_.size == 4), s"got $byCluster")
    // picks stay within their blob (kmeans is deterministic, so the two
    // clusters ARE the two blobs) and the head blob cannot dominate
    val xs = (1L to 30L).toSet; val ys = (31L to 35L).toSet
    assert(byCluster.values.exists(_.subsetOf(xs)) &&
      byCluster.values.exists(_.subsetOf(ys)), s"got $byCluster")
    // deterministic re-run
    val again = Similarity.clusterBalancedSample(
      blobs, "vec_id", "embedding", k = 2, iters = 5, perCluster = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"))).toSet
    assert(again == picked.map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"))).toSet)
  }

  test("quantized top-k matches exact ranking on well-separated vectors") {
    val q = vecs.filter(col("vec_id") === 1)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val quant = Similarity.quantizedTopK(vecs, q, "vec_id", "embedding", 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(quant == exact, s"int8 quantization flipped a well-separated ranking: $quant vs $exact")
    // quantized cosine of a vector with its own copy is 1 up to the
    // sqrt(norm) rounding (the integer dot itself is exact)
    val self = Seq((100L, Array(0.5f, -0.25f, 0.125f), 0), (101L, Array(0.5f, -0.25f, 0.125f), 0))
      .toDF("vec_id", "embedding", "label")
    val s = Similarity.quantizedTopK(self, self.filter(col("vec_id") === 100), "vec_id", "embedding", 1)
      .head().getAs[Double]("qcos")
    assert(math.abs(s - 1.0) < 1e-12)
  }

  test("ivfQuantizedTopK: exact re-rank restores exact ordering at full probe coverage") {
    // nprobe covers every partition and shortK exceeds the corpus, so the
    // only approximation left is the quantized shortlist ORDER — which the
    // exact re-rank must erase: result == brute force, cosines included
    val q = vecs.filter(col("vec_id") === 1)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSeq
    val pq = Similarity.ivfQuantizedTopK(vecs, q, "vec_id", "embedding", "label",
        k = 3, nprobe = 2, shortK = 100)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSeq
    assert(pq == exact, s"full-coverage IVF-PQ must equal brute force: $pq vs $exact")
  }

  test("ivfQuantizedTopK recall tracks plain IVF at the same probe budget (sf0.01)") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val nExact = exact.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / nExact
    val ivf = recall(
      Similarity.ivfTopK(e, queries, "vec_id", "embedding", "label", k = 5, nprobe = 2))
    val ivfpq = recall(
      Similarity.ivfQuantizedTopK(e, queries, "vec_id", "embedding", "label", k = 5, nprobe = 2))
    info(f"label-IVF recall@5 = $ivf%.2f, IVF-PQ recall@5 = $ivfpq%.2f")
    // identical probes — recall can only differ where the int8 shortlist
    // (4k candidates) drops a true neighbor; on 64-dim data that is rare
    assert(ivfpq >= ivf - 0.05,
      s"IVF-PQ recall $ivfpq fell more than 0.05 below same-probe IVF $ivf")
  }

  test("lshVerifiedPairs: candidate-bounded with TRUE jaccard values") {
    val verified = Dedup.lshVerifiedPairs(docs, "doc_id", "text", minJaccard = 0.5,
        k = 16, bands = 8, shingleN = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(verified.contains((1L, 2L)) && verified((1L, 2L)) == 1.0,
      s"exact dup pair must verify at jaccard 1.0: $verified")
    val cands = Dedup.minhashLshPairs(docs, "doc_id", "text", k = 16, bands = 8, shingleN = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.keySet.subsetOf(cands),
      s"verified pairs must be a subset of LSH candidates: ${verified.keySet} vs $cands")
  }

  test("duplicatedSpans: localizes shared runs, merges overlaps, requires minDocs distinct docs") {
    val d = Seq(
      // 1/2 share a 6-token run (two overlapping 5-grams → ONE merged span each)
      (1L, "alpha beta gamma delta epsilon zeta u1 u2 u3"),
      (2L, "p1 p2 alpha beta gamma delta epsilon zeta t1"),
      (3L, "totally unrelated words here nothing shared at all"),
      // 6/7 share two runs separated by 5 unshared tokens (gap 10 > n−1 → disjoint spans)
      (6L, "c1 c2 c3 c4 c5 g1 g2 g3 g4 g5 d1 d2 d3 d4 d5"),
      (7L, "c1 c2 c3 c4 c5 h1 h2 h3 h4 h5 d1 d2 d3 d4 d5"),
      // 8: the same 5-gram twice WITHIN one doc — not cross-doc duplication
      (8L, "r1 r2 r3 r4 r5 x r1 r2 r3 r4 r5"),
      // 11 shares gram@0 with 12 and gram@2 with 13, gram@1 with nobody:
      // flagged positions 0 and 2 (gap 2 ≤ n−1) must merge into one span
      (11L, "x1 x2 x3 x4 x5 y1 y2"),
      (12L, "x1 x2 x3 x4 x5 zz1 zz2"),
      (13L, "qq x3 x4 x5 y1 y2")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(d, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(spans.contains((1L, 0, 5, 2L)) && spans.contains((2L, 2, 7, 2L)),
      s"shared 6-token run must merge to one span per doc: $spans")
    assert(spans.contains((6L, 0, 4, 1L)) && spans.contains((6L, 10, 14, 1L)),
      s"runs separated beyond n−1 stay disjoint: $spans")
    assert(spans.contains((11L, 0, 6, 2L)),
      s"flagged grams at gap ≤ n−1 merge even when matched by different docs: $spans")
    assert(!spans.exists(s => s._1 == 8L || s._1 == 3L),
      s"within-doc repetition and unique docs must not be flagged: $spans")
    assert(spans.count(_._1 == 6L) == 2 && spans.count(_._1 == 1L) == 1)
  }

  test("cutSpans removes flagged spans, keeps clean text, empties fully-flagged docs") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta u1 u2 u3"),
      (2L, "p1 p2 alpha beta gamma delta epsilon zeta t1"),
      (3L, "totally unrelated words here nothing shared at all"),
      (11L, "x1 x2 x3 x4 x5 y1 y2"),
      (12L, "x1 x2 x3 x4 x5 zz1 zz2"),
      (13L, "qq x3 x4 x5 y1 y2")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(d, "doc_id", "text", n = 5, minDocs = 2)
    val out = Dedup.cutSpans(d, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("u1 u2 u3", 3L, 6L)), s"shared prefix cut: ${out(1L)}")
    assert(out(2L) == (("p1 p2 t1", 3L, 6L)), s"shared middle cut: ${out(2L)}")
    assert(out(3L)._3 == 0L && out(3L)._1.startsWith("totally"),
      "unique doc untouched")
    assert(out(11L) == (("", 0L, 7L)),
      s"fully-flagged doc comes back EMPTY, not missing: ${out(11L)}")
    assert(out.size == 6, "every input row present in the cut output")
  }

  test("srp buckets put near-identical vectors together") {
    val b = Similarity.srpBuckets(vecs, "vec_id", "embedding", planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L))
    assert(b(4L) == b(5L))
  }

  test("clusterPairs groups transitive duplicates under the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 4L), (7L, 8L), (3L, 9L))
      .toDF("id_a", "id_b")
    val clusters = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L && clusters(9L) == 1L)
    assert(clusters(4L) == 4L && clusters(5L) == 4L)
    assert(clusters(7L) == 7L && clusters(8L) == 7L)
  }

  test("clusterPairs converges in log rounds on a long chain (10k-node path)") {
    // a path graph is the adversarial case for min-label propagation
    // (diameter = n, so 10k propagation rounds); large-star/small-star
    // must fully label it within the default maxIter=20 round pairs
    val n = 10000L
    val pairs = spark.range(n - 1).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val labels = Dedup.clusterPairs(pairs)
    assert(labels.count() == n)
    assert(labels.filter(col("cluster") =!= 0L).count() == 0,
      "every node of the path must label to the component min (0)")
  }

  test("clusterPairs matches a union-find oracle on random graphs; handles self-pairs") {
    val rnd = new scala.util.Random(42)
    val nNodes = 400
    val edges = Seq.fill(300)((rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
    // driver-side union-find oracle
    val parent = Array.tabulate(nNodes)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.map { id =>
      val comp = find(id.toInt)
      val members = (0 until nNodes).filter(find(_) == comp)
        .filter(m => edges.exists(e => e._1 == m || e._2 == m))
      id -> members.min.toLong
    }.toMap
    val got = Dedup.clusterPairs(edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // self-pair-only nodes keep their own label
    val self = Dedup.clusterPairs(Seq((9L, 9L), (1L, 2L)).toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(self == Map(9L -> 9L, 1L -> 1L, 2L -> 1L))
  }

  test("dropDuplicateClusters keeps one representative per cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropDuplicateClusters(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L)) // 2,3 dropped (cluster rep = 1)
  }

  test("nearDupFilter end-to-end: drops verified dups, keeps distinct docs") {
    val kept = Dedup.nearDupFilter(docs, "doc_id", "text",
        minJaccard = 0.5, shingleN = 1)
      .select("doc_id").as[Long].collect().toSet
    // 1,2 exact dups and 3 near-dup of them -> one representative (1);
    // 4 and 5 unrelated -> kept
    assert(kept == Set(1L, 4L, 5L), s"got $kept")
  }

  test("semanticDedup keeps one representative per embedding cluster") {
    val kept = Dedup.semanticDedup(vecs, "vec_id", "embedding", minCosine = 0.9, planes = 8)
      .select("vec_id").as[Long].collect().toSet
    // (1,2) cosine≈0.995 and (4,5) cosine≈0.995 collapse; 3 distinct
    assert(kept == Set(1L, 3L, 4L), s"got $kept")
  }

  test("winnowFingerprints: rightmost-min tie rule and overlap guarantee") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x x x"),          // 4 identical grams -> one all-tie window
      (2L, "p q r s t u v w"),      // clean 8-token doc
      (3L, "a a p q r s t u b b")   // shares the 6-token run "p q r s t u"
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text",
      shingleN = 3, window = 4).collect()
    val d1 = fp.filter(_.getLong(0) == 1L)
    assert(d1.length == 1 && d1(0).getLong(1) == 3L,
      s"all-tie window must keep the RIGHTMOST min, got ${d1.toSeq}")
    // winnowing guarantee: any shared run of >= window+shingleN-1 = 6
    // tokens must surface at least one common fingerprint hash
    val h2 = fp.filter(_.getLong(0) == 2L).map(_.getLong(2)).toSet
    val h3 = fp.filter(_.getLong(0) == 3L).map(_.getLong(2)).toSet
    assert((h2 & h3).nonEmpty, "6-token overlap must share a fingerprint")
    // density: doc 2 has 6 grams -> 3 windows -> at most 3 fingerprints
    assert(fp.count(_.getLong(0) == 2L) <= 3)
  }

  test("incrementalNearDupFilter drops batch docs matching corpus or earlier batch ids") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine"
    val corpus = Seq((1L, t1), (2L, "other corpus text entirely distinct words"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, t2),                                            // first of a batch-internal dup pair
      (21L, t2),                                            // dups 20 (earlier id) -> dropped
      (30L, t1),                                            // dups corpus doc 1 -> dropped
      (40L, "totally unique content nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDupFilter(corpus, batch, "doc_id", "text",
        minJaccard = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(20L, 40L), s"got ${out.toSeq}")
    // the batch never shrinks the corpus: survivors carry their columns
    assert(Dedup.incrementalNearDupFilter(corpus, batch, "doc_id", "text",
      minJaccard = 0.5).columns.toSeq == Seq("doc_id", "text"))
  }

  test("portable phash matches hand-computed fold") {
    // 'abc': ((0*31+97)*31+98)*31+99 = 96354 (mod P no-ops at this size)
    val out = docs.limit(1).select(TA.phash(lit("abc"))).head().getLong(0)
    assert(out == 96354L)
  }

  test("cosine is exact on doubles") {
    val c = vecs.filter(col("vec_id") === 1)
      .select(VA.cosine(col("embedding"), col("embedding"))).head().getDouble(0)
    assert(c == 1.0)
  }

  test("knnGraph keeps only mutual edges, id_a < id_b") {
    // 1-NN picks: 1↔2 and 4↔5 are reciprocal; 3's pick (2, by the
    // ascending-id tiebreak over equal cosines) is not reciprocated at
    // k=1, so 3 contributes no edge — the hub-satellite drop the
    // mutual filter exists for.
    val e1 = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e1 == Set((1L, 2L), (4L, 5L)), s"got $e1")
    // at k=2 the reciprocal set widens: 2↔3 and 3↔5 appear, (1,3) stays
    // one-directional (3's top-2 is {2, 5})
    val e2 = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e2 == Set((1L, 2L), (2L, 3L), (3L, 5L), (4L, 5L)), s"got $e2")
    // every edge is oriented small-id first exactly once
    assert(e2.forall { case (a, b) => a < b })
  }

  test("blocked kNN with planes=1 probes both buckets — equals the exact lists") {
    // Hamming-1 multiprobe over a 1-plane split covers the whole space,
    // so the blocked path must reproduce knnDirected exactly; at more
    // planes it returns a subset of true-cosine rows (recall < 1 is
    // measured by n13, never wrong scores)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows(Similarity.knnDirected(vecs, "vec_id", "embedding", k = 2))
    val full = rows(Similarity.knnDirectedBlocked(vecs, "vec_id", "embedding",
      k = 2, planes = 1))
    assert(full == exact, s"planes=1 multiprobe must be exhaustive: $full vs $exact")
    val blocked = rows(Similarity.knnDirectedBlocked(vecs, "vec_id", "embedding",
      k = 2, planes = 3))
    assert(blocked.forall { case (id, nbr, cos) =>
      exact.exists(e => e._1 == id && e._3 >= cos) || exact.contains((id, nbr, cos)) },
      "blocked lists may miss neighbors but never invent better ones")
  }

  test("wider probe ring and extra tables only ADD candidates (recall monotone)") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val exact = Similarity.knnDirected(e, "vec_id", "embedding", k = 5)
      .select("id", "nbr").localCheckpoint(true)
    val n = exact.count().toDouble
    def recall(h: Int, tb: Int): Double =
      exact.join(
        Similarity.knnDirectedBlocked(e, "vec_id", "embedding", k = 5,
          planes = 4, hamming = h, tables = tb).select("id", "nbr"),
        Seq("id", "nbr"), "left_semi").count() / n
    val r1 = recall(1, 1); val r2 = recall(2, 1); val r3 = recall(2, 2)
    info(f"SRP recall@5 planes=4: h=1 $r1%.3f, h=2 $r2%.3f, h=2×2tables $r3%.3f")
    // each step widens the candidate set, so top-k recall cannot drop
    assert(r2 >= r1, s"Hamming-2 ring must not lose recall: $r2 < $r1")
    assert(r3 >= r2, s"a second table must not lose recall: $r3 < $r2")
  }

  test("kmeans-IVF blocked kNN holds the production recall bar (mean recall@5 >= 0.8)") {
    // the registered n13b operating point: 32 learned cells, 14 probed
    // (scoring ~0.44 of all pairs), full corpus as queries — the
    // data-adaptive quantizer clears the bar where the SRP family
    // plateaus at ~0.6 on these near-random embeddings (SCALE.md table)
    val df = graft.SparkEntry.queries("n13b_knn_recall_ivf")(
      spark, "/root/testdata/sf0.01")
    val m = df.agg(avg("recall")).head().getDouble(0)
    info(f"kmeans-IVF (14/32 cells) mean recall@5 = $m%.3f")
    assert(m >= 0.8, f"production operating point must reach 0.8, got $m%.3f")
  }

  test("semDedupKmeans: drops exactly the larger-id member of every within-cluster pair") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Dedup.semDedupKmeans(emb, "vec_id", "embedding",
      minCosine = 0.2, kClusters = 20, iters = 5)
    val survivors = out.select("vec_id").as[Long].collect().toSet
    // reconstruct the drop set independently from the same assignment
    val assign = Similarity.kmeans(emb, "vec_id", "embedding", 20, 5)
      .withColumnRenamed("id", "vec_id")
    val pairs = Dedup.embeddingNearDupPairs(
      emb.join(assign, Seq("vec_id")), "vec_id", "embedding", Seq("cluster"), 0.2)
      .collect()
    val expected = pairs.map(_.getAs[Long]("id_b")).toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    assert(survivors == all -- expected, "survivors = all ids minus pairwise-greedy drops")
    assert(pairs.nonEmpty, "fixture must exercise the drop path")
    // greedy chain semantics: a pair's SMALLER id survives unless it is
    // itself the larger side of another pair
    val keptSmall = pairs.map(_.getAs[Long]("id_a")).toSet -- expected
    assert(keptSmall.subsetOf(survivors))
  }

  test("lshContainmentPairs: full containment of a quoted doc that Jaccard misses") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")      // 59 2-grams
    val quote = (1 to 9).map(i => s"w$i").mkString(" ")     // 8 2-grams, all in big
    val docs = Seq(
      (1L, big), (2L, quote),
      (3L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    // bands=16 (1 row per band): an asymmetric pair has LOW jaccard by
    // construction, so containment detection needs the flattest banding
    // S-curve — P(candidate) = 1-(1-j)^16 vs 1-(1-j^2)^8 at 2 rows
    val out = Dedup.lshContainmentPairs(docs, "doc_id", "text",
      minContainment = 0.9, k = 16, bands = 16, shingleN = 2).collect()
    val pair = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, "the quote must surface as a containment pair")
    assert(pair.get.getAs[Double]("containment") == 1.0)
    // the same pair is invisible at a Jaccard threshold the quote can't reach
    val j = Dedup.lshVerifiedPairs(docs, "doc_id", "text", minJaccard = 0.5,
      k = 16, bands = 8, shingleN = 2)
    assert(!j.collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard 8/59 < 0.5 — containment catches what jaccard misses")
  }

  test("knnGraphFromDirected over a shared directed frame equals knnGraph") {
    val directed = Similarity.knnDirected(vecs, "vec_id", "embedding", k = 2)
      .localCheckpoint(true)
    val shared = Similarity.knnGraphFromDirected(directed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shared == direct)
  }

  test("lshEditVerifiedPairs: exact dup 1.0, order-preserving edit high, prefix cap honored") {
    val sh = Dedup.shingleRows(docs, "doc_id", "text", shingleN = 1)
    val out = Dedup.lshEditVerifiedPairs(docs, sh, "doc_id", "text",
        minSim = 0.3, prefixLen = 256)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0, "identical texts must score exactly 1.0")
    // 3 is one word substituted (jumps→leaps): high but below 1
    val near = out.getOrElse((1L, 3L), out.getOrElse((2L, 3L), 0.0))
    assert(near > 0.8 && near < 1.0, s"near-dup edit_sim $near")
    // a prefixLen shorter than the differing suffix makes the pair exact
    val pref = Dedup.lshEditVerifiedPairs(docs, sh, "doc_id", "text",
        minSim = 0.3, prefixLen = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pref((1L, 3L)) == 1.0, "10-char prefixes agree — cap must bound the DP")
    // the sketch screen only REMOVES pairs (subset), and at the maximum
    // floor only identical-signature candidates survive the DP stage
    val screened = Dedup.lshEditVerifiedPairs(docs, sh, "doc_id", "text",
        minSim = 0.3, prefixLen = 256, minEst = 1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(screened.keySet.subsetOf(out.keySet))
    assert(screened.contains((1L, 2L)), "exact dups have identical signatures")
  }

  test("minhashEstimationReport: exact dup zero error, abs_err consistent, zero-overlap kept") {
    val d = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "a b c d x y z w")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleRows(d, "doc_id", "text", shingleN = 1)
    val rows = Dedup.minhashEstimationReport(sh).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (e12, j12, a12) = rows((1L, 2L))
    assert(e12 == 1.0 && j12 == 1.0 && a12 == 0.0)
    rows.values.foreach { case (est, jac, err) =>
      assert(err == math.abs(est - jac))
      assert(jac >= 0.0 && jac <= 1.0 && est >= 0.0 && est <= 1.0)
    }
  }

  test("knnLabelPropagate: neighbor votes follow the blob, ties break on label asc") {
    // two well-separated blobs of labeled seeds; targets sit inside one
    def v(base: Float, jit: Float) = Array.fill(4)(base) :+ jit
    val seeds = Seq(
      (1L, v(10f, 0.1f), 7), (2L, v(10f, 0.2f), 7), (3L, v(10f, 0.3f), 7),
      (4L, v(-10f, 0.1f), 3), (5L, v(-10f, 0.2f), 3)
    ).toDF("vec_id", "embedding", "label")
    val targets = Seq((100L, v(10f, 0.15f)), (101L, v(-10f, 0.15f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnLabelPropagate(seeds, targets,
        "vec_id", "embedding", "label", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(100L) == ((7, 3L)), s"got ${out(100L)}")  // all 3 nearest are blob 7
    assert(out(101L)._1 == 3, s"got ${out(101L)}")
    // forced 1-1 vote at k=2 across blobs → smaller label wins the tie
    val mid = Seq((200L, Array(0f, 0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val one = Seq((1L, v(10f, 0.1f), 7), (4L, v(-10f, 0.1f), 3))
      .toDF("vec_id", "embedding", "label")
    val tied = Similarity.knnLabelPropagate(one, mid,
        "vec_id", "embedding", "label", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(tied(200L) == ((3, 1L)), s"got ${tied(200L)}")
  }

  test("ngramNovelty: originals keep credit, copies score zero, unique docs score 1") {
    val d = Seq(
      (1L, "a b c d e f g h i j"),          // first owner of its grams
      (2L, "a b c d e f g h i j"),          // full copy → novelty 0
      (3L, "p q r s t u v w x y")           // unique → novelty 1
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(d, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((6L, 6L, 1.0)), s"got ${out(1L)}")  // 10 tokens → 6 5-grams
    assert(out(2L) == ((6L, 0L, 0.0)), s"got ${out(2L)}")
    assert(out(3L) == ((6L, 6L, 1.0)), s"got ${out(3L)}")
    // docs shorter than n emit no row (consistent with duplicatedSpans)
    val short = Dedup.ngramNovelty(Seq((9L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", n = 5)
    assert(short.count() == 0)
  }

  test("triangleCounts normalizes edge orientation instead of dropping reversed rows") {
    // the triangle {1,2,3} plus pendant 4, supplied in MIXED orientation
    // with a duplicate and a self-loop — the normalized result must
    // equal the canonical-input result, not silently lose (3,1)-as-(1,3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    val canonical = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val mixed = Seq((2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 3L), (2L, 2L))
      .toDF("id_a", "id_b")
    val got = rows(Dedup.triangleCounts(mixed))
    assert(got == rows(Dedup.triangleCounts(canonical)))
    assert(got == Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 2.0 / 6.0), (4L, 1L, 0L, -1.0)))
  }

  test("a15 source-overlap matrix on a hand-built two-source fixture") {
    // three exact dups split across two sources + one unrelated doc:
    // pairs (1,3) within src_a, (1,2)/(2,3) across — orientation
    // normalized, so both cross pairs land on ONE (src_a, src_b) row;
    // exact dups always collide in every LSH band, so the candidate set
    // is guaranteed, and jaccard 1.0 makes every pair "strong"
    val dir = java.nio.file.Files.createTempDirectory("a15fix").toString
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "src_a"),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "src_b"),
      (3L, "the quick brown fox jumps over the lazy dog", "en", "src_a"),
      (4L, "completely different words entirely unrelated content here",
        "en", "src_b")
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("a15_source_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("src_a", "src_a", 1L, 1.0, 1.0, 1L),
      ("src_a", "src_b", 2L, 1.0, 1.0, 2L)), s"got $got")
  }
}
