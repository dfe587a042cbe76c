package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunking covers every token with the configured overlap") {
    val docs = Seq((1L, (1 to 95).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = CorpusOps.chunk(docs, "doc_id", "text", size = 40, overlap = 10)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // 95 tokens, step 30 -> ceil(85/30) = 3 chunks: [1,40],[31,70],[61,95]
    assert(d1.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_.getAs[Long]("n_tokens")).toSeq == Seq(40L, 40L, 35L))
    assert(d1(0).getAs[String]("chunk_text").startsWith("t1 ") &&
      d1(1).getAs[String]("chunk_text").startsWith("t31 ") &&
      d1(2).getAs[String]("chunk_text").endsWith(" t95"))
    // consecutive chunks share exactly `overlap` tokens
    val c0 = d1(0).getAs[String]("chunk_text").split(" ").toSeq
    val c1 = d1(1).getAs[String]("chunk_text").split(" ").toSeq
    assert(c0.takeRight(10) == c1.take(10))
    // short doc -> one chunk with everything
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk_text") == "a b")
  }

  test("decontamination flags shared n-grams but not self-matches") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words here entirely now today"),
      (3L, "again the quick brown fox jumps happily away")
    ).toDF("doc_id", "text")
    val bench = Seq((10L, "saw the quick brown fox jumps yesterday")).toDF("doc_id", "text")
    val out = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L) && out(3L))
    // a benchmark doc inside the corpus is not flagged by its own grams
    val self = CorpusOps.decontaminate(bench, bench, "doc_id", "text", n = 5)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(!self(10L))
  }

  test("bloom-pruned decontamination is identical to the exact semi-join") {
    // a bigger randomized corpus so the bloom actually prunes and any
    // false-positive leak through the verify join would surface
    val rnd = new scala.util.Random(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val corpus = (1L to 300L).map(i =>
      (i, Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") % 10 === 0)
    val exact = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    val bloom = CorpusOps.decontaminateBloom(corpus, bench, "doc_id", "text", n = 5, fpp = 0.01)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(bloom == exact)
    assert(exact.values.exists(identity) && exact.values.exists(!_),
      "fixture should contain both contaminated and clean docs")
  }

  test("unigramBits: rare/OOV-heavy docs score more bits than common-token docs") {
    // "common" appears 40×; each rare_i once; vocabSize=3 keeps
    // {common, and, filler} in-vocab and pushes every rare_i to OOV
    val docs = ((1L to 10L).map(i => (i, "common and filler common and filler")) ++
      Seq((11L, "rare1 rare2 rare3 rare4 rare5 rare6"))).toDF("doc_id", "text")
    val out = CorpusOps.unigramBits(docs, "doc_id", "text", vocabSize = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    val (nTokCommon, oovCommon, bitsCommon) = out(1L)
    val (nTokRare, oovRare, bitsRare) = out(11L)
    assert(nTokCommon == 6 && nTokRare == 6)
    assert(oovCommon == 0, "top-3 vocab covers the common doc entirely")
    assert(oovRare == 6, "every rare token is OOV at vocabSize=3")
    assert(bitsRare > bitsCommon,
      s"OOV-heavy doc must score more bits/token ($bitsRare vs $bitsCommon)")
    // surprise ordering within vocab: bitlen(total)-bitlen(count); the
    // common doc's tokens each appear 20+ times → strictly under the
    // Laplace-floor OOV surprise bitlen(total)-1
    assert(out.filterKeys(_ <= 10L).values.forall(_._3 == bitsCommon),
      "identical docs score identically")
  }

  test("tokenBudgetMix respects per-source budgets, keeps the crossing doc, layout-independent") {
    // 10 docs × 4 tokens per source → 40 tokens; budget 10 keeps docs
    // while cum−n < 10: picks at cum 4 and 8 start under, the cum-12 doc
    // crosses the boundary and is kept → exactly 3 docs / 12 tokens
    val docs = (1L to 20L).map(i =>
      (i, "tok tok tok tok", if (i <= 10) "a" else "b")).toDF("doc_id", "text", "source")
    val mix = CorpusOps.tokenBudgetMix(docs, "doc_id", "text", "source",
      budgets = Map("a" -> 10L), defaultBudget = 100L)
    val rows = mix.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(rows.count(_._2 == "a") == 3, s"budget 10 over 4-token docs keeps 3: ${rows.toSeq}")
    assert(rows.filter(_._2 == "a").map(_._3).max == 12, "crossing doc is kept")
    assert(rows.count(_._2 == "b") == 10, "default budget 100 keeps all 40 tokens of b")
    val relaid = CorpusOps.tokenBudgetMix(docs.repartition(7), "doc_id", "text", "source",
      budgets = Map("a" -> 10L), defaultBudget = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(rows.toSet == relaid.toSet, "pick must not depend on physical layout")
  }

  test("temperatureMix derives integer-exact sqrt budgets from corpus counts") {
    // a: 22 docs × 4 tokens = 88 → w=⌊√88⌋=9; b: 100 × 4 = 400 → w=20;
    // B=58 → budgets a: 58·9/29 = 18, b: 58·20/29 = 40 (pure Long floor
    // division). Budget 18 over 4-token docs keeps cum−4 < 18 → 5 docs
    // (the cum-20 doc crosses and is kept); budget 40 keeps 10.
    val docs = ((1L to 22L).map(i => (i, "tok tok tok tok", "a")) ++
      (101L to 200L).map(i => (i, "tok tok tok tok", "b"))).toDF("doc_id", "text", "source")
    val mix = CorpusOps.temperatureMix(docs, "doc_id", "text", "source", totalBudget = 58L)
      .collect().map(r => (r.getString(1), r.getLong(4)))
    assert(mix.filter(_._1 == "a").map(_._2).distinct.toSeq == Seq(18L), s"got ${mix.toSeq}")
    assert(mix.filter(_._1 == "b").map(_._2).distinct.toSeq == Seq(40L))
    assert(mix.count(_._1 == "a") == 5 && mix.count(_._1 == "b") == 10)
  }

  test("shuffleShards: layout-independent, shards partition, positions contiguous") {
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = CorpusOps.shuffleShards(docs, "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(out.length == 200 && out.map(_._1).distinct.length == 200)
    assert(out.map(_._2).distinct.sorted.toSeq.forall(s => s >= 0 && s < 8))
    // within each shard positions are exactly 1..n
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val relaid = CorpusOps.shuffleShards(docs.repartition(13), "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(out.toSet == relaid.toSet, "shard and position must not depend on layout")
    // the order is a shuffle: not the identity permutation within shards
    assert(out.groupBy(_._2).exists { case (_, rows) =>
      rows.sortBy(_._3).map(_._1).toSeq != rows.map(_._1).sorted.toSeq
    }, "hash order should differ from id order somewhere")
  }

  test("stratified sample is deterministic and respects k per stratum") {
    val docs = (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s1 = CorpusOps.stratifiedSample(docs, Seq("lang"), "doc_id", k = 5)
      .orderBy("lang", "doc_id").collect().toSeq
    val s2 = CorpusOps.stratifiedSample(docs.repartition(7), Seq("lang"), "doc_id", k = 5)
      .orderBy("lang", "doc_id").collect().toSeq
    assert(s1 == s2, "sample must not depend on physical layout")
    assert(s1.count(_.getString(1) == "en") == 5 && s1.count(_.getString(1) == "de") == 5)
  }

  test("bigramBits: hand-checked bits, unigram backoff outside the bigram table") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "z"))
      .toDF("doc_id", "text")
    // bigram counts: (a,b):3 (b,a):1 (b,c):1 (b,x):1; ctx: a:3 b:3
    // unigrams: a:3 b:3 c:1 x:1 z:1, total 9; bitlen: 3→2, 1→1, 9→4
    val full = CorpusOps.bigramBits(docs, "doc_id", "text",
        bigramVocab = 100, unigramVocab = 100)
      .orderBy("doc_id").collect()
    // doc 3 has one token → no bigrams → drops out
    assert(full.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // doc1: (a,b)=2-2=0, (b,a)=2-1=1, (a,b)=0, (b,c)=2-1=1 → 2 bits
    assert(full(0).getAs[Long]("n_bigrams") == 4L)
    assert(full(0).getAs[Long]("n_backoff") == 0L)
    assert(full(0).getAs[Long]("bits_total") == 2L)
    // doc2: (a,b)=0, (b,x)=1
    assert(full(1).getAs[Long]("bits_total") == 1L)
    // bigramVocab=1 keeps only (a,b) (count desc, gram asc): the rest
    // back off to unigrams: doc1 (b,a)→4-2=2, (b,c)→4-1=3 → 5 bits
    val cut = CorpusOps.bigramBits(docs, "doc_id", "text",
        bigramVocab = 1, unigramVocab = 100)
      .orderBy("doc_id").collect()
    assert(cut(0).getAs[Long]("n_backoff") == 2L)
    assert(cut(0).getAs[Long]("bits_total") == 5L)
    // fluent repetition scores fewer bits/bigram than shuffled tokens
    assert(full(0).getAs[Double]("bits_per_bigram") < 1.0)
  }

  test("bpeMerges learns the hand-computed merge table, greedy on runs") {
    // words: "aaab" ×2, "ab" ×1
    // pairs: (a,a)=4, (a,b)=3 → merge 1 = (a,a), applied greedily:
    //   [a,a,a,b] → [aa,a,b] (run of 3 a's merges once, leftmost)
    // then (a,b)=3 beats (aa,a)=2 → merge 2 = (a,b) → [aa,ab] / [ab]
    // then merge 3 = (aa,ab)=2
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = CorpusOps.bpeMerges(docs, "text", numMerges = 3)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L)), s"got ${out.toSeq}")
  }

  test("bpeMerges batchK>1 equals serial when the top-k pairs are disjoint") {
    // words of length 2 over disjoint symbol pairs: merging one pair
    // neither creates nor destroys instances of another, so one batched
    // round must reproduce the serial table exactly
    val docs = Seq((1L, "ab ab ab ab ab cd cd cd cd ef ef ef")).toDF("doc_id", "text")
    val serial = CorpusOps.bpeMerges(docs, "text", numMerges = 3)
      .orderBy("step").collect().map(_.toSeq)
    val batched = CorpusOps.bpeMerges(docs, "text", numMerges = 3, batchK = 3)
      .orderBy("step").collect().map(_.toSeq)
    assert(batched.toSeq == serial.toSeq, s"batched ${batched.toSeq} vs serial ${serial.toSeq}")
    assert(serial.map(r => (r(1), r(2), r(3))).toSeq ==
      Seq(("a", "b", 5L), ("c", "d", 4L), ("e", "f", 3L)))
  }

  test("bpeMerges batchK stops the batch at the first symbol conflict") {
    // "aaab"×2 + "ab": round-1 top-3 is (a,a)=4 then (a,b)=3, which
    // shares 'a' — the batch must apply ONLY (a,a) and re-rank (a,b)
    // with fresh counts next round, landing on the serial table
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val serial = CorpusOps.bpeMerges(docs, "text", numMerges = 3)
      .orderBy("step").collect().map(_.toSeq)
    val batched = CorpusOps.bpeMerges(docs, "text", numMerges = 3, batchK = 3)
      .orderBy("step").collect().map(_.toSeq)
    assert(batched.toSeq == serial.toSeq, s"batched ${batched.toSeq} vs serial ${serial.toSeq}")
  }

  test("bpeMerges batch prefix defers picks that touch an earlier pick's merged symbol") {
    // dangerous direction: pick 2 READS pick 1's output "ab" — applying
    // (a,b) creates ab instances mid-round that ("ab","c")'s pre-round
    // count never saw, so the prefix must end at pick 1 (the trailing
    // disjoint (d,e) is prefix-deferred too, by construction)
    assert(CorpusOps.disjointPrefix(
      Seq(("a", "b", 9L), ("ab", "c", 8L), ("d", "e", 7L))).toSeq ==
      Seq(("a", "b", 9L)))
    // symmetric direction: pick 2 WRITES "ab", a symbol pick 1 read
    assert(CorpusOps.disjointPrefix(
      Seq(("ab", "c", 9L), ("a", "b", 8L))).toSeq ==
      Seq(("ab", "c", 9L)))
    // r-side read of an earlier output is caught as well
    assert(CorpusOps.disjointPrefix(
      Seq(("a", "b", 9L), ("c", "ab", 8L))).toSeq ==
      Seq(("a", "b", 9L)))
    // fully disjoint prefix is untouched
    assert(CorpusOps.disjointPrefix(
      Seq(("a", "b", 9L), ("c", "d", 8L), ("e", "f", 7L))).length == 3)
  }

  test("bpeMerges stops early when no adjacent pair remains") {
    // one merge exhausts the vocabulary (every word becomes one symbol);
    // asking for 5 must return 1 row, not run 4 dead count jobs
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = CorpusOps.bpeMerges(docs, "text", numMerges = 5)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "b", 2L)), s"got ${out.toSeq}")
  }

  test("epochMix upsamples small sources by repetition, cuts large ones") {
    val docs = Seq(
      (1L, "a b c d e", "small"),   // small: 10 tokens total
      (2L, "f g h i j", "small"),
      (3L, (1 to 50).map(i => s"t$i").mkString(" "), "big"), // big: 100 tokens
      (4L, (51 to 100).map(i => s"u$i").mkString(" "), "big"),
      (5L, "never seen", "unlisted")).toDF("doc_id", "text", "source")
    val out = CorpusOps.epochMix(docs, "doc_id", "text", "source",
        budgets = Map("small" -> 25L, "big" -> 60L))
      .collect()
    val small = out.filter(_.getString(1) == "small")
    val big = out.filter(_.getString(1) == "big")
    // small (10 tokens) upsamples: epochs 0,1 full + epoch 2 crossing doc
    assert(small.map(_.getAs[Long]("epoch")).max == 2L, small.mkString(","))
    assert(small.length == 5, s"2 full epochs + 1 crossing doc: ${small.length}")
    assert(small.map(_.getAs[Long]("cum_tokens")).max >= 25L)
    // big (100 tokens) cuts mid-epoch 0: first doc crosses 60
    assert(big.forall(_.getAs[Long]("epoch") == 0L))
    assert(big.length == 2 && big.map(_.getAs[Long]("n_tokens")).sum == 100L)
    // unlisted source excluded entirely
    assert(!out.exists(_.getString(1) == "unlisted"))
    // within every (source, epoch) the docs arrive in the same hash order
    val e0 = small.filter(_.getAs[Long]("epoch") == 0L).map(_.getLong(0)).toSeq
    val e1 = small.filter(_.getAs[Long]("epoch") == 1L).map(_.getLong(0)).toSeq
    assert(e0 == e1, "every epoch replays the same deterministic order")
  }

  test("normalizeText collapses case/punctuation variants for dedup") {
    import graft.functions.{TextAnalytics => TA}
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "HELLO --- WORLD"),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", TA.phash(TA.normalizeText(col("text"))))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // docs 1-3 normalize to "hello world" → one group, rep = min id
    assert(out == Map(1L -> 3L, 4L -> 1L), s"got $out")
    val norm = docs.select(TA.normalizeText(col("text"))).collect().map(_.getString(0))
    assert(norm.take(3).toSet == Set("hello world"))
  }

  test("hashingTfidf: hand-checked weights; near-dup texts are cosine-nearest") {
    // N=2; df a:2 b:1 c:1 → odds idf a=0.2, b=1.0, c=1.0
    // doc1 tf a:2,b:1 → contributions a→0.4, b→1.0; doc2 a:1,c:1 → 0.2, 1.0
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val dim = 8
    val vecs = CorpusOps.hashingTfidf(docs, "doc_id", "text", dim)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def bucket(t: String) =
      (graft.spark.PortableHash.hashBytes(t.getBytes("UTF-8")) % dim).toInt
    assert(vecs(1L).length == dim && vecs(2L).length == dim)
    assert(math.abs(vecs(1L).sum - 1.4) < 1e-12)
    assert(math.abs(vecs(2L).sum - 1.2) < 1e-12)
    assert(vecs(1L)(bucket("a")) == 0.4 || bucket("a") == bucket("b"))
    assert(vecs(2L)(bucket("a")) == 0.2 || bucket("a") == bucket("c"))
    // composition: text -> vector -> ANN finds the near-duplicate
    val corpus = Seq(
      (10L, "spark shuffles data across the cluster nodes"),
      (11L, "spark shuffles data across the cluster machines"),
      (12L, "an entirely different cooking recipe for pasta")).toDF("doc_id", "text")
    val fv = CorpusOps.hashingTfidf(corpus, "doc_id", "text", 64)
    val nn = Similarity.bruteForceTopK(fv, fv.filter(col("doc_id") === 10L),
        "doc_id", "vec", k = 1)
      .head().getAs[Long]("neighbor_id")
    assert(nn == 11L, "the near-duplicate text must be cosine-nearest")
  }

  test("stratifiedSampleAgg is result-identical to the window sampler") {
    // skewed strata: one hot stratum (900 rows), one cold (30)
    val docs = spark.range(0, 930)
      .select(col("id").as("doc_id"),
        when(col("id") < 900, "hot").otherwise("cold").as("src"))
    val win = CorpusOps.stratifiedSample(docs, Seq("src"), "doc_id", k = 9)
      .select("src", "doc_id").orderBy("src", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val agg = CorpusOps.stratifiedSampleAgg(docs, Seq("src"), "doc_id", k = 9)
      .select("src", "doc_id").orderBy("src", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(agg == win, "bounded-heap sampler must be indistinguishable by result")
    assert(agg.count(_._1 == "hot") == 9 && agg.count(_._1 == "cold") == 9)
    // id type round-trips through the padded payload
    assert(agg.forall(_._2 >= 0L))
    // string ids with pad=0: plain byte order ties
    val sdocs = Seq(("k1", "en"), ("k2", "en"), ("k3", "en")).toDF("doc_id", "lang")
    val sagg = CorpusOps.stratifiedSampleAgg(sdocs, Seq("lang"), "doc_id", k = 2, pad = 0)
    assert(sagg.collect().length == 2)
    assert(sagg.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    // ids the padding can't represent fail loudly instead of sorting wrong
    val neg = Seq((-5L, "en"), (1L, "en")).toDF("doc_id", "lang")
    val err = intercept[Exception] {
      CorpusOps.stratifiedSampleAgg(neg, Seq("lang"), "doc_id", k = 2).collect()
    }
    assert(err.getMessage != null)
    // ...but pad = 0 handles them (byte order, documented)
    assert(CorpusOps.stratifiedSampleAgg(neg, Seq("lang"), "doc_id", k = 2, pad = 0)
      .collect().length == 2)
  }

  test("nbClassifyBits: hand-checked bits, OOV-everywhere ties break on label") {
    val train = Seq(("a", 1L, "cat cat dog"), ("a", 2L, "cat fish"),
      ("b", 3L, "car car bus"), ("b", 4L, "car road")).toDF("source", "doc_id", "text")
    val held = Seq(("a", 10L, "cat dog"), ("b", 11L, "car bus"),
      ("b", 12L, "zebra zebra")).toDF("source", "doc_id", "text")
    val out = CorpusOps.nbClassifyBits(train, held, "doc_id", "text", "source")
      .orderBy("doc_id").collect()
    // V = 6 distinct train tokens, totc = 5 per class -> den_bits =
    // bitlen(11) = 4; priors equal: bitlen(4) - bitlen(2) = 1.
    // "cat dog" under a: (4-bitlen(3+1)) + (4-bitlen(1+1)) + 1 = 4
    //            under b: (4-1) + (4-1) + 1 = 7 -> a, bits 4
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getBoolean(3))).toSeq ==
      Seq((10L, "a", true), (11L, "b", true), (12L, "a", false)))
    assert(out(0).getAs[Long]("bits") == 4L)
    assert(out(1).getAs[Long]("bits") == 4L)
    // zebra is OOV in both classes and priors are equal -> identical
    // bits; the (bits, label) tie-break must pick "a" deterministically
    assert(out(2).getString(1) == "b" && out(2).getString(2) == "a")
  }

  test("dsirSelect ranks target-like raw docs first and cuts at k") {
    val target = Seq((100L, "x x y"), (101L, "x y y")).toDF("doc_id", "text")
    val raw = Seq((1L, "x y"), (2L, "p q"), (3L, "x p")).toDF("doc_id", "text")
    val out = CorpusOps.dsirSelect(raw, target, "doc_id", "text", k = 2, dim = 4096)
      .collect()
    // doc 1 (all target tokens) outranks doc 3 (half), doc 2 is cut
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getAs[Long]("logw_bits") > out(1).getAs[Long]("logw_bits"))
    assert(out.forall(_.getAs[Long]("n_tokens") == 2L))
    // k larger than the pool returns the whole pool, still ordered
    assert(CorpusOps.dsirSelect(raw, target, "doc_id", "text", k = 10, dim = 4096)
      .collect().map(_.getLong(0)).head == 1L)
  }

  test("curriculum equals the window-rank form, layout-independent") {
    val docs = Seq(
      (1L, "x x x x"), (2L, "x x y"), (3L, "y y z"),
      (4L, "z q"), (5L, "q r s"), (6L, "u v w t")
    ).toDF("doc_id", "text")
    val out = CorpusOps.curriculum(docs, "doc_id", "text", nPhases = 3,
      vocabSize = 100).collect()
    // ranks are a permutation of 0..5; phases are the integer cut
    assert(out.map(_.getAs[Long]("difficulty_rank")).sorted.toSeq == (0L to 5L))
    assert(out.forall(r => r.getAs[Int]("phase") ==
      (r.getAs[Long]("difficulty_rank") * 3 / 6).toInt))
    // rank order agrees with the reference single-partition window form
    val expected = {
      import org.apache.spark.sql.expressions.Window
      CorpusOps.unigramBits(docs, "doc_id", "text", 100)
        .select(col("doc_id"), col("bits_per_token"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("bits_per_token"), col("doc_id"))) - 1)
        .collect().map(r => r.getLong(0) -> r.getAs[Int]("rk").toLong).toMap
    }
    assert(out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("difficulty_rank"))
      .toMap == expected)
    // physical layout must not leak into the rank
    val shuffled = CorpusOps.curriculum(docs.repartition(7), "doc_id", "text",
      nPhases = 3, vocabSize = 100).collect()
    assert(shuffled.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("difficulty_rank"))
      .toMap == expected)
  }

  test("qualityRetention cuts each language against its own distribution") {
    // lang "a": 5 docs with strictly increasing quality (longer + more
    // diverse + more stopwords); lang "b": 1 doc (no distribution —
    // dropped, the documented edge); lang "c": 2 docs.
    val docs = Seq(
      (1L, "a", "x x x x"),
      (2L, "a", "x y x y"),
      (3L, "a", "the x y z"),
      (4L, "a", "the and x y z w"),
      (5L, "a", "the and of x y z w v u t"),
      (6L, "b", "the and of is in lone"),
      (7L, "c", "x x"),
      (8L, "c", "the and x y")
    ).toDF("doc_id", "lang", "text")
    // retention 0.4 on 5 docs: pr >= 0.6 keeps ranks 4,5 of lang a
    val out = CorpusOps.qualityRetention(docs, "doc_id", "text", "lang", 0.4)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(4L, 5L, 8L))
    // the kept rows carry their percent_rank and it respects the cut
    assert(out.forall(_.getAs[Double]("pr") >= 0.6))
    // retention 1.0 keeps everything (pr >= 0), including singletons
    assert(CorpusOps.qualityRetention(docs, "doc_id", "text", "lang", 1.0)
      .count() == 8L)
  }

  test("ppsSample: stride-crossing selection, weight-proportional and deterministic") {
    val docs = (1L to 200L).map(i => (i, s"doc $i", i % 37 + 1)).toDF("doc_id", "text", "n_chars")
    val n = 20
    val out = CorpusOps.ppsSample(docs, "doc_id", "n_chars", n).collect()
    // systematic selection yields n or n+1 rows
    assert(out.length == n || out.length == n + 1, s"got ${out.length}")
    // every document with weight >= stride is always selected
    val total = (1L to 200L).map(_ % 37 + 1).sum
    val stride = total / n
    val heavy = (1L to 200L).filter(i => (i % 37 + 1) >= stride).toSet
    val picked = out.map(_.getLong(0)).toSet
    assert(heavy.subsetOf(picked), "weight >= stride implies certain inclusion")
    // deterministic: an independent run returns the identical sample
    val again = CorpusOps.ppsSample(docs, "doc_id", "n_chars", n).collect()
    assert(again.map(_.getLong(0)).toSet == picked)
    // the two-level cumsum is a true prefix sum: every selected row's
    // cum_w is consistent with one global stride grid
    out.foreach { r =>
      val (w, cum) = (r.getLong(1), r.getLong(2))
      assert(cum / stride > (cum - w) / stride, s"row $r not on a stride crossing")
    }
    // zero/negative weights are excluded, never sampled
    val withZero = docs.withColumn("n_chars",
      when(col("doc_id") === 1L, lit(0L)).otherwise(col("n_chars")))
    assert(!CorpusOps.ppsSample(withZero, "doc_id", "n_chars", n)
      .collect().map(_.getLong(0)).contains(1L))
  }

  test("clusterKeywords: cluster-exclusive terms outrank shared ones") {
    val docs = Seq(
      (1L, "kernel driver kernel module common"),
      (2L, "kernel panic driver common"),
      (3L, "recipe butter sugar common"),
      (4L, "recipe oven butter common")
    ).toDF("doc_id", "text")
    val labels = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("id", "cluster")
    val out = CorpusOps.clusterKeywords(docs, "doc_id", "text", labels,
      kClusters = 2, topM = 2).collect()
    assert(out.length == 4 && out.forall(_.getAs[Long]("rank") <= 2))
    val c0 = out.filter(_.getAs[Long]("cluster") == 0L).sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[String]("term")).toSeq
    val c1 = out.filter(_.getAs[Long]("cluster") == 1L).sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[String]("term")).toSeq
    // "kernel" (tf 3, exclusive) tops cluster 0; "common" (in both
    // clusters) is idf-damped below every exclusive term
    assert(c0.head == "kernel", s"got $c0")
    assert(c1.head == "recipe" || c1.head == "butter", s"got $c1")
    assert(!c0.contains("common") && !c1.contains("common"),
      "a term present in every cluster must not be a keyword")
  }

  test("bpeFertility: merged language scores 1, unserved language pays its word length") {
    // one merge budget: (a,b) has freq 4 and wins it, so language A's
    // words segment to a single subword; B's "cdef" never merges and
    // splits into 4 characters → fertility exactly 4.0
    val d = Seq((1L, "ab ab ab ab", "A"), (2L, "cdef", "B"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusOps.bpeFertility(d, "text", "lang", numMerges = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A") == ((4L, 4L, 1.0)), s"got ${out("A")}")
    assert(out("B") == ((1L, 4L, 4.0)), s"got ${out("B")}")
  }

  test("sourceDivergenceBits: mixture-identical sources score 0, disjoint content 1 bit") {
    // a and b have IDENTICAL token distributions; every per-token count
    // exactly doubles in the pool, so bitlen(2x)−bitlen(2y) =
    // bitlen(x)−bitlen(y) and kl_bits is exactly 0 — not approximately
    val same = Seq((1L, "x x y", "a"), (2L, "x x y", "b"))
      .toDF("doc_id", "text", "source")
    val s0 = CorpusOps.sourceDivergenceBits(same, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    assert(s0("a") == ((3L, 0.0)), s"got ${s0("a")}")
    assert(s0("b") == ((3L, 0.0)), s"got ${s0("b")}")
    // token-disjoint equal-mass sources: true KL(p‖mixture) = 1 bit for
    // a 50/50 split, and the floor-log2 form lands on it exactly
    // (cross = bitlen(8)−bitlen(4) = 1 per token, self = 0)
    val disj = Seq((1L, "x x x x", "a"), (2L, "z z z z", "b"))
      .toDF("doc_id", "text", "source")
    val s1 = CorpusOps.sourceDivergenceBits(disj, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(s1("a") == 1.0 && s1("b") == 1.0, s"got $s1")
  }

  test("bpeFertility survives a corpus that learns zero merges") {
    // every word is a single character — no adjacent pair exists, so
    // bpeMerges returns an EMPTY merge table; the merge-array literal
    // must stay typed array<string> (a bare array() is array<null> and
    // graft_bpe_apply would reject the plan) and segmentation falls
    // back to per-character: fertility exactly 1.0
    val d = Seq((1L, "a b a", "A")).toDF("doc_id", "text", "lang")
    val out = CorpusOps.bpeFertility(d, "text", "lang", numMerges = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A") == ((3L, 3L, 1.0)), s"got ${out("A")}")
    val hist = CorpusOps.bpeSubwordHistogram(d, "text", numMerges = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist == Map("a" -> 2L, "b" -> 1L), s"got $hist")
  }

  test("vocabStats: counts, hapax, deterministic modal token, TTR") {
    val d = Seq(
      (1L, "a a b c", "s1"), (2L, "a d", "s1"),
      (3L, "z z", "s2")).toDF("doc_id", "text", "source")
    val out = CorpusOps.vocabStats(d, "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    // s1: tokens a a b c a d → n=6, types {a,b,c,d}=4, hapax {b,c,d}=3
    assert(s1.getLong(1) == 2L && s1.getLong(2) == 6L && s1.getLong(3) == 4L)
    assert(s1.getLong(4) == 3L && s1.getLong(5) == 3L)
    assert(s1.getString(6) == "a" && s1.getDouble(7) == 4.0 / 6.0)
    // modal-token tie (z=2 only type): top is z
    assert(out("s2").getString(6) == "z")
    // tie-break: equal counts pick the LARGER token (max(struct) order)
    val tie = Seq((1L, "m q m q", "t")).toDF("doc_id", "text", "source")
    assert(CorpusOps.vocabStats(tie, "text", "source")
      .head().getString(6) == "q")
  }

  test("collocationBits: pure-map pairs, min-count gate, exact bits") {
    // "x y" 6 times, singles once each elsewhere; N=16 tokens
    val d = (1 to 6).map(i => (i.toLong, "x y", "s")) :+
      (7L, "p q r s", "s")
    val out = CorpusOps.collocationBits(d.toDF("doc_id", "text", "source"),
      "text", topK = 5, minCount = 5).collect()
    assert(out.length == 1) // p-q/q-r/r-s all below minCount
    val r = out.head
    assert(r.getString(0) == "x" && r.getString(1) == "y" && r.getLong(2) == 6L)
    assert(r.getLong(3) == 6L && r.getLong(4) == 6L)
    // pmi_bits = bitlen(16*6) - bitlen(6*6) = bitlen(96)=7 minus bitlen(36)=6
    assert(r.getLong(5) == 1L, s"got ${r.getLong(5)}")
  }

  test("graft_pbits: product bit lengths are exact past Long overflow") {
    // the corpus-scale shape pmi_bits hits: ntot ~1e13 × np ~1e6+ wraps
    // a Long product; the expression must read the true 128-bit length
    import graft.spark.ProductBits
    def truth(a: Long, b: Long): Long =
      (BigInt(a) * BigInt(b)).bitLength.toLong
    val cases = Seq(
      (1L, 1L), (6L, 16L), (1L << 31, 1L << 31), // boundary: exactly 2^62
      (10_000_000_000_000L, 2_000_000L),         // the advertised overflow
      (Long.MaxValue, Long.MaxValue),            // 126-bit extreme
      (3_037_000_499L, 3_037_000_500L),          // straddles 2^63
      ((1L << 62) - 1L, 2L), (1L << 62, 2L))     // 63/64-bit edge
    cases.foreach { case (a, b) =>
      assert(ProductBits.productBits(a, b) == truth(a, b),
        s"pbits($a, $b): got ${ProductBits.productBits(a, b)}, want ${truth(a, b)}")
    }
    // non-positive counts are a broken pipeline: fail loud
    intercept[IllegalArgumentException](ProductBits.productBits(0L, 5L))
    // and the SQL surface agrees with the codegen'd path end-to-end
    val viaSql = spark.sql(
      "SELECT graft_pbits(10000000000000L, 2000000L)").head().getLong(0)
    assert(viaSql == truth(10_000_000_000_000L, 2_000_000L))
  }

  test("freqOfFreq: Good-Turing head table") {
    val d = Seq((1L, "a a a b b c d e")).toDF("doc_id", "text")
    val out = CorpusOps.freqOfFreq(d, "text", topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // c,d,e occur once; b twice; a three times
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L), s"got $out")
  }
}
