package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.{TextAnalytics => TA}

/** End-to-end training-data preparation: the composed pipeline a user of
  * the library would actually run over a raw corpus, chaining only
  * public operators — exact dedup → near-dup filter → benchmark
  * decontamination → repetition/quality filtering → chunking → sequence
  * packing — with row/token accounting asserted at every stage. Every
  * stage is one of the individually-oracle-checked operators; this spec
  * guards their composition.
  */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dedup → decontam → quality → chunk → pack composes with sound accounting") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val n0 = docs.count()

    // 1. exact dedup on the text hash: keep each group's representative
    val reps = Dedup.exact(docs, "doc_id", col("text"))
      .select(col("rep_id").as("doc_id"))
    val exact = docs.join(reps, Seq("doc_id"), "left_semi")
    val n1 = exact.count()
    assert(n1 > 0 && n1 <= n0, s"exact dedup grew the corpus: $n0 -> $n1")
    assert(exact.select("text").distinct().count() == n1, "texts must be unique after exact dedup")

    // 2. near-dup filter (LSH candidates → exact verify → cluster →
    //    keep min-id representative)
    val near = Dedup.nearDupFilter(exact, "doc_id", "text", minJaccard = 0.5)
    val n2 = near.count()
    assert(n2 > 0 && n2 <= n1, s"near-dup filter grew the corpus: $n1 -> $n2")
    // representatives are a subset of the deduped corpus
    assert(near.join(exact, Seq("doc_id"), "left_anti").count() == 0)

    // 3. decontaminate against a synthetic benchmark slice
    val bench = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text"))
    val decon = CorpusOps.decontaminate(near, bench, "doc_id", "text", n = 5)
    assert(decon.count() == n2, "decontaminate must flag, not drop")
    val clean = decon.filter(!col("contaminated")).drop("contaminated")
    val n3 = clean.count()
    assert(n3 < n2, "the benchmark slice overlaps the corpus, so some docs must flag")

    // 4. repetition + quality filtering
    val rep = CorpusOps.repetitionStats(clean, "doc_id", "text")
    val keepIds = rep.filter(!col("repetitive")).select("doc_id")
    val quality = clean.join(keepIds, Seq("doc_id"), "left_semi")
      .filter(TA.qualityScore(col("text")) > 0.2)
    val n4 = quality.count()
    assert(n4 > 0 && n4 <= n3)

    // 5. chunk long documents into overlapping token windows
    val chunks = CorpusOps.chunk(quality, "doc_id", "text", size = 40, overlap = 10)
    assert(chunks.select("doc_id").distinct().count() == n4, "every doc must chunk")
    // every chunk is non-empty and at most `size` tokens
    val bad = chunks.filter(col("n_tokens") <= 0 || col("n_tokens") > 40).count()
    assert(bad == 0, s"$bad chunks violate the token-window bound")

    // 6. pack the surviving docs into 512-token training blocks per source
    val packed = CorpusOps.packSequences(quality, "doc_id", "source", "text",
      blockTokens = 512)
    assert(packed.count() == n4)
    // block spans are well-formed and per-shard totals account exactly
    assert(packed.filter(col("end_block") < col("start_block")).count() == 0)
    val acct = packed.groupBy("source")
      .agg(sum("n_tokens").as("toks"), max("end_block").as("last_block"))
      .filter(col("last_block") =!= expr("(toks - 1) DIV 512"))
    assert(acct.count() == 0, "per-shard last block must equal total-token block index")
  }

  test("normalize-dedup → LM-quality cut → budgeted mix composes (round-9 ops)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val n0 = docs.count()

    // 1. normalization-aware exact dedup (case/punct variants collapse)
    val reps = Dedup.exact(docs, "doc_id", TA.phash(TA.normalizeText(col("text"))))
      .select(col("rep_id").as("doc_id"))
    val uniq = docs.join(reps, Seq("doc_id"), "left_semi")
    val n1 = uniq.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. bigram-LM surprise cut: drop the most surprising (worst) decile
    val scored = CorpusOps.bigramBits(uniq, "doc_id", "text",
      bigramVocab = 2000, unigramVocab = 5000)
    assert(scored.count() == n1, "every multi-token doc must score")
    val cut = scored.agg(expr("percentile(bits_per_bigram, 0.9)")).head().getDouble(0)
    val keep = uniq.join(
      scored.filter(col("bits_per_bigram") <= cut).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val n2 = keep.count()
    assert(n2 > 0 && n2 < n1, s"the decile cut must drop something: $n1 -> $n2")

    // 3. token-budget mix over the survivors; budgets bind per source
    val mixed = CorpusOps.tokenBudgetMix(keep, "doc_id", "text", "source",
      budgets = Map("src0" -> 200L), defaultBudget = 400L)
    val perSrc = mixed.groupBy("source")
      .agg(max("cum_tokens").as("tot"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perSrc.nonEmpty)
    // every source stopped at its budget + at most one boundary doc
    perSrc.foreach { case (src, (tot, ndocs)) =>
      val budget = if (src == "src0") 200L else 400L
      assert(ndocs >= 1, s"$src must keep at least one doc")
      val beforeLast = mixed.filter(col("source") === src)
        .agg(max(col("cum_tokens") - col("n_tokens"))).head().getLong(0)
      assert(beforeLast < budget, s"$src overshot: pre-boundary sum $beforeLast >= $budget")
    }
    // the mix is a subset of the quality-kept corpus
    assert(mixed.join(keep, Seq("doc_id"), "left_anti").count() == 0)
  }
}
