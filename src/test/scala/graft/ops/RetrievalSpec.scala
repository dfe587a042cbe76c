package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "spark spark spark tuning guide"),
    (3L, "a totally unrelated cooking recipe collection"),
    (4L, "cluster management and data locality notes")).toDF("doc_id", "text")

  test("bm25 ranks term-matching docs first and excludes non-matching docs") {
    val queries = Seq((1L, "spark cluster")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "qid", "qtext", k = 10)
      .orderBy("rank").collect()
    val ranked = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ranked.contains(3L), "doc sharing no query term must not appear")
    assert(ranked.toSet == Set(1L, 2L, 4L))
    // doc 1 matches BOTH terms; 2 and 4 match one each → doc 1 first
    assert(ranked.head == 1L, s"got $ranked")
    // scores strictly ordered, ranks contiguous from 1
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("term saturation: k1 bounds repeated-term contribution") {
    // doc 2 has tf=3 for 'spark' but is NOT 3x the score of a tf=1 doc:
    // tf*(k1+1)/(tf+k1*norm) saturates toward k1+1
    val queries = Seq((1L, "spark")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "qid", "qtext", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(out(2L) > out(1L), "higher tf (and shorter doc) must score higher")
    assert(out(2L) < out(1L) * 3, "contribution must saturate, not scale linearly in tf")
  }

  test("odds idf variant is deterministic and agrees with lucene on ranking here") {
    val queries = Seq((1L, "spark cluster"), (2L, "cooking recipe")).toDF("qid", "qtext")
    def ranks(variant: String) =
      Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "qid", "qtext",
        k = 10, idf = variant)
        .orderBy("qid", "rank")
        .select("qid", "doc_id").as[(Long, Long)].collect().toSeq
    assert(ranks("odds") == ranks("lucene"))
    val a = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "qid", "qtext",
      k = 10, idf = "odds").orderBy("qid", "rank").collect().map(_.getDouble(2)).toSeq
    val b = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "qid", "qtext",
      k = 10, idf = "odds").orderBy("qid", "rank").collect().map(_.getDouble(2)).toSeq
    assert(a == b, "scores must be bit-deterministic across runs")
  }

  test("bm25PrfTopK: expansion retrieves docs sharing no original term") {
    val c = Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta gamma delta"), // no 'alpha' — invisible to the raw query
      (3L, "totally unrelated cooking recipe text")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha")).toDF("qid", "qtext")
    val plain = Retrieval.bm25TopK(c, q, "doc_id", "text", "qid", "qtext",
        k = 10, idf = "odds")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(plain == Set(1L), s"raw query must only reach doc 1: $plain")
    val prf = Retrieval.bm25PrfTopK(c, q, "doc_id", "text", "qid", "qtext",
        k = 10, fbDocs = 1, fbTerms = 5)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id"))
    assert(prf.contains(2L),
      s"feedback terms beta/gamma must surface doc 2: ${prf.toSeq}")
    assert(!prf.contains(3L), "expansion must not drag in unrelated docs")
    // determinism across runs
    val again = Retrieval.bm25PrfTopK(c, q, "doc_id", "text", "qid", "qtext",
        k = 10, fbDocs = 1, fbTerms = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(again == Retrieval.bm25PrfTopK(c, q, "doc_id", "text", "qid", "qtext",
        k = 10, fbDocs = 1, fbTerms = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("rrfFuse: overlap wins, scores are the exact reciprocal-rank sums") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "doc_id", "rank")
    val sem = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("qid", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, sem), k0 = 60, topK = 10)
      .orderBy("rank").collect()
    // doc 11 is in both lists → 1/61 + 1/62; 10 → 1/61; 12 → 1/62
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(11L, 10L, 12L))
    assert(out(0).getAs[Double]("rrf") == 1.0 / 61 + 1.0 / 62)
    assert(out(1).getAs[Double]("rrf") == 1.0 / 61)
    assert(out(2).getAs[Double]("rrf") == 1.0 / 62)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    // single-list fusion preserves the input ordering
    val solo = Retrieval.rrfFuse(Seq(lex), k0 = 60, topK = 10)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(solo == Seq(10L, 11L))
  }
}
