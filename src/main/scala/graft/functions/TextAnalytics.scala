package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analytics column builders for large-scale training-data pipelines:
  * tokenization, portable hashing, shingling, MinHash, SimHash, language
  * scoring, quality metrics (builder-prompt extension surface; the
  * reference itself has no text functions — SURVEY.md §2.8).
  *
  * Two hash families:
  *  - `phash*` — a portable polynomial hash `(h*31 + code) mod 1e9+7`
  *    computed as a LEFT FOLD IN INDEX ORDER. Every step is exact integer
  *    arithmetic < 2^63, so DuckDB (`list_reduce`) reproduces it
  *    bit-for-bit: this is what the oracle-checked queries use.
  *  - `fasthash*` — xxhash64-based (codegen'd, one call per value): the
  *    100 TB production path. Same API shape, not oracle-comparable.
  *
  * Scale: everything here is a pure projection over array columns —
  * no shuffle, no UDF, fully inside whole-stage codegen (higher-order
  * functions compile to loops over `ArrayData`). Cost is O(chars) per row
  * for phash and O(tokens · k) for minhash, embarrassingly parallel.
  */
object TextAnalytics {

  /** Modulus for the portable polynomial hash (fits 31 bits; products with
    * multipliers < P stay < 2^62 — no int64 overflow in either engine). */
  val P = 1000000007L

  // ---- tokenization -------------------------------------------------------

  /** Whitespace tokens of trimmed text (regexp split, codegen'd). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** CCNet-style dedup normalization: lowercase, replace everything
    * outside [a-z0-9\s] with a space (punctuation/case variants of the
    * same sentence collapse, word boundaries survive "foo.bar"), then
    * collapse whitespace runs and trim. ASCII-class regexes only, so
    * Java and RE2 (DuckDB) agree byte-for-byte and oracles hash-match.
    * Pure codegen'd string ops — safe in 100 TB-side scans. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Character codes of `s`, one int per char, in order. */
  def charCodes(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))))

  // ---- portable hashing ---------------------------------------------------

  /** Portable polynomial string hash: fold (h*31 + charCode) mod P.
    * DuckDB: list_reduce(list_prepend(0, codes), (h,c) -> (h*31+c) % P).
    *
    * Dispatches to the native codegen'd [[graft.spark.PortableHash]]
    * expression (requires `spark.sql.extensions=graft.spark.GraftExtensions`,
    * set by every graft session) — ~1000× faster than the interpreted HOF
    * fold. Identical values for ASCII input (the portable contract);
    * [[phashHof]] keeps the pure-builtin fold for reference/fallback. */
  def phash(s: Column): Column = call_function("graft_phash", s)

  /** The same hash as a pure higher-order-function fold (no extension
    * needed; interpreted, so only for small data / documentation). */
  def phashHof(s: Column): Column =
    aggregate(charCodes(s), lit(0L), (h, c) => (h * lit(31L) + c) % lit(P))

  /** Portable hash of every token, in token order. */
  def tokenHashes(text: Column): Column = transform(tokens(text), phash(_))

  /** Production hash path: xxhash64 (not oracle-portable). */
  def fasthash(s: Column): Column = xxhash64(s)

  def fastTokenHashes(text: Column): Column = transform(tokens(text), xxhash64(_))

  // ---- shingling ----------------------------------------------------------

  /** Word n-gram shingles joined with single spaces; empty array when the
    * document has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct portable hashes of the n-gram shingle set (order-free —
    * only ever compared by set operations / min). */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(shingles(tokens(text), n), phash(_)))

  // ---- MinHash ------------------------------------------------------------

  /** Deterministic permutation parameters: a_i, b_i derived from i so both
    * engines can re-create them with plain arithmetic. */
  private def permA(i: Column): Column = (lit(1103515245L) * i + lit(12345L)) % lit(P)
  private def permB(i: Column): Column = (lit(1234567891L) * i + lit(987654321L)) % lit(P)

  /** k-component MinHash signature over a set of element hashes.
    * sig[i] = min over h of (a_i·h + b_i mod P). Null components only if
    * `hashes` is empty — guard upstream. */
  def minhash(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val (a, b) = (permA(i), permB(i))
      array_min(transform(hashes, h => (a * h + b) % lit(P)))
    })

  /** LSH band signatures: fold each of `bands` consecutive row-slices of
    * the signature into one bucket id. Two docs sharing any band bucket
    * are near-dup candidates. */
  def bandSigs(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(slice(sig, b * lit(rows) + lit(1), lit(rows)),
        lit(0L), (h, v) => (h * lit(31L) + v) % lit(P)))

  /** Estimated Jaccard from two equal-length signatures: fraction of
    * matching components (exact: int count / k). */
  def sigSimilarity(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (s, v) => s + v).cast("double") / lit(k.toDouble)

  // ---- SimHash ------------------------------------------------------------

  /** SimHash over element hashes using the low `bits` bits (phash values
    * are < 2^30, so bits ≤ 30). bit b of the result is set iff the sum of
    * (±1 per element, + when the element's bit b is set) is positive.
    * The b-th bit of h is extracted as trunc(h / 2^b) mod 2 — exact in
    * both engines (h < 2^30 makes the double division exact). */
  def simhash(hashes: Column, bits: Int = 24): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), b => {
        val pw = pow(lit(2.0), b).cast("long")
        val sb = aggregate(hashes, lit(0L),
          (acc, h) => acc + ((h / pw).cast("long") % lit(2L)) * lit(2L) - lit(1L))
        when(sb > 0, pw).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc + x)

  /** Hamming distance between two simhashes (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- language / quality scoring ----------------------------------------

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny by design — a real pipeline would plug fastText-style
    * models in via the same column-function shape. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "en"),
    "fr" -> Seq("le", "la", "de", "et", "est", "en"),
    "zh" -> Seq("的", "是", "在", "和", "了"))

  /** Count of tokens contained in `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Winner from per-language scores: highest count, ties broken by the
    * fixed order of `scored`; 'und' when every score is zero. */
  def langIdFromCounts(scored: Seq[(String, Column)]): Column = {
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, c), acc) =>
      when(c === best && c > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Language-ID: per-language stopword counts; winner = highest count,
    * ties broken by the fixed order of [[stopwords]]. Returns the
    * predicted language code. */
  def langId(toks: Column): Column =
    langIdFromCounts(stopwords.map { case (lang, words) => (lang, stopwordCount(toks, words)) })

  /** Sum of token lengths (exact int; mean = cast(double)/n). */
  def sumTokenLen(toks: Column): Column =
    aggregate(transform(toks, length(_)), lit(0L), (s, l) => s + l)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token estimate: per word, ceil(len/4) subwords, min 1
    * (the standard ~4-chars-per-token heuristic), summed exactly. */
  def subwordCountEst(toks: Column): Column =
    aggregate(transform(toks, t => greatest(ceil(length(t) / lit(4.0)).cast("long"), lit(1L))),
      lit(0L), (s, v) => s + v)

  /** Type-token ratio: distinct tokens / tokens (lexical diversity). */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Composite quality score in [0,1]-ish from exact ratios:
    * 0.4·lexical-diversity + 0.4·stopword-presence + 0.2·length-prior.
    * Every term is an exact int ratio in double — oracle-reproducible. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / n
    val stop = stopwordCount(toks, stopwords.head._2).cast("double") / n
    val lenPrior = least(n / lit(100.0), lit(1.0))
    lit(0.4) * ttr + lit(0.4) * least(stop * lit(5.0), lit(1.0)) + lit(0.2) * lenPrior
  }

  // ---- PII redaction ------------------------------------------------------

  /** (pattern, replacement) pairs applied in order. Conservative,
    * dialect-portable regexes (no \d / lookaround) so DuckDB's
    * regexp_replace(…, 'g') computes the identical result. */
  val redactionRules: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}" -> "<PHONE>",
    "[0-9]{9,}" -> "<ID>")

  /** Scrub PII-looking spans (emails, phone shapes, long digit runs). */
  def redact(text: Column): Column =
    redactionRules.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  // ---- fingerprinting -----------------------------------------------------

  /** Document fingerprint: portable hash of the whole text (content id)
    * — pair with [[minShingleHash]] for winnowing-style selection. */
  def fingerprint(text: Column): Column = phash(text)

  /** Winnowing-style selected fingerprint: minimum shingle hash (the
    * rolling-hash window minimum at window = whole doc). */
  def minShingleHash(text: Column, n: Int): Column =
    array_min(shingleHashes(text, n))
}
