package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column math for similarity search and near-dup
  * detection over `array<float>` embedding columns (builder-prompt
  * extension surface; reference has no vector types — SURVEY.md §2.8).
  *
  * Determinism contract: every reduction is a LEFT FOLD IN INDEX ORDER
  * with all operands cast to double BEFORE any arithmetic. float→double
  * casts are exact and IEEE-754 ops are deterministic given an order, so
  * DuckDB's `list_reduce` over the same lists yields bit-identical
  * doubles — these functions are oracle-checkable, not just approximately
  * comparable.
  *
  * Scale: pure projections (no shuffle, no UDF, codegen'd HOF loops);
  * O(dim) per row. Brute-force top-k over N corpus × Q query rows is a
  * broadcast nested loop (Q·N·dim flops) — use [[graft.ops.Similarity]]
  * for the partition-pruned IVF / LSH paths at 100 TB.
  */
object VectorAnalytics {

  /** Σ a[i]·b[i] in index order, operands widened to double first.
    * Dispatches to the native codegen'd [[graft.spark.DotProduct]]
    * (requires the GraftExtensions session config; both arrays must have
    * the same float/double element type — identical values to [[dotHof]],
    * ~100× faster on pair-scan hot paths). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** The same fold as pure HOFs (no extension needed; interpreted). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  /** Σ a[i]² (exact same op order as [[dot]](a,a)). */
  def normSq(a: Column): Column = dot(a, a)

  /** Euclidean norm (IEEE sqrt is correctly rounded → portable). */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity: dot / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance, same fold discipline. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (s, v) => s + v)

  /** Element-wise sum of two double vectors (for centroid accumulation). */
  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Scale a double vector by 1/k. */
  def divide(a: Column, k: Column): Column = transform(a, x => x / k)

  /** Per-vector symmetric int8 quantization scale: max|v| / 127 (0 maps
    * to a degenerate all-zero vector with scale 0). */
  def int8Scale(v: Column): Column =
    aggregate(v, lit(0.0), (m, x) => greatest(m, abs(x.cast("double")))) / lit(127.0)

  /** Quantize to int8 codes stored as small whole doubles in [-127, 127]
    * (so the native [[dot]] fold runs on them directly; a production
    * format would pack array<tinyint> — 4× smaller than float32, 8× than
    * float64). Rounding is floor(x+0.5) — identical in every engine, no
    * HALF_UP/away-from-zero ambiguity. */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0, lit(0.0)).otherwise(
        least(greatest(floor(x.cast("double") / scale + 0.5), lit(-127.0)), lit(127.0))))

  /** Approximate dot product from two quantized vectors and their scales:
    * (Σ qa[i]·qb[i]) · sa · sb. The integer MAC is EXACT in doubles
    * (|q| ≤ 127 ⇒ the sum stays far below 2^53), so the result is
    * deterministic and oracle-checkable — the error vs the true dot is
    * pure quantization error, not float-order noise. */
  def dotInt8(qa: Column, qb: Column, sa: Column, sb: Column): Column =
    dot(qa, qb) * sa * sb

  /** Deterministic pseudo-random hyperplane component for LSH: plane p,
    * dimension d ↦ an integer-derived rational in [-1, 1). Both engines
    * compute it with exact integer arithmetic — no RNG, no libm. */
  def planeComponent(p: Column, d: Column): Column =
    (((p * lit(73856093L) + d * lit(19349663L) + lit(83492791L)) % lit(2001L)) - lit(1000L))
      .cast("double") / lit(1000.0)

  /** Signed-random-projection LSH bucket id over `planes` hyperplanes:
    * bit p set iff Σ_d v[d]·plane(p,d) ≥ 0. Vectors in the same bucket
    * are cosine-similar candidates.
    *
    * `planeOffset` shifts WHICH hyperplanes are used (plane indices
    * planeOffset..planeOffset+planes−1) while bit positions stay
    * 0..planes−1 — table t of a multi-table LSH index passes
    * t·planes, giving L independent hash tables from the same
    * deterministic plane family (no RNG state to coordinate). */
  def srpBucket(v: Column, planes: Int, planeOffset: Int = 0): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, d) => x.cast("double") * planeComponent(
              p.cast("long") + lit(planeOffset.toLong), d.cast("long"))),
          lit(0.0), (s, x) => s + x)
        when(proj >= 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc + x)
}
