package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `array<float>` columns.
  *
  * Built on Spark's higher-order functions (`zip_with`/`aggregate`),
  * which stay inside Catalyst (no Scala UDF serialization, no Python).
  * All accumulation is done in Double left-to-right, which matches the
  * DuckDB oracle's `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`
  * bit-for-bit in practice (verified < 1e-15 divergence).
  *
  * Re-expresses the cosine scoring of the reference's Qdrant
  * collections (reference: app/core/document_ingestor.py:86
  * `Distance.COSINE`).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision (native codegen'd expression). */
  def dotProduct(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Σ aᵢ² in double precision (native codegen'd expression). */
  def sqNorm(a: Column): Column = VectorExpressions.sqNorm(a)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(sqNorm(a))

  /** cosine(a, b) = a·b / (‖a‖‖b‖); 0.0 when either vector is zero
    * (native codegen'd expression).
    */
  def cosineSim(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  /** Reference HOF formulation of cosine — numerically identical to
    * [[cosineSim]] (spec-asserted); kept for cross-checking the
    * native expression.
    */
  def cosineSimHof(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot / sqrt(na * nb))
  }

  /** cosine rounded to 6 decimals — the canonical "score" used by every
    * query so Spark and the DuckDB oracle agree exactly. `+0.0`
    * normalizes a possible -0.0.
    */
  def score(a: Column, b: Column): Column = round(cosineSim(a, b), 6) + lit(0.0)

  /** Oracle-comparable projection of a float-vector column: each
    * element as the integer round(x·10⁶) (half away from zero — the
    * rounding both Spark's HALF_UP and DuckDB's round() apply to the
    * identical IEEE product), comma-joined into ONE string. The
    * verify harness cannot hash/sort a raw array column (pandas
    * factorize rejects ndarrays), and float→string formatting is
    * engine-specific — integer micro-codes are deterministic on both
    * sides. DuckDB twin: [[graft.store.VectorStore.vecQ6Sql]]. The
    * RAW array stays the user-facing API (spec-pinned bit-equal to
    * the stored vector); this projection exists only to make vector
    * outputs verifiable.
    */
  def vecQ6(v: Column): Column =
    array_join(transform(v,
      x => round(x.cast("double") * 1000000d, 0).cast("long").cast("string")), ",")

  /** Squared L2 distance (for IVF assignment). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** First-15-hex-digits of md5 as a non-negative Long — a portable
    * 60-bit hash both Spark and DuckDB
    * (`('0x' || substr(md5(x),1,15))::BIGINT`) compute identically.
    * Basis for MinHash/SimHash/fingerprints. Native codegen'd
    * expression (digest bytes → long, no hex round-trip); the
    * original `conv(substring(md5(x),1,15),16,10)` formulation is
    * kept as [[md5LongConv]] for the equivalence spec.
    */
  def md5Long(c: Column): Column = VectorExpressions.md5Long60(c)

  /** Built-in-functions formulation of [[md5Long]] (spec reference). */
  def md5LongConv(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
