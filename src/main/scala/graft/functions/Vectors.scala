package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions — no UDFs, so Catalyst keeps
  * the whole expression inside the plan (prunable, pushable, no
  * serialization wall).
  *
  * All math is done in double: float arithmetic order-dependence would
  * break oracle parity and cross-run determinism. Inputs are cast with
  * `cast("array<double>")` once at the edge.
  */
object Vectors {

  /** Elementwise dot product — native codegen'd expression
    * ([[VectorExpressions.dot_product]]); same sequential fold order as
    * the HOF form (kept below for reference), ~100× faster. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot_product(a, b)

  /** Interpreted HOF formulation (oracle-equivalent, kept for tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast an `array<float>` column to `array<double>` for exact math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Signed random-hyperplane LSH signature of `bits` bits.
    *
    * Plane p's i-th coefficient is a deterministic pseudo-random value in
    * [-1, 1) derived from xxhash64(p, i) — reproducible across runs and
    * engines, no stored plane matrix to ship. Bit p = sign of the
    * projection. Cosine-similar vectors agree on most bits, so equal
    * signatures (or near-equal, under banding) are near-dup candidates —
    * this is the O(n) scale path replacing O(n²) all-pairs cosine.
    */
  def hyperplaneSignature(vec: Column, bits: Int): Column = {
    val proj = (p: Column) => aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * ((pmod(xxhash64(p, i), lit(2000001L)) - 1000000L)
          .cast("double") / 1e6)),
      lit(0.0d), (acc, x) => acc + x)
    transform(sequence(lit(0), lit(bits - 1)),
      p => when(proj(p) >= 0, lit(1)).otherwise(lit(0)))
  }

  /** Pack a 0/1 bit array (≤ 63 bits) into a long bucket id. */
  def packBits(bits: Column): Column =
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
}
