package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embeddings.
  * Delegates to the native expressions in [[VectorExprs]] — the HOF
  * combinator forms (`aggregate(zip_with(...))`) are arithmetic-identical
  * (same left-fold order, double math) but pay one interpreted lambda call
  * per element; the native loops run inside whole-stage codegen. Elements
  * are widened to double before any arithmetic so results are reproducible
  * across engines (shared formulas with the DuckDB oracle).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = native.vecDot(a, b)

  def norm(a: Column): Column = sqrt(native.vecDot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Multiplier for plane j: distinct odd values, never ≡ 0 mod 101, so every
    * plane is a distinct non-degenerate pseudo-hyperplane for j < 50.
    * (An earlier mod-7 basis aliased planes j and j+7 — only 7 distinct
    * hyperplanes existed no matter how many bits were requested.) */
  private[graft] def planeMultiplier(j: Int): Int = 2 * j + 3

  /** Deterministic sign-LSH bucket over `bits` pseudo-random hyperplanes.
    * Plane j's i-th (1-based) coordinate is ((i*(2j+3)) mod 101) - 50 — a
    * fixed, seedless, INTEGER-exact pseudo-basis, so the same formula in the
    * SQL oracle produces bit-identical projections (no libm cos() ulp
    * drift). Bucket = integer of sign bits. */
  def signLshBucket(a: Column, bits: Int): Column =
    native.signLshBucket(a, bits)
}
