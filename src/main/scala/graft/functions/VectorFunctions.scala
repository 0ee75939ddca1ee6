package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embeddings.
  * Built on higher-order functions (`zip_with`, `aggregate`) — pure Catalyst
  * expressions, no UDF, so similarity scoring runs inside codegen and
  * parallelizes trivially. Elements are cast to double before any
  * arithmetic so results are reproducible across engines.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

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
  def signLshBucket(a: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(a, sequence(lit(1), size(a)),
          (x, i) => x.cast("double") *
            (pmod(i * lit(planeMultiplier(j)), lit(101)).cast("double") - lit(50.0))),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
