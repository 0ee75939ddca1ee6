package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine decimal quantization for hash-compared double columns.
  *
  * `round(double, N)` is a LATENT cross-engine boundary class: Spark
  * rounds the value's shortest decimal rendering HALF_UP (BigDecimal
  * path) while DuckDB rounds the binary double, so any value whose
  * rendering lands on an N-dp half boundary can flip between engines —
  * the exact mechanism the sf1 differential caught on q64's MSE and the
  * round-8 money-sum retirement removed (see `Relational.u4`,
  * BASELINE.md round-8 note). Ratio-of-small-integers columns (Jaccard,
  * precision/recall, fractions of counts) genuinely land on 5·10^-(N+1)
  * boundaries, so the class bites at scale.
  *
  * `rN(x) = floor(x·1eN + 0.5) / 1eN` is one binary multiply, add,
  * floor, divide — every step a deterministic IEEE-754 operation both
  * engines compute bit-identically on the same input double. The paired
  * oracle SQL uses the literal form `floor((x)*1eN + 0.5)/1eN`.
  *
  * For inputs containing a transcendental (log/ln: NOT correctly-rounded,
  * engines differ by 1 ulp), snap with `round(x, 8)` BEFORE quantizing —
  * the round-7-proven wobble guard — and tag the site `round-ok`. */
object Quant {
  private def q(c: Column, scale: Double): Column =
    floor(c * lit(scale) + lit(0.5)) / lit(scale)
  def r2(c: Column): Column = q(c, 1e2)
  def r4(c: Column): Column = q(c, 1e4)
  def r6(c: Column): Column = q(c, 1e6)
  def r8(c: Column): Column = q(c, 1e8)
}
