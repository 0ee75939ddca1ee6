package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** One scored candidate: ranking is (cos_sim DESC, vec_id ASC) — the same
  * total order as `row_number() OVER (ORDER BY cos_sim DESC, vec_id)`. */
case class ScoredId(cos_sim: Double, vec_id: Long)

/** Bounded top-k accumulator for batched ANN serving.
  *
  * Why an Aggregator and not a window: `row_number() OVER (PARTITION BY
  * q_id)` shuffles EVERY scored (corpus × query) row through the q_id
  * exchange before the `rk <= k` filter — at "million-query batch over
  * 100 TB" that shuffle is the whole job. A typed Aggregator plans as
  * ObjectHashAggregate with a PARTIAL mode before the exchange: each map
  * partition reduces to at most k candidates per query locally, so the
  * exchange carries O(partitions × queries × k) buffer rows instead of
  * |corpus| × |queries| scored rows.
  *
  * The buffer is kept sorted (best-first) and truncated at k on every
  * insert; at the k≤100s used for serving, the (k+1)-element re-sort per
  * accepted candidate is cheaper than heap bookkeeping (most rows fail the
  * `worse-than-last` early exit and never sort at all).
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  /** Strict weak order, best first. NaN (e.g. cosine of a zero-norm
    * vector) ranks WORSE than every real score — an unscorable candidate
    * must never beat a scored one. Without the explicit NaN arm, `>` is
    * false in both directions and a NaN that lands in an under-full
    * buffer would permanently block later real candidates via the
    * early-exit below, with partition-order-dependent results.
    *
    * Callers (batchTopK / knnJoin) additionally FILTER NaN scores out
    * before aggregating — "unscorable candidates are excluded" is the
    * documented serving policy, mirrored in the DuckDB oracles with
    * `WHERE NOT isnan(cos_sim)` (a bare `ORDER BY cos_sim DESC` window
    * would rank NaN FIRST, since NaN sorts greatest in both engines).
    * The NaN arm here stays as defense in depth for other callers. */
  private def better(x: ScoredId, y: ScoredId): Boolean = {
    val xn = java.lang.Double.isNaN(x.cos_sim)
    val yn = java.lang.Double.isNaN(y.cos_sim)
    if (xn && yn) x.vec_id < y.vec_id
    else if (xn || yn) yn
    else x.cos_sim > y.cos_sim || (x.cos_sim == y.cos_sim && x.vec_id < y.vec_id)
  }

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.size >= k && !better(a, b.last)) b
    else (b :+ a).sortWith(better).take(k)

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    (b1 ++ b2).sortWith(better).take(k)

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopK {
  /** `topK(k)(cos_sim, vec_id)` → ARRAY<STRUCT<cos_sim, vec_id>> of the k
    * best candidates, best first. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]()).apply(score, id)
}
