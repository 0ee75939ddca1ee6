package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items summary (Misra & Gries 1982) as a typed
  * Aggregator — the deterministic-guarantee member of the sketch kit
  * next to CMS (q99: probabilistic overestimates), HLL (q65: distinct
  * counts) and KMV (q131: set ops). The summary holds at most `k`
  * (item, counter) pairs; after any stream of N items, every item with
  * true frequency > N/(k+1) is GUARANTEED present, and each counter
  * underestimates its item's true count by at most N/(k+1).
  *
  * Merging follows Agarwal et al. 2012 ("Mergeable Summaries"): add
  * counters pointwise, then subtract the (k+1)-th largest counter from
  * all and drop the non-positive — the combined summary keeps the same
  * N/(k+1) error bound, which is what makes the aggregator safe as a
  * PARTIAL aggregate: each map partition reduces locally to ≤ k pairs,
  * the exchange carries O(partitions × k) buffer rows, and merge order
  * (which Spark does not fix) can change WHICH low-count items survive
  * but never violates the guarantee. Callers must therefore treat the
  * output as a candidate SUPERSET of the heavy hitters, not as counts —
  * [[graft.operators.Sketches.mgHeavyHitters]] re-counts candidates
  * exactly in a second pass, making its final output deterministic.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c) => b.updated(t, c + 1L)
      case None if b.size < k => b.updated(t, 1L)
      case None =>
        // decrement-all: each decrement cancels one earlier increment,
        // so the O(k) rebuild amortizes to O(1) per stream item
        b.flatMap { case (x, c) => if (c > 1L) Some(x -> (c - 1L)) else None }
    }

  override def merge(b1: Map[String, Long],
                     b2: Map[String, Long]): Map[String, Long] = {
    val m = b2.foldLeft(b1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest counter, drop non-positive — the
      // mergeable-summaries rule that preserves the N/(k+1) bound
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) => if (c - cut > 0L) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** `mgSummary(k)(token)` → MAP<STRING, BIGINT> candidate summary. */
  def mgSummary(k: Int)(token: Column): Column =
    udaf(new MisraGriesAgg(k), ExpressionEncoder[String]()).apply(token)
}
