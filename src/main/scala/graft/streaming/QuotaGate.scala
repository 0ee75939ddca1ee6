package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** A document arriving on the quota stream: key = (source, bucket),
  * arrival order = doc_id. The bucket is assigned UPSTREAM (event-time
  * window in production; here deterministic id-range arithmetic — see
  * [[QuotaGate.quotaDocs]]) so the gate itself is pure per-key
  * admission control. */
case class QuotaDoc(source: String, bucket: Long, doc_id: Long)

case class QuotaVerdict(source: String, bucket: Long, doc_id: Long,
                        admitted: Boolean)

/** Streaming per-(source, window) QUOTA gate (q271) — admission control
  * for a curation intake: each source may land at most
  * [[QuotaGate.quotaPerBucket]] documents per arrival bucket; everything
  * beyond the quota in that bucket is dropped at the door. This is the
  * ingestion-side complement of the q166/q248 quality gates: floors keep
  * BAD documents out, the quota keeps any single source from flooding a
  * mixture window no matter how good its documents are (the per-source
  * cap every crawl scheduler and mixture contract enforces; same intent
  * as q252's token-budget allocator, but enforced ONLINE, in arrival
  * order, with bounded state).
  *
  * Sequential semantics have an exact relational form, like the q94
  * Bloom gate: in doc_id order a document is admitted iff fewer than Q
  * same-key documents precede it — `row_number() OVER (source, bucket
  * ORDER BY doc_id) <= Q`. The declared query is that replay, rolled up
  * per key; the streaming fold (one counter per live key in
  * `GroupState`) reproduces it row for row when batches arrive in
  * doc_id order (spec-asserted).
  *
  * Scale shape: the stream shuffles each micro-batch once on (source,
  * bucket) and holds ONE long per live key, and the state EVICTS: each
  * update arms a processing-time timeout of [[QuotaGate.stateTtl]], and
  * a key idle past it gets its counter REMOVED in the timeout callback
  * — so live state is genuinely O(sources × in-flight buckets), not
  * O(all buckets ever seen), the round-11 verdict finding against the
  * `NoTimeout` form this replaced. The TTL is the gate's lateness
  * contract: it must exceed the maximum arrival lag of a bucket,
  * because a straggler landing AFTER eviction re-opens the counter at
  * zero (the same trade-off as any watermark); within the TTL,
  * eviction can never change a verdict — the spec pins both sides.
  * (Spark's `GroupStateTimeout` fires lazily — on the next micro-batch
  * after expiry, data or not — which is exactly the eviction cadence a
  * store sweep needs; q127's `transformWithState`+`TTLConfig` is the
  * store-native alternative, but its ProcessingTime mode churns
  * continuous maintenance micro-batches under `processAllAvailable`-
  * driven tests, so the gate keeps the classic API.) The replay is one
  * keyed window (partitioned by (source, bucket) — never global) and
  * an O(sources × buckets) rollup. */
object QuotaGate {

  /** Admission quota per (source, bucket) and the fixture's bucket
    * count — 4 × 4 over the contiguous doc_id range clips genuinely at
    * every SF (≥ 6 docs per key at sf0.001), so the oracle always
    * exercises both verdicts; shared with the q271 oracle SQL. */
  val quotaPerBucket = 4L
  val quotaBuckets = 4L

  /** The gated corpus: documents with the arrival bucket assigned by
    * contiguous id-range quarters (`doc_id * B div N` — the
    * deterministic stand-in for an event-time window id). */
  def quotaDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"source", $"doc_id")
    val n = docs.agg((max($"doc_id") + 1).as("n_total"))
    docs.crossJoin(broadcast(n))
      .select($"source",
        expr(s"doc_id * $quotaBuckets div n_total").as("bucket"),
        $"doc_id")
  }

  /** EXACT relational replay of the sequential gate, rolled up per key
    * (the declared q271 query): arrivals, admissions, and the last
    * admitted id — the dashboard row that shows WHERE each source hit
    * its cap inside the bucket. */
  def quotaReplayBatch(spark: SparkSession, dir: String,
                       q: Long = quotaPerBucket): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"bucket").orderBy($"doc_id")
    quotaDocs(spark, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy($"source", $"bucket")
      .agg(count(lit(1)).as("n_arrived"),
        sum(when($"rk" <= q, 1L).otherwise(0L)).as("n_admitted"),
        max(when($"rk" <= q, $"doc_id")).as("last_admitted"))
      .orderBy($"source", $"bucket")
  }

  /** One key's fold step, shared by the spec's batch-of-one replay and
    * streaming: admit while the counter is below quota, in doc_id
    * order; returns verdicts + advanced count. */
  def runFold(docs: Seq[QuotaDoc], admittedSoFar: Long,
              q: Long = quotaPerBucket): (Seq[QuotaVerdict], Long) = {
    var n = admittedSoFar
    val out = Seq.newBuilder[QuotaVerdict]
    docs.sortBy(_.doc_id).foreach { d =>
      val ok = n < q
      if (ok) n += 1
      out += QuotaVerdict(d.source, d.bucket, d.doc_id, ok)
    }
    (out.result(), n)
  }

  /** Default state TTL in milliseconds: generous against any sane
    * micro-batch cadence — a bucket idle this long is closed. Must
    * exceed the maximum within-bucket arrival lag (see class doc). */
  val stateTtlMs: Long = 24L * 3600 * 1000

  /** Streaming mode: one admitted-counter per (source, bucket) in
    * `GroupState`, each update re-arming a processing-time timeout of
    * `ttlMs`; on timeout the counter is removed (no output — eviction
    * is invisible downstream). Feeding micro-batches in doc_id order
    * reproduces [[quotaReplayBatch]]'s admitted column exactly
    * (spec-asserted).
    *
    * Operational note: with armed processing-time timers and the
    * default zero-interval trigger, Spark 4.1's no-data micro-batches
    * busy-spin re-checking timers and `processAllAvailable` never
    * settles (reproduced on a minimal stream). Run the gate with a
    * real trigger interval, or under `processAllAvailable`-driven
    * tests set `spark.sql.streaming.noDataMicroBatches.enabled=false`
    * — eviction then rides the next DATA batch after expiry, which is
    * the store-sweep cadence the spec pins. */
  def gateStream(docs: Dataset[QuotaDoc], q: Long = quotaPerBucket,
                 ttlMs: Long = stateTtlMs): Dataset[QuotaVerdict] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => (d.source, d.bucket))
      .flatMapGroupsWithState[Long, QuotaVerdict](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: (String, Long), it: Iterator[QuotaDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // the bucket has been idle past the TTL: it is closed —
            // drop the counter; a straggler would re-open it at zero
            state.remove()
            Iterator.empty
          } else {
            val (out, n) = runFold(it.toSeq, state.getOption.getOrElse(0L), q)
            state.update(n)
            state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }
}
