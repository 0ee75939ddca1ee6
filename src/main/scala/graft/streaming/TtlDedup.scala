package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.Tables
import graft.functions.TextFunctions.fingerprint

/** One content occurrence on the dedup stream: key = fingerprint, event
  * time in whole epoch days (integer — engine-exact gap arithmetic). */
case class OccRow(fp: String, doc_id: Long, occ: Int, ts_day: Int)

case class TtlVerdict(fp: String, doc_id: Long, occ: Int, ts_day: Int,
                      admitted: Boolean)

/** TTL dedup gate on Spark 4's `transformWithState` (the StatefulProcessor
  * API that replaced `flatMapGroupsWithState` as the arbitrary-state
  * surface): admit a content fingerprint iff the SAME fingerprint was not
  * seen within the trailing TTL window — re-crawls inside the horizon are
  * suppressed, a re-publication after it passes again. This is the
  * crawl-frequency contract a production ingest dedup runs with (q94's
  * Bloom gate never forgets; this gate deliberately does).
  *
  * Semantics are EVENT-time and deterministic: per fingerprint, events in
  * (ts, doc_id, occ) order; admit iff no previous event OR the gap to the
  * previous SEEN event (admitted or not) exceeds the TTL. "Gap from last
  * SEEN, not last ADMITTED" is what makes the rule window-expressible —
  * one `lag` per fingerprint — so the declared q127 query is the exact
  * relational replay and the DuckDB oracle replays it bit-for-bit. (The
  * last-ADMITTED variant is a greedy recursive chain: expressible in the
  * processor but not as a window — the classic case where streaming state
  * is strictly more expressive than SQL.)
  *
  * Scale shape: the replay is ONE fingerprint-keyed window (shuffle +
  * per-key sort, bounded partitions); the stream shuffles each micro-batch
  * once on fingerprint and holds ONE long per key — and the state API
  * accepts a [[TTLConfig]] so the store itself evicts idle keys, keeping
  * total state O(active fingerprints within TTL), not O(all ever seen).
  * `transformWithState` requires the RocksDB state store provider (the
  * spec sets it); `GroupState` has no per-key TTL at all — the API is the
  * point here.
  */
object TtlDedup {

  /** TTL horizon in days, and the occurrence shifts: occ 1 re-arrives
    * INSIDE the horizon (suppressed), occ 2 outside it (re-admitted).
    * Shared with the q127 oracle. */
  val ttlDays = 7
  val occShifts = Seq(0, 3, 11)

  /** The occurrence stream derived from `documents`: every doc's content
    * appears at a per-doc base day plus each shift. Docs with identical
    * TEXT share a fingerprint chain — they dedup against each other,
    * which is the realistic behavior. */
  def occurrences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(fingerprint($"text").as("fp"), $"doc_id",
        ($"doc_id" % 30).cast("int").as("base"))
      .select($"fp", $"doc_id",
        explode(typedLit(occShifts.zipWithIndex.map(_.swap))).as("o"))
      .select($"fp", $"doc_id", $"o._1".as("occ"),
        ($"doc_id" % 30 + $"o._2").cast("int").as("ts_day"))
  }

  /** EXACT relational replay (the declared q127 query): one lag window
    * per fingerprint. */
  def ttlDedupReplay(spark: SparkSession, dir: String,
                     ttl: Int = ttlDays): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"fp").orderBy($"ts_day", $"doc_id", $"occ")
    occurrences(spark, dir)
      .withColumn("prev", lag($"ts_day", 1).over(w))
      .select($"doc_id", $"occ", $"ts_day".cast("long").as("ts_day"),
        ($"prev".isNull || $"ts_day" - $"prev" > ttl).as("admitted"))
      .orderBy($"doc_id", $"occ")
  }

  /** The stateful processor: one long (last-seen day) per fingerprint.
    * Batch rows are folded in (ts, doc_id, occ) order so multi-row
    * micro-batches reproduce the replay exactly. */
  class TtlProcessor(ttl: Int)
      extends StatefulProcessor[String, OccRow, TtlVerdict] {
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("lastSeen",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[OccRow],
                                 timerValues: TimerValues): Iterator[TtlVerdict] = {
      val sorted = rows.toSeq.sortBy(r => (r.ts_day, r.doc_id, r.occ))
      var last: Option[Long] =
        if (lastSeen.exists()) Some(lastSeen.get()) else None
      val out = sorted.map { r =>
        val admit = last.forall(l => r.ts_day.toLong - l > ttl)
        last = Some(r.ts_day.toLong)
        TtlVerdict(r.fp, r.doc_id, r.occ, r.ts_day, admit)
      }
      last.foreach(lastSeen.update)
      out.iterator
    }
  }

  /** Streaming mode. Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` (transformWithState's contract). */
  def gateStream(docs: Dataset[OccRow], ttl: Int = ttlDays): Dataset[TtlVerdict] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .transformWithState(new TtlProcessor(ttl), TimeMode.None(),
        OutputMode.Append())
  }
}
