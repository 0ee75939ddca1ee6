package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.operators.Quant

/** Typed event projection used by the stateful operators. */
case class UserEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

/** Per-user running aggregate carried across micro-batches.
  * `sum4` is the value sum in fixed-point 1e-4 units (long) — INTEGER
  * arithmetic, so batch Spark, streaming Spark, and the DuckDB oracle
  * agree bit-for-bit (a double running sum would drift by summation
  * order). */
case class RunningStats(n: Long, sum4: Long)

case class AnomalousEvent(user_id: Long, event_id: Long, value: Double)

/** Custom-state streaming operators (SURVEY.md §2.8). Sessionization is
  * NOT here — `session_window` expresses it built-in (see
  * [[StreamOps.sessionWindows]]); custom state is reserved for semantics
  * the built-ins genuinely can't express: a per-key RUNNING aggregate that
  * each event is compared against (streaming has no ordered running-window
  * aggregation).
  */
object StatefulOps {

  /** 1e-4 fixed-point encoding shared with the oracle:
    * CAST(floor(value*10000 + 0.5) AS BIGINT) — `Math.round` IS
    * floor(x+0.5), so the pair is bit-identical (DuckDB's bare
    * `round()` is half-away-from-zero and diverges on negative
    * halves; round-9 mirrored the oracle to the floor form). */
  private def enc(value: Double): Long = math.round(value * 10000.0) // round-ok: Math.round == floor(x+0.5), oracle mirrors

  /** Core fold, shared verbatim by batch and streaming: events in
    * (ts, event_id) order; an event is anomalous when at least `minPrior`
    * events precede it for the user and value > 3 × their running mean —
    * compared as v4 * n > 3 * sum4 (integer, no division). Returns the
    * flagged events and the advanced state. */
  def runFold(events: Seq[UserEvent], init: RunningStats,
              minPrior: Int): (Seq[AnomalousEvent], RunningStats) = {
    var st = init
    val out = Seq.newBuilder[AnomalousEvent]
    events.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val v4 = enc(e.value)
      if (st.n >= minPrior && v4 * st.n > 3L * st.sum4)
        out += AnomalousEvent(e.user_id, e.event_id, e.value)
      st = RunningStats(st.n + 1, st.sum4 + v4)
    }
    (out.result(), st)
  }

  /** Batch mode: one fold per user from empty state. */
  def anomaliesBatch(events: Dataset[UserEvent], minPrior: Int = 3): Dataset[AnomalousEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (_, it) =>
        runFold(it.toSeq, RunningStats(0L, 0L), minPrior)._1.iterator }
  }

  /** Streaming mode: the SAME fold, with the running stats held in
    * `GroupState` across micro-batches. Feeding the batches in event-time
    * order reproduces `anomaliesBatch` exactly (verified in spec). */
  def anomaliesStream(events: Dataset[UserEvent], minPrior: Int = 3): Dataset[AnomalousEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunningStats, AnomalousEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[UserEvent], state: GroupState[RunningStats]) =>
          val (out, st) = runFold(it.toSeq,
            state.getOption.getOrElse(RunningStats(0L, 0L)), minPrior)
          state.update(st)
          out.iterator
      }
  }

  /** Declared query (batch semantics over `events`, DuckDB-oracled). */
  def anomalyReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[UserEvent]
    anomaliesBatch(evs).toDF()
      .select($"user_id", $"event_id", Quant.r2($"value").as("value"))
      .orderBy($"event_id")
  }
}
