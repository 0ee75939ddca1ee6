package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of join — the canonical "operator Spark lacks whole-cloth" (builder
  * brief §custom-operators): each left event is matched to the LATEST
  * right event with `right.ts <= left.ts` for the same key. The classic
  * uses: attach the most recent price tick to a trade, the most recent
  * purchase to a click, the last checkpointed state to an event.
  *
  * Spark-first composition instead of a custom SparkPlan: both streams
  * union into one relation tagged by side, and a single per-key window
  * takes the running `last(right-id, ignoreNulls)` in (ts, side) order —
  * rights sort before lefts at equal ts, giving the ASOF `>=` inclusive
  * bound. ONE shuffle on the key and a linear scan per partition — the
  * naive formulation (range join then max per left row) explodes to
  * O(|left|×|right|) per key before pruning, and Spark plans it as BNLJ.
  * DuckDB has the operator natively (`ASOF LEFT JOIN`), which is the
  * oracle: two independent formulations, one result.
  *
  * Right rows are pre-deduped to one per (key, ts) — keep max id — so
  * tie-at-same-ts resolution is deterministic in BOTH engines (ASOF's
  * choice among equal timestamps is otherwise unspecified).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           key: String, ts: String, rightId: String): DataFrame = {
    import left.sparkSession.implicits._
    val l = left.withColumn("side", lit(1))
      .withColumn(rightId, lit(null).cast("long"))
    val r = right.withColumn("side", lit(0))
    val tagged = l.unionByName(r.select(l.columns.map(col): _*), allowMissingColumns = false)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, $"side".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_match", last(when($"side" === 0, col(rightId)), ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .drop("side", rightId)
  }

  /** Declared query: each click joined to the user's most recent purchase
    * at-or-before the click. */
  def clicksWithLastPurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", lower($"event_type").as("et"), $"ts")
    val clicks = ev.filter($"et" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"et" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("purchase_id"))
    asOf(clicks, purchases.select($"user_id", $"ts",
        lit(null).cast("long").as("event_id"), $"purchase_id"),
        key = "user_id", ts = "ts", rightId = "purchase_id")
      .select($"event_id", $"user_id", $"asof_match".as("matched_purchase_id"))
      .orderBy($"event_id")
  }
}
