package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cursor-paginated API source shape (SURVEY.md §2.1 S3, §3 E2): the
  * reference's Twitter v2 loop fetches nested JSON pages (`data` array +
  * `meta.next_token` cursor, `tweet_download.py:32–53,96–99`) and flattens
  * them into entity tables.
  *
  * The network fetch itself is driver code (not oracle-testable); what the
  * engine owns is the FLATTEN: nested page document → exploded rows →
  * nested-field projection (incl. `referenced_tweets[0]`-style first-element
  * access) → last-wins entity dedup. Here pages are synthesized
  * deterministically from `events` (100 rows/page, mirroring the
  * `max_results` paging) so the flatten is testable end-to-end; a live
  * source would feed identical page documents through the same flatten.
  */
object PagedJson {

  /** Build nested page documents from events: page = event_id / 100,
    * data = sorted array of event structs, meta.next_token = next page id
    * (null on the last page). */
  def renderPages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    // the cursor's end is a scalar folded INTO the plan (1-row aggregate,
    // broadcast cross join) — no driver-side .first() materialization; the
    // max branch is a column-pruned scan of event_id only with partial
    // (map-side) max, so the "second scan" reads one column
    val mx = events.agg(max(($"event_id" / 100).cast("long")).as("max_page"))
    events
      .groupBy(($"event_id" / 100).cast("long").as("page_id"))
      .agg(sort_array(collect_list(struct(
        $"event_id", $"user_id", $"event_type", $"value", $"ts"))).as("data"))
      .crossJoin(broadcast(mx))
      .withColumn("meta", struct(
        when($"page_id" < $"max_page", ($"page_id" + 1).cast("string"))
          .as("next_token")))
      .drop("max_page")
  }

  /** Flatten pages back to rows: explode(data) + nested-field access —
    * the engine-side equivalent of `process_response`
    * (`tweet_download.py:32–53`). `first_in_page` demonstrates
    * `referenced_tweets[0]`-style array-element + field access. */
  def flattenPages(pages: DataFrame): DataFrame = {
    import pages.sparkSession.implicits._
    pages
      .select($"page_id", $"meta.next_token".as("next_token"),
        $"data".getItem(0).getField("event_id").as("first_in_page"),
        explode($"data").as("r"))
      .select(
        $"r.event_id".as("event_id"),
        $"r.user_id".as("user_id"),
        $"r.event_type".as("event_type"),
        round($"r.value", 2).as("value"), // round-ok: half-up 2dp before text serialization; oracle mirrors floor(x*1e2+0.5)
        $"page_id", $"next_token", $"first_in_page")
  }

  /** End-to-end render→flatten round trip as the declared query. */
  def pagedRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    flattenPages(renderPages(spark, dir)).orderBy($"event_id")
  }
}
