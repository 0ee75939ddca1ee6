package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms (SURVEY.md §2.8): the reference's
  * stream-shaped structures — cursor-checkpointed incremental fetch and
  * progress accounting — map to watermarked windowed aggregation with
  * checkpointing. The transform is defined once and works on BOTH a batch
  * DataFrame and a `readStream`/MemoryStream source, which is how it is
  * unit-tested (see StreamOpsSpec) and how a production job would run it.
  */
object StreamOps {

  /** Tumbling-window event counts with a watermark: late rows beyond the
    * delay are dropped (append mode), mirroring the reference's
    * newest-event-time cursor tracking (`tweet_download.py:55–58,91`). */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermarkDelay: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window($"ts", windowLen), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,4)")).as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type",
        $"n_events", $"sum_value")
  }
}
