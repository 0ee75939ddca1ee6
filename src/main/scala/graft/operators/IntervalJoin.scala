package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Point-in-interval (range) join — "which events fall inside each
  * monitoring window" — the join family Spark has no native optimization
  * for: a raw `a.ts BETWEEN w.start AND w.end` join degenerates to
  * BroadcastNestedLoop (or worse, a cartesian) because there is no equi
  * key. The scalable rewrite is BUCKETIZATION: quantize time to
  * fixed-width buckets, replicate each interval into the buckets it
  * overlaps (bounded by interval span / bucket width + 1), map each point
  * to its single bucket, equi-join on the bucket, and re-check the exact
  * predicate inside the match. The cross product never materializes; the
  * join is a plain hash join on an integer key.
  *
  * Trade-off knob (documented for 100 TB): bucket width ≈ typical
  * interval length. Too narrow → heavy interval replication; too wide →
  * many false candidates for the residual filter. Hot buckets (event
  * storms) shard like any skewed equi-join — AQE skew handling or the
  * [[SkewJoin]] salting pattern applies unchanged, which is exactly why
  * reducing a range join to an equi-join is the scale move.
  *
  * All arithmetic is exact integer micros (`epoch_us` both engines). */
object IntervalJoin {

  val windowEveryN = 199L
  val horizonUs: Long = 2L * 3600L * 1000000L   // 2-hour windows
  val bucketUs: Long = 3600L * 1000000L         // 1-hour buckets

  /** Every `windowEveryN`-th event anchors a [t, t+horizon) window; count
    * the events inside each (zero-event windows kept via left join). */
  def eventsInWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", unix_micros($"ts").as("t"))
    val win = ev.filter($"event_id" % windowEveryN === 0)
      .select($"event_id".as("window_id"), $"t".as("w_start"),
        ($"t" + horizonUs).as("w_end"))
    // interval → covered buckets (≤ horizon/bucket + 1 = 3 rows each)
    val winB = win.withColumn("bucket",
      explode(sequence(expr(s"w_start div $bucketUs"),
        expr(s"(w_end - 1) div $bucketUs"))))
    val pts = ev.withColumn("bucket", expr(s"t div $bucketUs"))
    // a point lives in exactly ONE bucket, so each (point, window) pair
    // meets at most once — no post-join dedup needed
    val hits = pts.join(winB, "bucket")
      .filter($"t" >= $"w_start" && $"t" < $"w_end")
      .groupBy($"window_id")
      .agg(count(lit(1)).as("n_events"))
    win.join(hits, Seq("window_id"), "left")
      .select($"window_id", $"w_start",
        coalesce($"n_events", lit(0L)).as("n_events"))
      .orderBy($"window_id")
  }
}
