package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamOpsSpec extends SparkSpec {

  def t(s: String) = Timestamp.valueOf(s)

  test("windowedCounts over MemoryStream: watermark closes windows and drops late rows") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext

    val mem = MemoryStream[Ev]
    val query = StreamOps.windowedCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()

    // batch 1: two events in the 10:00 window
    mem.addData(Ev(t("2024-01-01 10:05:00"), "click", 1.0),
      Ev(t("2024-01-01 10:20:00"), "click", 2.0))
    query.processAllAvailable()
    // watermark = 10:20 - 10min = 10:10 → 10:00 window still open, nothing emitted
    assert(spark.table("wc").count() === 0L)

    // batch 2: event far ahead advances the watermark past 11:00 → closes 10:00
    mem.addData(Ev(t("2024-01-01 12:00:00"), "view", 3.0))
    query.processAllAvailable()
    // batch 3: a LATE 10:00-window event (watermark is now 11:50) must be dropped
    mem.addData(Ev(t("2024-01-01 10:30:00"), "click", 99.0))
    query.processAllAvailable()
    // batch 4: advance far enough to close the 12:00 window too
    mem.addData(Ev(t("2024-01-01 14:00:00"), "click", 1.0))
    query.processAllAvailable()

    val out = spark.table("wc")
      .select($"window_start", $"event_type", $"n_events",
        $"sum_value".cast("double"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    query.stop()

    assert(out.contains((t("2024-01-01 10:00:00"), "click", 2L, 3.0))) // late 99.0 dropped
    assert(out.contains((t("2024-01-01 12:00:00"), "view", 1L, 3.0)))
  }

  test("the same transform runs identically in batch mode (stream-batch unification)") {
    val sparkS = spark
    import sparkS.implicits._
    val batch = Seq(
      Ev(t("2024-01-01 10:05:00"), "click", 1.0),
      Ev(t("2024-01-01 10:20:00"), "click", 2.0),
      Ev(t("2024-01-01 12:00:00"), "view", 3.0)).toDF()
    val out = StreamOps.windowedCounts(batch)
      .select($"window_start", $"event_type", $"n_events", $"sum_value".cast("double"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(out === Set(
      (t("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (t("2024-01-01 12:00:00"), "view", 1L, 3.0)))
  }
}
