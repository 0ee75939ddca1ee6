package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, event_type: String, value: Double)
case class SessEv(user_id: Long, ts: Timestamp)
case class UEv(user_id: Long, ts: Timestamp, event_id: Long)
case class EnEv(event_id: Long, user_id: Long, ts: Timestamp,
                event_type: String)

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

  test("sessionWindows batch: gap splits sessions; end = last event + gap") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      SessEv(1L, t("2024-01-01 10:00:00")),
      SessEv(1L, t("2024-01-01 10:10:00")), // same session (10 min gap)
      SessEv(1L, t("2024-01-01 11:00:00")), // 50 min gap → new session
      SessEv(2L, t("2024-01-01 09:00:00"))).toDF()
    val out = StreamOps.sessionWindows(df, "30 minutes")
      .as[(Long, String, String, Long)].collect().toSet
    assert(out === Set(
      (1L, "2024-01-01 10:00:00.000000", "2024-01-01 10:40:00.000000", 2L),
      (1L, "2024-01-01 11:00:00.000000", "2024-01-01 11:30:00.000000", 1L),
      (2L, "2024-01-01 09:00:00.000000", "2024-01-01 09:30:00.000000", 1L)))
  }

  test("sessionWindows streaming: watermark closes sessions on a MemoryStream") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val mem = MemoryStream[SessEv]
    val q = StreamOps.sessionWindows(mem.toDF(), "30 minutes", "10 minutes",
        streaming = true)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    mem.addData(SessEv(1L, t("2024-01-01 10:00:00")),
      SessEv(1L, t("2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData(SessEv(1L, t("2024-01-01 12:00:00"))) // advances watermark, closes session
    q.processAllAvailable()
    mem.addData(SessEv(1L, t("2024-01-01 14:00:00")))
    q.processAllAvailable()
    val out = spark.table("sess").as[(Long, String, String, Long)].collect().toSet
    q.stop()
    assert(out.contains((1L, "2024-01-01 10:00:00.000000", "2024-01-01 10:40:00.000000", 2L)))
  }

  test("csvAppendSink: foreachBatch appends each micro-batch; checkpoint dir written") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[Ev]
    val q = StreamOps.csvAppendSink(
      mem.toDF().select($"event_type", $"value"), out, ckpt)
    mem.addData(Ev(t("2024-01-01 10:00:00"), "a", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(t("2024-01-01 10:01:00"), "b", 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.csv(out).count()
    assert(rows === 2L)
    assert(new java.io.File(ckpt, "offsets").listFiles().nonEmpty) // K3 cursor state
  }

  test("dedupStream: repeats within the watermark window are dropped; state is evicted after it") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.dedupStream(mem.toDF(), Seq("event_type"), "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    mem.addData(
      Ev(t("2024-01-01 10:00:00"), "click", 1.0),
      Ev(t("2024-01-01 10:01:00"), "click", 2.0)) // dup key within window
    q.processAllAvailable()
    assert(spark.table("dedup").count() === 1L)
    // advance the watermark far past the first key's expiry...
    mem.addData(Ev(t("2024-01-01 12:00:00"), "view", 3.0))
    q.processAllAvailable()
    // ...then the same key reappears and is accepted again (state evicted)
    mem.addData(Ev(t("2024-01-01 12:01:00"), "click", 4.0))
    q.processAllAvailable()
    val types = spark.table("dedup").as[Ev].collect().map(e => (e.event_type, e.value)).toSet
    q.stop()
    assert(types === Set(("click", 1.0), ("view", 3.0), ("click", 4.0)))
  }

  test("attributionJoin stream-stream: purchases within the horizon match; state evicted by watermark") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val clicks = MemoryStream[UEv]
    val purchases = MemoryStream[UEv]
    val q = StreamOps.attributionJoin(
        clicks.toDF(), purchases.toDF(), "30 minutes", "10 minutes", streaming = true)
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    clicks.addData(UEv(1L, t("2024-01-01 10:00:00"), 100L))
    purchases.addData(
      UEv(1L, t("2024-01-01 10:10:00"), 200L), // within 30 min → match
      UEv(1L, t("2024-01-01 11:10:00"), 201L), // outside horizon → no match
      UEv(2L, t("2024-01-01 10:10:00"), 202L)) // other user → no match
    q.processAllAvailable()
    // advance both watermarks so the joinable region closes and rows emit
    clicks.addData(UEv(9L, t("2024-01-01 13:00:00"), 101L))
    purchases.addData(UEv(9L, t("2024-01-01 13:00:00"), 300L))
    q.processAllAvailable()
    val got = spark.table("attr").as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(got.contains((100L, 200L, 1L)))
    assert(!got.exists(r => r._2 == 201L || r._2 == 202L))
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

  test("enrichEvents stream ≡ batch: static dim broadcast per micro-batch, left rows survive") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val dim = Seq((1L, "BUILDING", false), (2L, "MACHINERY", true))
      .toDF("d_user", "segment", "acct_neg")
    val evs = Seq(
      EnEv(10L, 1L, t("2024-01-01 10:00:00"), "click"),
      EnEv(11L, 2L, t("2024-01-01 10:05:00"), "view"),
      EnEv(12L, 999L, t("2024-01-01 10:06:00"), "click")) // no profile
    val batch = StreamOps.enrichEvents(evs.toDF(), dim)
      .as[(Long, Long, Timestamp, String, String, Boolean)].collect().toSet

    val mem = MemoryStream[EnEv]
    val q = StreamOps.enrichEvents(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enr").outputMode("append")
      .start()
    mem.addData(evs.take(2): _*)
    q.processAllAvailable()
    mem.addData(evs.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.table("enr")
      .as[(Long, Long, Timestamp, String, String, Boolean)].collect().toSet
    q.stop()

    assert(streamed === batch)
    // the dimension-less event survived, explicitly unknown
    assert(batch.exists(r => r._2 == 999L && r._5 == "unknown" && !r._6))
    assert(batch.size === 3)
  }
}
