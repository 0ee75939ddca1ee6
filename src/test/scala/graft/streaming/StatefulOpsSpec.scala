package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StatefulOpsSpec extends SparkSpec {

  def t(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    // user 1: steady ~10, then a spike
    UserEvent(1L, 1L, t("2024-01-01 10:00:00"), 10.0),
    UserEvent(1L, 2L, t("2024-01-01 10:01:00"), 11.0),
    UserEvent(1L, 3L, t("2024-01-01 10:02:00"), 9.0),
    UserEvent(1L, 4L, t("2024-01-01 10:03:00"), 100.0), // > 3×10 → anomaly
    UserEvent(1L, 5L, t("2024-01-01 10:04:00"), 12.0),
    // user 2: too few priors for its spike to count
    UserEvent(2L, 6L, t("2024-01-01 10:00:00"), 1.0),
    UserEvent(2L, 7L, t("2024-01-01 10:01:00"), 50.0))

  test("batch: spike after ≥3 priors is flagged; early spikes are not") {
    import spark.implicits._
    val out = StatefulOps.anomaliesBatch(spark.createDataset(evs)).collect()
    assert(out.map(_.event_id).toSet === Set(4L))
  }

  test("runFold: state advances across calls exactly as one combined call") {
    val (o1, s1) = StatefulOps.runFold(evs.filter(_.user_id == 1L).take(3),
      RunningStats(0L, 0L), 3)
    val (o2, s2) = StatefulOps.runFold(evs.filter(_.user_id == 1L).drop(3), s1, 3)
    val (all, sAll) = StatefulOps.runFold(evs.filter(_.user_id == 1L),
      RunningStats(0L, 0L), 3)
    assert(o1 ++ o2 === all)
    assert(s2 === sAll)
  }

  test("streaming equals batch when batches arrive in event-time order") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = StatefulOps.anomaliesStream(mem.toDS())
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    mem.addData(evs.take(3): _*) // first micro-batch: priors only
    q.processAllAvailable()
    assert(spark.table("anom").count() === 0L)
    mem.addData(evs.drop(3): _*) // spike arrives in a LATER batch
    q.processAllAvailable()
    val streamed = spark.table("anom").as[AnomalousEvent].collect().toSet
    q.stop()
    val batch = StatefulOps.anomaliesBatch(spark.createDataset(evs)).collect().toSet
    assert(streamed === batch)
    assert(streamed.map(_.event_id) === Set(4L))
  }
}
