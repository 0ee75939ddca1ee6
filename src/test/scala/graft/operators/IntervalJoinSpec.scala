package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  test("eventsInWindows matches a brute-force range join; zero-event windows kept") {
    import spark.implicits._
    val got = IntervalJoin.eventsInWindows(spark, sf).collect()
      .map(r => r.getAs[Long]("window_id") -> r.getAs[Long]("n_events")).toMap
    // brute force on the collected event set (sf0.001 is small)
    val ts = Tables.events(spark, sf)
      .select($"event_id", unix_micros($"ts").as("t"))
      .as[(Long, Long)].collect()
    val want = ts.filter(_._1 % IntervalJoin.windowEveryN == 0).map { case (id, t0) =>
      id -> ts.count { case (_, t) =>
        t >= t0 && t < t0 + IntervalJoin.horizonUs }.toLong
    }.toMap
    assert(got === want)
    // the anchor event sits inside its own window, so counts are >= 1 —
    // but the left join keeps any zero-count window by construction
    got.values.foreach(n => assert(n >= 1L))
  }

  test("plan: bucketized equi-join — no nested-loop or cartesian fallback") {
    val p = IntervalJoin.eventsInWindows(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the range predicate rides an equi hash join on the bucket key
    assert(p.contains("bucket"), p)
  }
}
