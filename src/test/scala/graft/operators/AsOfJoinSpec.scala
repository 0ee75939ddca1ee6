package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: latest right at-or-before each left per key; inclusive at equal ts; null before first right") {
    def t(s: String) = s"2020-01-01 $s:00"
    val left = Seq((1L, t("10"), 1L), (1L, t("12"), 2L), (2L, t("05"), 9L))
      .toDF("user_id", "ts", "event_id")
      .withColumn("ts", to_timestamp($"ts"))
    val right = Seq((1L, t("09"), 10L), (1L, t("11"), 11L), (1L, t("12"), 12L))
      .toDF("user_id", "ts", "purchase_id")
      .withColumn("ts", to_timestamp($"ts"))
      .withColumn("event_id", lit(null).cast("long"))
      .select("user_id", "ts", "event_id", "purchase_id")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "purchase_id")
      .select($"event_id", $"asof_match").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // left@10 -> right@09; left@12 -> right@12 (inclusive bound); u2 has no right
    assert(got === Map(1L -> 10L, 2L -> 12L, 9L -> -1L))
  }

  test("asOf agrees with a brute-force reference on random data (multi-seed)") {
    for (seed <- Seq(7, 42)) {
      val rng = new scala.util.Random(seed)
      val base = java.sql.Timestamp.valueOf("2020-06-01 00:00:00").getTime
      def ts(off: Int) = new java.sql.Timestamp(base + off * 1000L)
      val leftRows = (1 to 200).map(i =>
        (rng.nextInt(10).toLong, ts(rng.nextInt(5000)), i.toLong))
      // rights deduped per (user, ts) — the operator's documented contract
      val rightRows = (1 to 150).map(i =>
        (rng.nextInt(10).toLong, ts(rng.nextInt(5000)), 1000L + i))
        .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val left = leftRows.toDF("user_id", "ts", "event_id")
      val right = rightRows.toDF("user_id", "ts", "purchase_id")
        .withColumn("event_id", lit(null).cast("long"))
        .select("user_id", "ts", "event_id", "purchase_id")
      val got = AsOfJoin.asOf(left, right, "user_id", "ts", "purchase_id")
        .select($"event_id", $"asof_match").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val want = leftRows.map { case (u, t, id) =>
        val eligible = rightRows.filter(r => r._1 == u && !r._2.after(t))
        id -> (if (eligible.isEmpty) None
               else Some(eligible.maxBy(r => (r._2.getTime, r._3))._3))
      }.toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("clicksWithLastPurchase: every match is a purchase at-or-before the click for that user") {
    val out = AsOfJoin.clicksWithLastPurchase(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select($"event_id", $"user_id", lower($"event_type").as("et"), $"ts")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getTimestamp(3))).toMap
    rows.filter(!_.isNullAt(2)).take(50).foreach { r =>
      val click = ev(r.getLong(0))
      val p = ev(r.getLong(2))
      assert(p._2 === "purchase" && p._1 === click._1)
      assert(!p._3.after(click._3)) // purchase.ts <= click.ts
    }
  }
}
