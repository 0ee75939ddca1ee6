package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("conditionalCounts: totals add up to the table size; matched+bad ≤ total") {
    val out = Relational.conditionalCounts(spark, sf).collect()
    val total = out.map(_.getAs[Long]("total")).sum
    assert(total === Tables.events(spark, sf).count())
    out.foreach { r =>
      assert(r.getAs[Long]("matched") <= r.getAs[Long]("total"))
      assert(r.getAs[Long]("bad") <= r.getAs[Long]("total"))
    }
  }

  test("distinctTypes: lowercase, unique, sorted") {
    import spark.implicits._
    val types = Relational.distinctTypes(spark, sf).as[String].collect().toSeq
    assert(types === types.sorted)
    assert(types.distinct === types)
    assert(types.forall(t => t === t.toLowerCase))
  }

  test("lastWinsPerUser: exactly one row per user, the latest by (ts, event_id)") {
    import spark.implicits._
    val out = Relational.lastWinsPerUser(spark, sf)
    val users = out.select("user_id").as[Long].collect().toSeq
    assert(users.distinct.length === users.length)
    assert(users.length.toLong ===
      Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("ordersWithCustomer: left join keeps all orders, broadcast planned") {
    val out = Relational.ordersWithCustomer(spark, sf)
    assert(out.count() === Tables.orders(spark, sf).count())
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("customersWithoutOrders: segments partition all non-big-spender customers") {
    import spark.implicits._
    val n = Relational.customersWithoutOrders(spark, sf)
      .agg(sum("n_customers")).head().getLong(0)
    val bigSpenders = Tables.orders(spark, sf)
      .filter($"o_totalprice" > 350000.0).select($"o_custkey").distinct()
    val expected = Tables.customer(spark, sf)
      .join(bigSpenders, $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(n === expected)
  }

  test("pricingSummary: per-group counts sum to lineitem size; sums positive") {
    val out = Relational.pricingSummary(spark, sf).collect()
    assert(out.map(_.getAs[Long]("count_order")).sum === Tables.lineitem(spark, sf).count())
    out.foreach(r => assert(r.getAs[Double]("sum_disc_price") > 0.0))
  }

  test("revenueByNation: 25 nations at every SF, revenue positive, dims broadcast") {
    val df = Relational.revenueByNation(spark, sf)
    val out = df.collect()
    assert(out.length === 25)
    out.foreach(r => assert(r.getAs[Double]("revenue") > 0.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("topOrdersPerCustomer: ≤k per customer, rank starts at 1, price descending") {
    val out = Relational.topOrdersPerCustomer(spark, sf, k = 3).collect()
    out.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rk")).toSeq.sorted
      assert(ranks === (1 to rs.length))
      assert(rs.length <= 3)
      val prices = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("o_totalprice"))
      assert(prices === prices.sortBy(-_))
    }
  }

  test("unionDedup: no duplicate text keys; copy counts ≥ 1") {
    val out = Relational.unionDedup(spark, sf).collect()
    val keys = out.map(_.getAs[String]("text_key")).toSeq
    assert(keys.distinct.length === keys.length)
    assert(out.forall(_.getAs[Long]("n_copies") >= 1L))
  }

  test("hourlyEventCounts: window totals add up to table size") {
    val out = Relational.hourlyEventCounts(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum === Tables.events(spark, sf).count())
  }

  test("dateFormatKit: dotted/iso/german renderings agree with the source date") {
    val out = Relational.dateFormatKit(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val dotted = r.getAs[String]("dotted") // dd.MM.yyyy
      val iso = r.getAs[String]("iso") // yyyy-MM-dd
      val Array(dd, mm, yyyy) = dotted.split("\\.")
      assert(iso === s"$yyyy-$mm-$dd")
      assert(r.getAs[String]("german").startsWith(s"$dd. "))
      assert(r.getAs[String]("german").endsWith(s" $yyyy"))
    }
  }

  test("rollupRevenue: subtotals and grand total are consistent across grains") {
    import spark.implicits._
    val out = Relational.rollupRevenue(spark, sf).collect()
    val detail = out.filter(r => r.getAs[Long]("g_nation") == 0L &&
      r.getAs[Long]("g_priority") == 0L)
    val natSub = out.filter(r => r.getAs[Long]("g_nation") == 0L &&
      r.getAs[Long]("g_priority") == 1L)
    val grand = out.filter(_.getAs[Long]("g_nation") == 1L)
    assert(grand.length === 1 && grand.head.getAs[String]("nation") === "ALL")
    // grand total row aggregates every order exactly once
    assert(grand.head.getAs[Long]("n_orders") ===
      Tables.orders(spark, sf).count())
    assert(detail.map(_.getAs[Long]("n_orders")).sum ===
      grand.head.getAs[Long]("n_orders"))
    // each nation subtotal equals the sum of its detail rows (counts are
    // integer-exact; revenue was decimal-summed so compare at 2dp)
    natSub.foreach { s =>
      val nat = s.getAs[String]("nation")
      val mine = detail.filter(_.getAs[String]("nation") == nat)
      assert(mine.map(_.getAs[Long]("n_orders")).sum === s.getAs[Long]("n_orders"))
      assert(math.abs(mine.map(_.getAs[Double]("revenue")).sum -
        s.getAs[Double]("revenue")) < 0.01)
    }
  }

  test("userActivityWindows: seq is dense per user, gaps non-negative, first gap null") {
    import spark.implicits._
    val out = Relational.userActivityWindows(spark, sf)
      .orderBy($"user_id", $"seq").collect()
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("seq")).toSeq === (1L to rows.length))
      rows.foreach { r =>
        if (r.getAs[Long]("seq") == 1L) assert(r.isNullAt(r.fieldIndex("gap_us")))
        else assert(r.getAs[Long]("gap_us") >= 0L) // ordered by ts: gaps never negative
      }
    }
  }

  test("langMatrix: dense pivot — row sums equal per-source doc counts, no nulls") {
    import spark.implicits._
    val out = Relational.langMatrix(spark, sf).collect()
    val perSource = graft.Tables.documents(spark, sf)
      .groupBy($"source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(out.map(_.getAs[String]("source")).toSet === perSource.keySet)
    out.foreach { r =>
      val cells = Relational.pivotLangs.map(l => r.getAs[Long](l))
      cells.foreach(c => assert(c >= 0L)) // dense zeros, never null
      assert(cells.sum === perSource(r.getAs[String]("source")))
    }
  }

  test("hourlyGapFill: dense spine, counts conserve, forward fill monotone persistence") {
    import spark.implicits._
    val out = Relational.hourlyGapFill(spark, sf).collect()
    val types = out.map(_.getAs[String]("event_type")).distinct
    val hours = out.map(_.getAs[Long]("h")).distinct.sorted
    // dense: every (type, hour) cell exists exactly once
    assert(out.length === types.length * hours.length)
    assert(hours === (hours.head to hours.last))
    // counts conserve vs the raw table
    val total = graft.Tables.events(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_events")).sum === total)
    // gap rows carry the PREVIOUS hour's filled value forward
    types.foreach { t =>
      val series = out.filter(_.getAs[String]("event_type") == t)
        .sortBy(_.getAs[Long]("h"))
      series.zip(series.drop(1)).foreach { case (a, b) =>
        if (b.getAs[Long]("n_events") == 0L)
          assert(b.getAs[Double]("filled_sum") === a.getAs[Double]("filled_sum"))
      }
    }
    assert(out.exists(_.getAs[Long]("n_events") == 0L)) // gaps genuinely exist
  }

  test("langMatrixLong: unpivot(pivot(T)) = groupBy(T) — the roundtrip law, in-engine") {
    import spark.implicits._
    val got = Relational.langMatrixLong(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
        r.getAs[Long]("n_docs")).toMap
    val want = graft.Tables.documents(spark, sf)
      .groupBy($"source", $"lang").count().collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
        r.getAs[Long]("count")).toMap
    assert(got === want)
  }

  test("scd2History: versions dense, one current row per key, intervals chain half-open") {
    val rows = Relational.scd2History(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(_.getAs[Long]("doc_id"))
    byKey.foreach { case (_, hist) =>
      val sorted = hist.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ===
        (1L to hist.length.toLong))
      assert(sorted.count(_.getAs[Boolean]("is_current")) === 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          // half-open chaining: each closed interval ends where the next opens
          assert(prev.getAs[java.sql.Date]("valid_to") ===
            next.getAs[java.sql.Date]("valid_from"))
          assert(!prev.getAs[Boolean]("is_current"))
        case _ => ()
      }
    }
    // revision rules actually fire: % 21 keys have 3 versions, % 7 two
    val triple = byKey.filter(_._1 % 21 == 0)
    if (triple.nonEmpty) assert(triple.values.forall(_.length === 3))
  }

  test("funnelOver: order matters, strict timestamps, partial funnels counted per step") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // u1 completes; u2 clicks BEFORE its first view (not a funnel click);
    // u3 skips the click step; u4's click ties the view ts (strict > drops it)
    val events = Seq(
      (1L, t(1), 101L, "view"), (1L, t(2), 102L, "click"), (1L, t(3), 103L, "purchase"),
      (2L, t(1), 201L, "click"), (2L, t(2), 202L, "view"), (2L, t(3), 203L, "purchase"),
      (3L, t(1), 301L, "view"), (3L, t(2), 302L, "purchase"),
      (4L, t(1), 401L, "view"), (4L, t(1), 402L, "click"), (4L, t(2), 403L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Relational.funnelOver(events).head()
    assert(r.getAs[Long]("n_users") === 4L)
    assert(r.getAs[Long]("n_view") === 4L)
    assert(r.getAs[Long]("n_view_click") === 1L)
    assert(r.getAs[Long]("n_full_funnel") === 1L)
    assert(r.getAs[Double]("view_to_purchase") === 0.25)
  }

  test("funnelReport: step counts are monotone non-increasing on real events") {
    val r = Relational.funnelReport(spark, sf).head()
    assert(r.getAs[Long]("n_users") >= r.getAs[Long]("n_view"))
    assert(r.getAs[Long]("n_view") >= r.getAs[Long]("n_view_click"))
    assert(r.getAs[Long]("n_view_click") >= r.getAs[Long]("n_full_funnel"))
    assert(r.getAs[Long]("n_view") > 0L)
  }

  test("pointInTimeJoin: exactly one version per probe; the version valid at that date") {
    import spark.implicits._
    val rows = Relational.pointInTimeJoin(spark, sf).collect()
    graft.CacheGuard.release()
    val nDocs = graft.Tables.documents(spark, sf).count()
    // every (doc, probe date) resolves to exactly one version — no
    // future leakage duplicate, no gap (probe dates are after every v0)
    assert(rows.length === nDocs * 3)
    assert(rows.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[java.sql.Date]("probe_date"))).distinct.length === rows.length)
    // a revised doc (doc_id % 7 == 0, revision lands Jan 31 + id%7) must
    // see version 1 at the January probe and a LATER version by March
    val revised = rows.filter(r => r.getAs[Long]("doc_id") % 7 == 0)
    if (revised.nonEmpty) {
      val byDoc = revised.groupBy(_.getAs[Long]("doc_id"))
      byDoc.values.foreach { g =>
        val vs = g.sortBy(_.getAs[java.sql.Date]("probe_date").toString)
          .map(_.getAs[Long]("version"))
        assert(vs.head === 1L)
        assert(vs.last >= 2L)
        assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
      }
    }
  }

  test("forgetUsers: cascade counts are consistent and the deletion list is honored") {
    import spark.implicits._
    val rows = Relational.forgetUsers(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_deleted"),
          r.getAs[Long]("n_after"))).toMap
    assert(rows.keySet === Set("customer", "orders", "lineitem", "events"))
    rows.values.foreach { case (before, deleted, after) =>
      assert(after === before - deleted)
      assert(deleted >= 0L && deleted <= before)
    }
    // direct recount of the customer deletions
    val delCust = graft.Tables.customer(spark, sf)
      .filter($"c_custkey" % 97 === 0).count()
    assert(rows("customer")._2 === delCust)
    // every deleted order belongs to a deleted customer — recount orders
    val delOrd = graft.Tables.orders(spark, sf)
      .filter($"o_custkey" % 97 === 0).count()
    assert(rows("orders")._2 === delOrd)
  }

  test("pseudonymizeAudit: the keyed remap is collision-free and integrity-preserving") {
    import spark.implicits._
    val rows = Relational.pseudonymizeAudit(spark, sf).collect()
      .map(r => r.getAs[String]("relation") -> r).toMap
    assert(rows.keySet === Set("orders", "events"))
    rows.values.foreach { r =>
      // a pure injective-on-this-domain function: distinct ids survive
      assert(r.getAs[Long]("n_ids") === r.getAs[Long]("n_pids"))
      // joinability unchanged: exactly the same orphan mass
      assert(r.getAs[Long]("n_orphans_before") ===
        r.getAs[Long]("n_orphans_after"))
      assert(r.getAs[Boolean]("intact"))
    }
    // replay the orders row directly
    assert(rows("orders").getAs[Long]("n_rows") ===
      graft.Tables.orders(spark, sf).count())
    assert(rows("orders").getAs[Long]("n_ids") ===
      graft.Tables.orders(spark, sf).select($"o_custkey").distinct().count())
    // referencing keys genuinely resolve against customers here
    assert(rows("orders").getAs[Long]("n_orphans_before") === 0L)
  }

  test("pivotRoundTrip: melt reproduces every (source, lang) cell and fills absent cells with 0") {
    val out = Relational.pivotRoundTrip(spark, sf).collect()
    // direct cell counts from the table
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sources = docs.map(_._1).distinct
    val langs = Seq("de", "en", "es", "fr", "zh")
    // full grid present: |sources| × 5 rows, zeros included
    assert(out.length === sources.length * langs.length)
    out.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert(r.getAs[Long]("n") === cells.getOrElse(key, 0L))
    }
    // row totals re-sum the melted cells
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val total = rs.map(_.getAs[Long]("n")).sum
      rs.foreach(r => assert(r.getAs[Long]("row_total") === total))
    }
  }

  test("revenueRollup: levels nest exactly — nations sum to regions, regions to the grand total") {
    import spark.implicits._
    val out = Relational.revenueRollup(spark, sf).collect()
    val lvl0 = out.filter(_.getAs[Long]("lvl") === 0L)
    val lvl1 = out.filter(_.getAs[Long]("lvl") === 1L)
    val lvl3 = out.filter(_.getAs[Long]("lvl") === 3L)
    assert(out.map(_.getAs[Long]("lvl")).toSet === Set(0L, 1L, 3L))
    assert(lvl3.length === 1)
    assert(lvl3.head.getAs[String]("r_name") === "(all)")
    // region subtotals re-sum their nations
    lvl1.foreach { r =>
      val nations = lvl0.filter(_.getAs[String]("r_name") === r.getAs[String]("r_name"))
      assert(r.getAs[Long]("revenue_u") === nations.map(_.getAs[Long]("revenue_u")).sum)
      assert(r.getAs[Long]("n_orders") === nations.map(_.getAs[Long]("n_orders")).sum)
      assert(r.getAs[String]("n_name") === "(all)")
    }
    // grand total re-sums the regions
    assert(lvl3.head.getAs[Long]("revenue_u") ===
      lvl1.map(_.getAs[Long]("revenue_u")).sum)
    assert(lvl3.head.getAs[Long]("n_orders") ===
      lvl1.map(_.getAs[Long]("n_orders")).sum)
    // leaf level replays the direct join + exact-unit sum
    val direct = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .join(graft.Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .select($"n_name",
        floor($"o_totalprice" * 10000 + lit(0.5)).cast("long").as("pu"))
      .groupBy($"n_name")
      .agg(sum($"pu").as("ru"))
      .collect().map(r => r.getAs[String]("n_name") -> r.getAs[Long]("ru")).toMap
    lvl0.foreach { r =>
      assert(r.getAs[Long]("revenue_u") === direct(r.getAs[String]("n_name")))
    }
  }

  test("q274: subject access report replays per-subject aggregates and answers for zero-activity subjects") {
    val sparkS = spark
    import sparkS.implicits._
    val out = Relational.subjectAccessReport(spark, sf).collect()
    assert(out.nonEmpty)
    val k = Relational.subjectStride
    // the manifest covers exactly the strided request list — no more,
    // no fewer (a dropped subject is an unanswered access request)
    val subjects = graft.Tables.customer(spark, sf)
      .filter($"c_custkey" % k === 0)
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("subject_id")).toSet === subjects)
    // driver replay of the event-side slice (collect is subject-sized)
    val ev = graft.Tables.events(spark, sf)
      .filter($"user_id" % k === 0)
      .select($"user_id", $"event_id").collect()
      .groupBy(_.getAs[Long]("user_id"))
    out.foreach { r =>
      val id = r.getAs[Long]("subject_id")
      assert(id % k === 0L)
      ev.get(id) match {
        case Some(rows) =>
          val ids = rows.map(_.getAs[Long]("event_id"))
          assert(r.getAs[Long]("n_events") === ids.length.toLong)
          assert(r.getAs[Long]("first_event_id") === ids.min)
          assert(r.getAs[Long]("last_event_id") === ids.max)
          assert(r.getAs[Long]("event_id_checksum") === ids.sum)
        case None =>
          // "nothing held" is still an answer: zero counts, −1 bounds
          assert(r.getAs[Long]("n_events") === 0L)
          assert(r.getAs[Long]("first_event_id") === -1L)
          assert(r.getAs[Long]("last_event_id") === -1L)
          assert(r.getAs[Long]("event_id_checksum") === 0L)
      }
    }
    // the sf0.001 slice has event-less subjects — the branch is real
    assert(out.exists(_.getAs[Long]("n_events") === 0L))
    // order-side totals: the manifest's spend sums to the slice's
    val spend = graft.Tables.orders(spark, sf)
      .filter($"o_custkey" % k === 0)
      .join(graft.Tables.customer(spark, sf).filter($"c_custkey" % k === 0),
        $"o_custkey" === $"c_custkey")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.floor($"o_totalprice" * 10000 +
          org.apache.spark.sql.functions.lit(0.5)).cast("long")))
      .collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("spend_u4")).sum === spend)
  }
}
