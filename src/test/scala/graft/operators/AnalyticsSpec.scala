package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("cohortRetention: offset-0 cells cover every user once; retention ≤ 1 and starts at 1") {
    val rows = Analytics.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val zero = rows.filter(_.getAs[Long]("wk_offset") == 0L)
    // every cohort has its own offset-0 row, with retention exactly 1
    val cohorts = rows.map(_.getAs[java.sql.Date]("cohort_wk")).distinct
    assert(zero.map(_.getAs[java.sql.Date]("cohort_wk")).distinct.length ===
      cohorts.length)
    zero.foreach(r => assert(r.getAs[Double]("retention") === 1.0))
    // offset-0 cells partition the user base: sizes sum to distinct users
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(zero.map(_.getAs[Long]("cohort_size")).sum === users)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") <= 1.0)
      assert(r.getAs[Long]("wk_offset") >= 0L)
    }
  }

  test("cohortRetention: a cohort's later-week actives never exceed an earlier week is NOT required, but cells are distinct-user counts") {
    // retention can rebound (a user skips a week and returns); what IS
    // invariant: each cell counts each user at most once, so n_active is
    // bounded by the cohort size — checked above — and the matrix is
    // deterministic across runs
    val a = Analytics.cohortRetention(spark, sf).collect().toSeq
    val b = Analytics.cohortRetention(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("skewProfile: stats agree with a direct computation of the key-count table") {
    val r = Analytics.skewProfile(spark, sf).head()
    val kc = Tables.orders(spark, sf).groupBy(col("o_custkey")).count()
      .collect().map(_.getAs[Long]("count")).sorted
    assert(r.getAs[Long]("n_keys") === kc.length.toLong)
    assert(r.getAs[Long]("n_rows") === kc.sum)
    assert(r.getAs[Long]("max_cnt") === kc.max)
    assert(r.getAs[Long]("salt_factor") >= 1L)
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
    // p50/p99 sit inside the observed count range
    assert(r.getAs[Double]("p50") >= kc.min.toDouble)
    assert(r.getAs[Double]("p99") <= kc.max.toDouble)
  }

  test("driftReport: window sums recompute from the daily rollup; flag is the stated integer test") {
    import spark.implicits._
    val rows = Analytics.driftReport(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", $"ts").cast("date").as("ds"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"ds").collect()
      .map(r => r.getAs[java.sql.Date]("ds") -> r.getAs[Long]("cnt"))
    val idx = daily.map(_._1).zipWithIndex.toMap
    rows.foreach { r =>
      val i = idx(r.getAs[java.sql.Date]("ds"))
      assert(i >= 13) // needs a full prior frame
      val recent = (i - 6 to i).map(daily(_)._2).sum
      val prior = (i - 13 to i - 7).map(daily(_)._2).sum
      assert(r.getAs[Long]("recent7") === recent)
      assert(r.getAs[Long]("prior7") === prior)
      assert(r.getAs[Long]("drift") === math.abs(recent - prior))
      assert(r.getAs[Boolean]("flagged") ===
        (math.abs(recent - prior) * 2 > prior))
    }
  }

  test("dataCard: volumes partition the corpus; every rate is a valid share") {
    val rows = Analytics.dataCard(spark, sf).collect()
    graft.CacheGuard.release()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    rows.foreach { r =>
      val share = r.getAs[Double]("top_lang_share")
      assert(share > 0.0 && share <= 1.0)
      // the dominant language is at least an equal share of the languages
      assert(share >= 1.0 / r.getAs[Long]("n_langs") - 1e-4)
      val dup = r.getAs[Double]("dup_rate")
      assert(dup >= 0.0 && dup < 1.0)
      val q = r.getAs[Double]("mean_quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Double]("median_chars") > 0.0)
    }
  }

  test("eventTransitions: rows count every consecutive pair; probabilities normalize per state") {
    val rows = Analytics.eventTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    // Σ cnt = (total events) − (users with ≥1 event): each user timeline
    // of length n contributes n−1 transitions
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val users = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("cnt")).sum === total - users)
    rows.groupBy(_.getAs[String]("cur")).values.foreach { g =>
      val psum = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < g.length * 1e-4 + 1e-9,
        s"${g.head.getAs[String]("cur")}: $psum")
    }
  }

  test("hllMergeAudit: merged and direct sketches agree exactly") {
    val r = Sketches.hllMergeAudit(spark, sf).head()
    assert(r.getAs[Double]("diff") === 0.0)
    assert(r.getAs[Double]("merged_estimate") ===
      r.getAs[Double]("direct_estimate"))
  }

  test("groupedHllDistinct: per-group estimates land in the p=8 error regime") {
    val rows = Sketches.groupedHllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct")
      assert(exact > 0L && est > 0.0)
      assert(r.getAs[Double]("rel_err") < 0.25,
        s"${r.getAs[String]("event_type")}: $est vs $exact")
    }
    // grouped estimates are independent per group: the register math for
    // one group never sees another group's users, so each group's rel_err
    // matches the global hllDistinct run on just that slice — spot-check
    // by summing exact counts against the ungrouped distinct-total bound
    val total = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("exact_distinct")).max <= total)
  }

  test("engagementCurve: wau7 matches a brute-force trailing-7-day distinct; new_users partition the user base") {
    val out = Analytics.engagementCurve(spark, sf).collect()
    assert(out.nonEmpty)
    // brute force from the raw events: user-day pairs on the driver
    val ud = Tables.events(spark, sf)
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("ds"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    val days = ud.map(_._2)
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val dau = ud.count(_._2 == d)
      val wau = ud.filter { case (_, x) =>
        !x.isAfter(d) && x.isAfter(d.minusDays(7)) }.map(_._1).toSet.size
      assert(r.getLong(1) === dau, s"dau@$d")
      assert(r.getLong(2) === wau, s"wau7@$d")
      assert(r.getLong(2) >= r.getLong(1)) // window ⊇ the day itself
    }
    // every observed day is present, and first-seen counts sum to the base
    assert(out.map(_.getDate(0).toLocalDate).toSet === days)
    assert(out.map(_.getLong(3)).sum === ud.map(_._1).size)
    // day one: everyone is new and the window is just that day
    val first = out.minBy(_.getDate(0).toLocalDate.toEpochDay)
    assert(first.getLong(1) === first.getLong(2))
    assert(first.getLong(1) === first.getLong(3))
  }

  test("sessionCooccurrence: pairs, marginals and lift replay a driver-side gap-sessionizer") {
    val out = Analytics.sessionCooccurrence(spark, sf).collect()
    graft.CacheGuard.release()
    // driver-side: 30-min-gap sessions per user over (ts, k)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val gap = 30L * 60 * 1000
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(_._2)
      val buf = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Set[Long]())
      var prev = Long.MinValue
      sorted.foreach { case (_, t, k) =>
        if (prev != Long.MinValue && t - prev >= gap)
          buf += scala.collection.mutable.Set[Long]()
        buf.last += k; prev = t
      }
      buf.map(_.toSet)
    }.toSeq
    val n = sessions.size.toLong
    val marg = sessions.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairCnt = sessions.flatMap(s =>
        s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= Analytics.cooccurMinSupport)
    assert(out.length === pairCnt.size)
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === pairCnt(key))
      assert(r.getLong(3) === marg(key._1))
      assert(r.getLong(4) === marg(key._2))
      val lift = math.floor((pairCnt(key) * n).toDouble /
        (marg(key._1) * marg(key._2)).toDouble * 1e4 + 0.5) / 1e4
      assert(r.getDouble(5) === lift)
    }
  }

  test("sessionCooccurrence: pairs come from a per-row set expand — no self-join, marginals broadcast") {
    val plan = Analytics.sessionCooccurrence(spark, sf)
      .queryExecution.executedPlan.toString
    graft.CacheGuard.release()
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    // the only joins are the broadcast marginal/total attachments over
    // the O(items²) pair table
    assert(!plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("burstDetect: flag agrees with a driver-side recomputation of the trailing-24-hour rule") {
    val out = Analytics.burstDetect(spark, sf).collect()
    assert(out.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
      .count().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3)).toVector).toMap
    // expected: only rows with a full 24-observed-hour history, in order
    val expected = hourly.toSeq.flatMap { case (et, hs) =>
      hs.zipWithIndex.drop(24).map { case ((_, cnt), i) =>
        val prior = hs.slice(i - 24, i).map(_._2).sum
        (et, cnt, prior, cnt * 24 > prior * 3)
      }
    }
    assert(out.length === expected.length)
    val got = out.map(r => (r.getString(0), r.getLong(2), r.getLong(3),
      r.getBoolean(4))).toSeq
    assert(got.sorted === expected.sorted)
  }

  test("decayedTrending: driver replay of the exact 2^20-unit decay sums") {
    import spark.implicits._
    val out = Analytics.decayedTrending(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("d"))
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date]("d")))
    val ref = ev.map(_._2.toLocalDate).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val want = ev.groupBy(_._1).view.mapValues { rows =>
      val units = rows.map { case (_, d) =>
        val we = java.time.temporal.ChronoUnit.DAYS
          .between(d.toLocalDate, ref) / 3
        if (we >= 20) 0L else 1L << (20 - we)
      }.sum
      (rows.size.toLong, units)
    }.toMap
    out.foreach { r =>
      val (n, units) = want(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("decayed_units") === units)
      // the double column is the exact power-of-two division, quantized
      assert(r.getAs[Double]("decayed") ===
        math.floor(units.toDouble / 1048576.0 * 1e4 + 0.5) / 1e4)
    }
    // ordering: strictly non-increasing in decayed_units
    val seq = out.map(_.getAs[Long]("decayed_units")).toSeq
    assert(seq === seq.sorted(Ordering[Long].reverse))
  }

  test("botSignalsOf: constructed bot flags, human and singleton do not") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // user 1: scripted — one type, exactly 60 s cadence, 10 events
    val bot = (0L until 10L).map(i => (1L, at(i * 60), "click"))
    // user 2: human — mixed types, irregular gaps
    val human = Seq(0L, 7L, 95L, 96L, 400L, 1000L, 1003L, 2000L).zipWithIndex
      .map { case (s, i) =>
        (2L, at(s), Seq("view", "click", "purchase")(i % 3)) }
    // user 3: one event — no gaps, entropy 0, must NOT flag
    val single = Seq((3L, at(5L), "view"))
    val out = Analytics.botSignalsOf(
        (bot ++ human ++ single).toDF("user_id", "ts", "event_type"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("bot_flag"))
    assert(out(1L).getAs[Boolean]("low_entropy"))
    assert(out(1L).getAs[Boolean]("regular_cadence"))
    assert(out(1L).getAs[Long]("entropy_u6") === 0L)
    assert(out(1L).getAs[Long]("gap_var_num") === 0L)
    assert(out(1L).getAs[Long]("gap_sum_s") === 9L * 60L)
    assert(!out(2L).getAs[Boolean]("bot_flag"))
    assert(!out(2L).getAs[Boolean]("low_entropy"))
    assert(!out(3L).getAs[Boolean]("bot_flag"))
    assert(!out(3L).getAs[Boolean]("regular_cadence")) // below the gap floor
    assert(out(3L).getAs[Long]("n_gaps") === 0L)
  }

  test("botSignals: corpus totals partition and entropy cells replay") {
    import spark.implicits._
    val out = Analytics.botSignals(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum ===
      graft.Tables.events(spark, sf).count())
    // per-user entropy replay on a sample of users
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sample = out.take(10)
    sample.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val cells = ev.filter(_._1 == u).groupBy(_._2).view.mapValues(_.size).toMap
      val n = cells.values.sum.toDouble
      val entU6 = cells.values.map { c =>
        val p = c / n
        math.floor(BigDecimal(-p * math.log(p))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6 + 0.5).toLong
      }.sum
      assert(r.getAs[Long]("entropy_u6") === entU6, s"user $u")
      assert(r.getAs[Long]("n_types") === cells.size.toLong)
    }
  }

  test("multiTouchAttribution: per-purchase credit sums to exactly 1e6; driver pair replay") {
    import spark.implicits._
    val out = Analytics.multiTouchAttribution(spark, sf).collect()
    assert(out.nonEmpty)
    // exact conservation: the reason for largest-remainder over floats
    out.groupBy(_.getAs[Long]("buy_id")).foreach { case (b, rs) =>
      assert(rs.map(_.getAs[Long]("credit_ppm")).sum === 1000000L, s"buy $b")
      val n = rs.head.getAs[Long]("n_touches")
      assert(rs.length.toLong === n)
      assert(rs.map(_.getAs[Long]("touch_rank")).sorted.toSeq === (1L to n))
      // remainder goes to the earliest touches, one ppm each
      val base = 1000000L / n
      val rem = 1000000L % n
      rs.foreach { r =>
        val want = base + (if (r.getAs[Long]("touch_rank") <= rem) 1L else 0L)
        assert(r.getAs[Long]("credit_ppm") === want)
      }
    }
    // pair-set replay against the raw stream
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", $"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
    val clicks = ev.filter(_._1 == "click")
    val buys = ev.filter(_._1 == "purchase")
    val wantPairs = (for {
      (_, u, bt, bid) <- buys
      (_, cu, ct, cid) <- clicks
      if cu == u && ct <= bt && ct > bt - 30L * 60 * 1000
    } yield (bid, cid)).toSet
    assert(out.map(r => (r.getAs[Long]("buy_id"), r.getAs[Long]("click_id")))
      .toSet === wantPairs)
  }

  test("robustOutliers: driver replay of discrete median, MAD and the 3-MAD rule") {
    import spark.implicits._
    val out = Analytics.robustOutliers(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def discMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      val n = sorted.length
      // smallest value whose cumulative count doubled reaches n
      sorted.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * 2 >= n => v }.get
    }
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val us = ev.filter(_._1 == t).map(_._2).toSeq
      val med = discMedian(us)
      val mad = discMedian(us.map(u => math.abs(u - med)))
      val nOut = us.count(u => math.abs(u - med) > 3 * mad).toLong
      assert(r.getAs[Long]("n") === us.length.toLong)
      assert(r.getAs[Long]("med_u2") === med, s"type $t median")
      assert(r.getAs[Long]("mad_u2") === mad, s"type $t mad")
      assert(r.getAs[Long]("n_outliers") === nOut, s"type $t outliers")
      assert(r.getAs[Long]("outlier_bp") === nOut * 10000 / us.length)
    }
    // robustness: one absurd value moves the median at most one order
    // statistic (to the next sorted neighbor), while the mean jumps by
    // spike/(n+1) — the reason MAD gates survive fat fingers
    val t0 = out.head.getAs[String]("event_type")
    val us = ev.filter(_._1 == t0).map(_._2).toSeq
    val spike = 100000000L
    val medS = discMedian(us :+ spike)
    val sorted = us.sorted
    val i1 = sorted.indices.find(i => (i + 1) * 2 >= sorted.length).get
    assert(Set(sorted(i1), sorted(math.min(i1 + 1, sorted.length - 1)))
      .contains(medS))
    val meanShift = (us.sum + spike) / (us.length + 1) - us.sum / us.length
    assert(meanShift > 1000L)
  }

  test("abTestReport: cells partition the user base; chi-square replays in BigInt") {
    val out = Analytics.abTestReport(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val (nA, cA) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"))
    val (nB, cB) = (r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    val nUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(nA + nB === nUsers)
    assert(cA >= 0L && cA <= nA && cB >= 0L && cB <= nB)
    assert(r.getAs[Long]("rate_a_ppm") === cA * 1000000L / nA)
    assert(r.getAs[Long]("rate_b_ppm") === cB * 1000000L / nB)
    // driver replay of the exact 2x2 chi-square in BigInt micro-units
    val (a, b, c, d) = (BigInt(cA), BigInt(nA - cA), BigInt(cB), BigInt(nB - cB))
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    val det = a * d - b * c
    val want = if (den == 0) BigInt(0)
      else (a + b + c + d) * det * det * 1000000 / den
    assert(BigInt(r.getAs[Long]("chi2_micro")) === want)
    assert(r.getAs[Boolean]("significant_95") ===
      (r.getAs[Long]("chi2_micro") > 3841459L))
  }

  test("activityStreaks: islands replay a driver-side consecutive-run scan") {
    val out = Analytics.activityStreaks(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("start_day").toLocalDate,
        r.getAs[Long]("len"), r.getAs[Long]("streak_no")))
    assert(out.nonEmpty)
    // driver replay: distinct days per user -> consecutive runs
    val days = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .distinct().collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[java.sql.Date]("day").toLocalDate)
    val want = days.groupBy(_._1).toSeq.flatMap { case (u, ds) =>
      val sorted = ds.map(_._2).sortBy(_.toEpochDay)
      val runs = sorted.foldLeft(List.empty[(java.time.LocalDate, Long)]) {
        case (acc @ ((start, len) :: rest), d)
            if start.plusDays(len).isEqual(d) => (start, len + 1) :: rest
        case (acc, d) => (d, 1L) :: acc
      }.reverse
      runs.zipWithIndex.map { case ((start, len), i) =>
        (u, start, len, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._2.toEpochDay))
    assert(out.toSeq === want)
    // streak lengths partition the user's active days
    assert(out.map(_._3).sum === days.length.toLong)
  }

  test("looTargetEncode: per-row encode replays the (sum - own) / (n - 1) identity") {
    val out = Analytics.looTargetEncode(spark, sf).collect()
    assert(out.nonEmpty)
    val bySeg = out.groupBy(_.getAs[String]("segment"))
    bySeg.foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Long]("cents")).sum
      val n = rows.length.toLong
      rows.foreach { r =>
        val want = if (n == 1) -1L
          else Math.floorDiv(s - r.getAs[Long]("cents"), n - 1)
        assert(r.getAs[Long]("loo_cents") === want)
      }
    }
  }

  test("featureHashing: buckets and signs replay the shared md5-32; 3 features per customer") {
    val out = Analytics.featureHashing(spark, sf).collect()
      .groupBy(_.getAs[Long]("c_custkey"))
    assert(out.nonEmpty)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
        16)
    }
    // weights per customer carry exactly 3 signed units (pre-collision)
    out.foreach { case (_, rows) =>
      assert(rows.map(r => math.abs(r.getAs[Long]("w"))).sum <= 3L)
      rows.foreach(r => assert(r.getAs[Long]("bucket") >= 0L &&
        r.getAs[Long]("bucket") < 64L))
    }
    // full replay for a sample of customers
    val cust = graft.Tables.customer(spark, sf).collect().take(20)
    cust.foreach { c =>
      val feats = Seq(
        s"nation=${c.getAs[Int]("c_nationkey")}",
        s"segment=${c.getAs[String]("c_mktsegment")}",
        s"acct_neg=${c.getAs[Double]("c_acctbal") < 0}")
      val want = feats.map(h32).groupBy(_ % 64).view
        .mapValues(_.map(h => (h / 64 % 2) * 2 - 1).sum).toMap
        .filter(_._2 != 0L)
      val got = out(c.getAs[Long]("c_custkey"))
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("w")).toMap
        .filter(_._2 != 0L)
      assert(got === want)
    }
  }

  test("funnelLatency: percentiles replay a driver-side first-click/first-purchase scan") {
    val out = Analytics.funnelLatency(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val ev = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"))
      .collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[String]("event_type"),
        x.getAs[Long]("us")))
    val firstClick = ev.filter(_._2 == "click").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val secs = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us) =>
        firstClick.get(u).filter(us >= _).map(c => (u, c, us)) }
      .groupBy(t => (t._1, t._2)).values
      .map(g => (g.map(_._3).min - g.head._2) / 1000000L).toSeq.sorted
    assert(r.getAs[Long]("n_converted") === secs.length.toLong)
    assert(r.getAs[Long]("max_s") === secs.max)
    def pct(p: Int): Long =
      secs.zipWithIndex.collectFirst {
        case (s, i) if (i + 1) * 100 >= secs.length.toLong * p => s }.get
    assert(r.getAs[Long]("p25_s") === pct(25))
    assert(r.getAs[Long]("p50_s") === pct(50))
    assert(r.getAs[Long]("p75_s") === pct(75))
    assert(r.getAs[Long]("p90_s") === pct(90))
  }

  test("stickinessGrid: exact trailing-7-day distincts; dau never exceeds wau") {
    val out = Analytics.stickinessGrid(spark, sf).collect()
    assert(out.nonEmpty)
    val days = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toLocalDate))
    assert(out.length === days.map(_._2).distinct.length)
    out.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      val dau = days.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = days.filter { case (_, x) =>
        !x.isAfter(d) && !x.isBefore(d.minusDays(6)) }
        .map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") === dau)
      assert(r.getAs[Long]("wau") === wau)
      assert(dau <= wau)
      assert(r.getAs[Long]("stickiness_bp") === dau * 10000L / wau)
    }
  }

  test("linearScore: logit replays the fixed weight formula over the hashed features") {
    val feats = Analytics.featureHashing(spark, sf).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("bucket"),
        r.getAs[Long]("w")))
    val want = feats.groupBy(_._1).view.mapValues(
      _.map { case (_, b, w) => w * ((b * 7) % 21 - 10) }.sum).toMap
    val out = Analytics.linearScore(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getAs[Long]("c_custkey")
      assert(r.getAs[Long]("logit") === want(k))
      assert(r.getAs[Boolean]("predicted") === (want(k) > 0))
    }
    assert(out.length === want.size)
    // both classes occur — the boundary genuinely separates
    assert(out.exists(_.getAs[Boolean]("predicted")) &&
      out.exists(!_.getAs[Boolean]("predicted")))
  }

  test("giniConcentration: the rank formula replays in BigInt; bounds hold") {
    val out = Analytics.giniConcentration(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.length === 1)
    val r = out.head
    val rev = graft.Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").collect()
      .map(x => (x.getAs[Long]("o_custkey"),
        math.floor(x.getAs[Double]("o_totalprice") * 100 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val xs = rev.values.toSeq
    assert(r.getAs[Long]("n") === xs.length.toLong)
    assert(r.getAs[Long]("total_cents") === xs.sum)
    assert(r.getAs[Long]("max_cents") === xs.max)
    val freq = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sorted = freq.keys.toSeq.sorted
    val cum = sorted.scanLeft(0L)((a, v) => a + freq(v))
    val r2 = sorted.zip(cum).map { case (v, cb) =>
      v -> (2 * cb + freq(v) + 1) }.toMap
    val n = BigInt(xs.length)
    val srx = xs.map(x => BigInt(r2(x)) * x).sum
    val want = srx * 1000000 / (n * xs.map(BigInt(_)).sum) -
      (n + 1) * 1000000 / n
    assert(BigInt(r.getAs[Long]("gini_ppm")) === want)
    assert(r.getAs[Long]("gini_ppm") >= -1L &&
      r.getAs[Long]("gini_ppm") < 1000000L)
    assert(r.getAs[Long]("top1_share_ppm") ===
      (BigInt(xs.max) * 1000000 / xs.map(BigInt(_)).sum).toLong)
  }

  test("uShapedAttribution: credit conserves to exactly 1e6 per purchase in every branch") {
    val out = Analytics.uShapedAttribution(spark, sf).collect()
    assert(out.nonEmpty)
    val byBuy = out.groupBy(_.getAs[Long]("buy_id"))
    byBuy.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("credit_ppm")).sum === 1000000L)
      val n = rows.head.getAs[Long]("n_touches")
      rows.foreach { r =>
        val (rk, cr) = (r.getAs[Long]("touch_rank"),
          r.getAs[Long]("credit_ppm"))
        if (n == 1) assert(cr === 1000000L)
        else if (n == 2) assert(cr === 500000L)
        else if (rk == 1 || rk == n) assert(cr === 400000L)
        else {
          val base = 200000L / (n - 2)
          val rem = 200000L % (n - 2)
          assert(cr === base + (if (rk - 1 <= rem) 1L else 0L))
        }
      }
    }
  }

  test("winsorizedReport: bounds, clips and means replay the discrete-quantile rule") {
    val out = Analytics.winsorizedReport(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"),
        math.floor(r.getAs[Double]("value") * 100 + 0.5).toLong))
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val us = ev.filter(_._1 == et).map(_._2).sorted
      def pct(p: Int): Long = us.zipWithIndex.collectFirst {
        case (u, i) if (i + 1) * 100 >= us.length.toLong * p => u }.get
      val (lo, hi) = (pct(1), pct(99))
      assert(r.getAs[Long]("lo_u2") === lo)
      assert(r.getAs[Long]("hi_u2") === hi)
      assert(r.getAs[Long]("n") === us.length.toLong)
      assert(r.getAs[Long]("n_clip_low") === us.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_clip_high") === us.count(_ > hi).toLong)
      assert(r.getAs[Long]("sum_u2") === us.sum)
      val win = us.map(u => math.max(math.min(u, hi), lo))
      assert(r.getAs[Long]("sum_win_u2") === win.sum)
      assert(r.getAs[Long]("mean_u2") === us.sum / us.length)
      assert(r.getAs[Long]("mean_win_u2") === win.sum / win.length)
      // clipping can only pull the mean toward the body
      assert(r.getAs[Long]("sum_win_u2") <= r.getAs[Long]("sum_u2") +
        us.count(_ < lo) * (lo - us.min))
    }
  }

  test("latenessAudit: drops replay the modeled arrival order and decay in delta") {
    val out = Analytics.latenessAudit(spark, sf).collect()
      .map(r => r.getAs[Long]("delta_s") -> r).toMap
    assert(out.keySet === Set(0L, 10L, 60L, 300L, 900L))
    // driver replay: same md5 jitter, per-user arrival order
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    val ev = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us")))
    // per-user arrival order, exclusive running high-water mark
    val perUser = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.map { case (_, id, us) =>
        (us + (h32(id.toString) % 600) * 1000000L, id, us) }
        .sortBy(t => (t._1, t._2)).map(_._3)
      sorted.zipWithIndex.drop(1).map { case (us, i) =>
        (us, sorted.take(i).max) }
    }.toSeq
    Seq(0L, 10L, 60L, 300L, 900L).foreach { d =>
      val want = perUser.count { case (us, hwm) => us < hwm - d * 1000000L }
      assert(out(d).getAs[Long]("n_late") === want.toLong, s"delta $d")
      assert(out(d).getAs[Long]("n_eligible") === perUser.length.toLong)
      assert(out(d).getAs[Long]("late_bp") ===
        want.toLong * 10000L / perUser.length)
    }
    // monotone decay, saturating above the max modeled delay
    val lates = Seq(0L, 10L, 60L, 300L, 900L).map(out(_).getAs[Long]("n_late"))
    assert(lates === lates.sorted.reverse)
    assert(lates.last === 0L)
  }

  test("joinCardAudit: stats replay; FK joins estimate exactly, the m:n join is the audit's case") {
    val out = Analytics.joinCardAudit(spark, sf).collect()
      .map(r => r.getAs[String]("join_name") -> r).toMap
    assert(out.size === 4)
    out.values.foreach { r =>
      val (nl, nr) = (r.getAs[Long]("n_l"), r.getAs[Long]("n_r"))
      val (dl, dr) = (r.getAs[Long]("d_l"), r.getAs[Long]("d_r"))
      assert(r.getAs[Long]("est") === nl * nr / math.max(dl, dr))
      assert(r.getAs[Long]("err_ppm") ===
        math.abs(r.getAs[Long]("est") - r.getAs[Long]("actual")) * 1000000L /
          math.max(r.getAs[Long]("actual"), 1L))
    }
    // FK joins with complete NDV stats are estimated exactly
    assert(out("orders_customer").getAs[Long]("err_ppm") === 0L)
    assert(out("lineitem_part").getAs[Long]("err_ppm") === 0L)
    // the m:n row replays its exact actual = sum over users of c_u * p_u
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val c = ev.filter(_._2 == "click").groupBy(_._1).view.mapValues(_.length).toMap
    val p = ev.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.length).toMap
    val actual = c.toSeq
      .map { case (u, cu) => cu.toLong * p.getOrElse(u, 0).toLong }.sum
    assert(out("clicks_purchases_user").getAs[Long]("actual") === actual)
  }

  test("pathMining: 3-windows replay a driver-side per-user timeline scan") {
    val out = Analytics.pathMining(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val ev = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val want = ev.groupBy(_._1).values.flatMap { g =>
      val tl = g.sortBy(t => (t._2, t._3)).map(_._4)
      tl.sliding(3).filter(_.length == 3).map(w => (w(0), w(1), w(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = want.values.sum
    out.foreach { r =>
      val k = (r.getAs[String]("e1"), r.getAs[String]("e2"),
        r.getAs[String]("e3"))
      assert(r.getAs[Long]("cnt") === want(k), s"path $k")
      assert(r.getAs[Long]("support_bp") === want(k) * 10000L / total)
    }
    // the cut keeps the globally most frequent paths
    val cutMin = out.map(_.getAs[Long]("cnt")).min
    assert(want.values.count(_ > cutMin) <= out.length)
  }

  test("ewmaDaily: 28 slots per type; the integer recurrence replays from the x column") {
    val out = Analytics.ewmaDaily(spark, sf).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("pos"))
      assert(sorted.map(_.getAs[Long]("pos")).toSeq === (0L to 27L))
      var s = sorted.head.getAs[Long]("x")
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i > 0) s = (3 * r.getAs[Long]("x") + 7 * s) / 10
        assert(r.getAs[Long]("ewma") === s, s"slot $i")
      }
    }
  }

  test("arrivalOverdispersion: exact BigInt Fano replay over hourly counts with the dense span") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    val out = Analytics.arrivalOverdispersion(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", expr("unix_timestamp(ts) div 3600").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val span = ev.map(_._2).max - ev.map(_._2).min + 1
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val counts = ev.filter(_._1 == t).groupBy(_._2).map(_._2.size.toLong)
      val (sx, sq) = (counts.sum, counts.map(c => c * c).sum)
      assert(r.getAs[Long]("n_events") === sx)
      assert(r.getAs[Long]("n_hours") === span)
      assert(r.getAs[Long]("n_active_hours") === counts.size.toLong)
      val fano = (BigInt(span) * sq - BigInt(sx) * sx) * 1000000 /
        (BigInt(span) * sx)
      assert(r.getAs[Long]("fano_ppm") === fano.toLong)
      assert(fano >= 0)
    }
  }

  test("bradleyTerry: full driver replay of the fixed-point MM iterations") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    // cent-exact engagement scores
    val scores = ev.groupBy(t => (t._1, t._2)).map { case (k, rs) =>
      k -> rs.map(t => math.floor(t._3 * 100.0 + 0.5).toLong).sum }
    // duels: per user, each type pair with differing totals
    val byUser = scores.groupBy(_._1._1)
    val duels = byUser.values.flatMap { us =>
      val ts = us.map { case ((_, t), s) => t -> s }.toSeq.sortBy(_._1)
      for {
        Seq((ta, sa), (tb, sb)) <- ts.combinations(2).toSeq
        if sa != sb
      } yield if (sa > sb) (ta, tb) else (tb, ta)
    }.toSeq
    val wins = duels.groupBy(identity).map { case ((w, l), g) =>
      (w, l) -> g.length.toLong }
    val nIj = (wins.toSeq.map { case ((i, j), n) => (i, j) -> n } ++
      wins.toSeq.map { case ((i, j), n) => (j, i) -> n })
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val items = nIj.keys.map(_._1).toSeq.distinct.sorted
    val winsBy = items.map(i => i ->
      wins.filter(_._1._1 == i).values.sum).toMap
    val nItems = items.length
    var u = items.map(_ -> 100000000L).toMap
    for (_ <- 0 until 3) {
      val dU = items.map { i =>
        i -> nIj.filter(_._1._1 == i).map { case ((_, j), n) =>
          math.floor((n.toDouble * 1e8) /
            math.max(u(i) + u(j), 1L).toDouble * 1e6 + 0.5).toLong
        }.sum
      }.toMap
      val rU = items.map(i => i -> math.floor(
        (winsBy(i).toDouble * 1e6) / dU(i).toDouble * 1e8 + 0.5).toLong)
        .toMap
      val sU = rU.values.sum
      u = items.map(i => i -> math.floor(
        (rU(i).toDouble / sU.toDouble) * nItems.toDouble * 1e8 +
          0.5).toLong).toMap
    }
    val out = Analytics.bradleyTerry(spark, sf).collect()
    assert(out.length === nItems)
    out.foreach { r =>
      val i = r.getAs[String]("event_type")
      assert(r.getAs[Long]("wins") === winsBy(i))
      assert(r.getAs[Long]("n_comps") ===
        nIj.filter(_._1._1 == i).values.sum)
      assert(r.getAs[Long]("strength_u") === u(i), s"item $i")
      assert(r.getAs[Double]("strength") === u(i).toDouble / 1e8)
    }
    // output is ranked by fitted strength
    val su = out.map(_.getAs[Long]("strength_u")).toSeq
    assert(su === su.sortBy(-_))
    // BT sanity: renormalization pins the scale at Σπ = K
    assert(math.abs(su.sum - nItems * 100000000L) <= nItems.toLong)
  }

  test("fleissKappa: full driver replay of panels, marginals, and the quantized kappa") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val panels = ev.groupBy(_._1 / 25).toSeq
      .map { case (item, g) =>
        item -> g.sortBy(t => (md5hex(t._1.toString), t._1)).take(5) }
      .filter(_._2.length == 5)
    val nij = panels.flatMap { case (item, rs) =>
      rs.groupBy(_._2).map { case (cat, g) => (item, cat, g.length.toLong) } }
    val aSum = nij.map(t => t._3 * t._3).sum
    val nItems = panels.length.toLong
    val cJ = nij.groupBy(_._2).map { case (c, g) => c -> g.map(_._3).sum }
    val bSum = cJ.values.map(c => c * c).sum
    val pBar = math.floor((aSum - nItems * 5).toDouble /
      (nItems * 20).toDouble * 1e6 + 0.5) / 1e6
    val pE = math.floor(bSum.toDouble /
      ((nItems * 5) * (nItems * 5)).toDouble * 1e6 + 0.5) / 1e6
    val kappa = math.floor((pBar - pE) / (1.0 - pE) * 1e6 + 0.5) / 1e6
    val r = Analytics.fleissKappa(spark, sf).head()
    assert(r.getAs[Long]("n_items") === nItems)
    assert(r.getAs[Long]("n_raters") === 5L)
    assert(r.getAs[Long]("n_categories") === cJ.size.toLong)
    assert(r.getAs[Long]("a_sum") === aSum)
    assert(r.getAs[Long]("b_sum") === bSum)
    assert(r.getAs[Double]("p_bar") === pBar)
    assert(r.getAs[Double]("p_e") === pE)
    assert(r.getAs[Double]("kappa") === kappa)
    // agreement bounds: P̄ ∈ [1/n-ish chance floor, 1]; kappa ≤ 1
    assert(pBar > 0.0 && pBar <= 1.0)
    assert(kappa <= 1.0)
  }

  test("passAtK: exact falling-factorial replay; monotone in k; zero-crossing branch exercised") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val tasks = ev.groupBy(_._1 / 20).map { case (t, g) =>
      (t, g.length.toLong,
        g.count(e => Set("purchase", "signup")(e._2)).toLong) }.toSeq
    def pAtK(n: Long, c: Long, k: Long): Double = {
      val num = (0L until k).map(i => n - c - i).product
      val den = (0L until k).map(i => n - i).product
      1.0 - num.toDouble / den.toDouble
    }
    val out = Analytics.passAtK(spark, sf).collect()
    assert(out.map(_.getAs[Long]("k")).toSeq === Seq(1L, 5L, 10L))
    out.foreach { r =>
      val k = r.getAs[Long]("k")
      val el = tasks.filter(_._2 >= k)
      assert(r.getAs[Long]("n_tasks") === el.length.toLong)
      assert(r.getAs[Long]("n_samples") === el.map(_._2).sum)
      assert(r.getAs[Long]("n_passing") === el.map(_._3).sum)
      val sumU = el.map { case (_, n, c) =>
        math.floor(pAtK(n, c, k) * 1e6 + 0.5).toLong }.sum
      assert(r.getAs[Long]("sum_u6") === sumU)
      assert(r.getAs[Double]("pass_at_k") ===
        math.floor((sumU.toDouble / 1e6) / el.length * 1e6 + 0.5) / 1e6)
    }
    // pass@k is monotone nondecreasing in k (more draws can only help)
    val byK = out.map(r => r.getAs[Long]("k") ->
      r.getAs[Double]("pass_at_k")).toMap
    assert(byK(1L) <= byK(5L) && byK(5L) <= byK(10L))
    // the integer zero-crossing branch (n - c < k → p = 1) is real on
    // this corpus: some task at k=10 has fewer than 10 failures
    assert(tasks.exists { case (_, n, c) => n >= 10 && n - c < 10 })
  }

  test("krippendorffAlpha: exact 12ths replay of ragged panels; alpha agrees with the direct formula") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val panels = ev.groupBy(_._1 / 25).toSeq.flatMap { case (item, g) =>
      val want = (2 + item % 4).toInt
      val kept = g.sortBy(t => (md5hex(t._1.toString), t._1)).take(want)
      if (kept.length == want) Some(item -> kept) else None
    }
    // ragged by construction: at least two distinct panel sizes survive
    assert(panels.map(_._2.length).distinct.length >= 2)
    val units = panels.map { case (_, rs) =>
      val counts = rs.groupBy(_._2).map(_._2.length.toLong)
      val m = rs.length.toLong
      (m, counts.map(x => x * x).sum, rs.map(_._2))
    }
    val dONum12 = units.map { case (m, sq, _) =>
      (m * m - sq) * (12L / (m - 1)) }.sum
    val nC = units.flatMap(_._3).groupBy(identity).map(_._2.length.toLong)
    val n = nC.sum
    val margSq = nC.map(x => x * x).sum
    val r = Analytics.krippendorffAlpha(spark, sf).head()
    assert(r.getAs[Long]("n_units") === units.length.toLong)
    assert(r.getAs[Long]("n_ratings") === n)
    assert(r.getAs[Long]("n_categories") === nC.size.toLong)
    assert(r.getAs[Long]("d_o_num12") === dONum12)
    assert(r.getAs[Long]("marg_sq") === margSq)
    assert(r.getAs[Double]("d_o") ===
      math.floor(dONum12.toDouble / (12.0 * n) * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("d_e") ===
      math.floor((n * n - margSq).toDouble / (n * (n - 1)).toDouble * 1e6 +
        0.5) / 1e6)
    assert(r.getAs[Double]("alpha") ===
      math.floor((1.0 - ((n - 1) * dONum12).toDouble /
        (12L * (n * n - margSq)).toDouble) * 1e6 + 0.5) / 1e6)
    // chance-corrected bounds: alpha ≤ 1, and > -1 on any real panel mix
    assert(r.getAs[Double]("alpha") <= 1.0)
    assert(r.getAs[Double]("alpha") > -1.0)
  }
}
