package graft.operators

import graft.{SparkSpec, Tables}

class ProfilerSpec extends SparkSpec {

  test("profile: exact null/distinct/range stats on a known fixture") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("b"), Option(10L)),
      (2L, Option("a"), None),
      (3L, Option("b"), Option(30L)),
      (4L, None, Option(10L))
    ).toDF("id", "s", "x")
    val out = Profiler.profile(df, Seq("id", "s", "x")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.keySet === Set("id", "s", "x"))
    out.values.foreach(r => assert(r.getAs[Long]("n_rows") === 4L))
    assert(out("id").getAs[Long]("n_null") === 0L)
    assert(out("id").getAs[Long]("n_distinct") === 4L)
    assert(out("id").getAs[String]("min_val") === "1")
    assert(out("id").getAs[String]("max_val") === "4")
    assert(out("s").getAs[Long]("n_null") === 1L)
    assert(out("s").getAs[Long]("n_distinct") === 2L)
    assert(out("s").getAs[String]("min_val") === "a")
    assert(out("s").getAs[String]("max_val") === "b")
    assert(out("x").getAs[Long]("n_null") === 1L)
    assert(out("x").getAs[Long]("n_distinct") === 2L)
    // string space: "10" < "30" lexicographically too, but the contract
    // is VARCHAR ordering — "10" is the min here either way
    assert(out("x").getAs[String]("min_val") === "10")
    assert(out("x").getAs[String]("max_val") === "30")
  }

  test("documentsProfile: one row per column; counts match the table") {
    val out = Profiler.documentsProfile(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[String]("col_name")).sorted.toSeq ===
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_null") + 0L <= n)
      assert(r.getAs[Long]("n_distinct") <= n)
    }
    val docId = out.find(_.getAs[String]("col_name") == "doc_id").get
    assert(docId.getAs[Long]("n_distinct") === n) // ids are unique
  }

  test("valueHistogram: counts conserve, buckets in range, lower bounds ascend") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Profiler.valueHistogram(spark, sf).collect()
    val ev = Tables.events(spark, sf).filter($"value".isNotNull)
    assert(out.map(_.getAs[Long]("n")).sum === ev.count())
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 19L)
      assert(r.getAs[Long]("n") > 0L)
    }
    val los = out.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Double]("bucket_lo"))
    los.sliding(2).foreach { case Array(a, b) => assert(a < b) }
    // every value falls inside [its bucket's lo, lo + width] by construction:
    // spot-check the global min and max land in the first and last buckets
    val (lo, hi) = ev.agg(min($"value"), max($"value")).as[(Double, Double)].head()
    val bs = out.map(_.getAs[Long]("bucket")).toSet
    assert(bs.contains(0L))
    assert(bs.contains(out.map(_.getAs[Long]("bucket")).max))
    assert(lo < hi)
  }

  test("profile plans two keyed aggregations, no Expand fan-out") {
    val plan = Profiler.documentsProfile(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(1500))
  }

  test("expectationSuite: verdicts replay the raw table; both outcomes occur") {
    import spark.implicits._
    val out = Profiler.expectationSuite(spark, sf).collect()
      .map(r => r.getAs[String]("check") -> r).toMap
    assert(out.size === 6)
    val o = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .collect()
    val n = o.length.toLong
    val custKeys = graft.Tables.customer(spark, sf)
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    def checkRow(name: String, satisfied: Long): Unit = {
      val r = out(name)
      assert(r.getAs[Long]("satisfied") === satisfied, name)
      assert(r.getAs[Long]("n") === n, name)
      assert(r.getAs[Long]("observed_bp") === satisfied * 10000 / n, name)
      assert(r.getAs[Boolean]("pass") ===
        (satisfied * 10000 / n >= r.getAs[Long]("threshold_bp")), name)
    }
    checkRow("completeness", o.count(!_.isNullAt(1)).toLong)
    checkRow("uniqueness", o.map(_.getLong(0)).distinct.length.toLong)
    checkRow("value_range_0_1m",
      o.count(r => r.getDouble(3) >= 0 && r.getDouble(3) < 1000000).toLong)
    checkRow("status_domain",
      o.count(r => Set("O", "F", "P")(r.getString(2))).toLong)
    checkRow("price_cap_300k", o.count(_.getDouble(3) <= 300000).toLong)
    checkRow("referential_customer", o.count(r => custKeys(r.getLong(1))).toLong)
    // the suite must genuinely exercise both verdicts
    assert(out.values.exists(_.getAs[Boolean]("pass")))
    assert(out.values.exists(!_.getAs[Boolean]("pass")))
    assert(!out("price_cap_300k").getAs[Boolean]("pass"))
  }

  test("kAnonymityAudit: classes partition the published rows; flags replay the thresholds") {
    val out = Profiler.kAnonymityAudit(spark, sf).collect()
    assert(out.nonEmpty)
    // classes partition the join result exactly
    val nPublished = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .count()
    assert(out.map(_.getAs[Long]("n")).sum === nPublished)
    val priorityDomain = graft.Tables.orders(spark, sf)
      .select("o_orderpriority").distinct().count()
    out.foreach { r =>
      val (n, l) = (r.getAs[Long]("n"), r.getAs[Long]("l"))
      assert(n >= 1L && l >= 1L && l <= n)
      assert(l <= priorityDomain)
      assert(r.getAs[Boolean]("k_violation") === (n < 10))
      assert(r.getAs[Boolean]("l_violation") === (l < 3))
      assert(r.getAs[Long]("share_bp") === n * 10000L / nPublished)
    }
  }

  test("benfordAudit: digit extraction replays from cents; expectations sum to ~1e6") {
    // the ppm literal table is a partition of probability mass: the
    // nearest-ppm roundings happen to sum to exactly 10^6
    assert(Profiler.benfordPpm.map(_._2).sum === 1000000L)
    val out = Profiler.benfordAudit(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 9)
    val nTotal = out.map(_.getAs[Long]("n")).sum
    // driver replay of the exact first-digit histogram
    val want = graft.Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong.toString.head)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9)
      assert(r.getAs[Long]("n") === want(('0' + d).toChar))
      val obs = r.getAs[Long]("n") * 1000000L / nTotal
      assert(r.getAs[Long]("observed_ppm") === obs)
      val dev = math.abs(obs - r.getAs[Long]("benford_ppm"))
      assert(r.getAs[Long]("deviation_ppm") === dev)
      assert(r.getAs[Boolean]("flagged") === (dev > 10000L))
    }
  }

  test("datasetCard: counts, dup/short rates and quantiles replay driver-side") {
    val out = Profiler.datasetCard(spark, sf).collect()
      .map(r => r.getAs[String]("stat") -> r.getAs[Long]("value")).toMap
    graft.CacheGuard.release()
    assert(out.size === 13)
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "lang", "text").collect()
    val toks = docs.map(r => Option(r.getAs[String]("text")).getOrElse("")
      .toLowerCase.split("\\s+").filter(_.nonEmpty))
    assert(out("n_docs") === docs.length.toLong)
    assert(out("n_sources") ===
      docs.map(_.getAs[String]("source")).distinct.length.toLong)
    assert(out("n_langs") ===
      docs.map(_.getAs[String]("lang")).distinct.length.toLong)
    assert(out("total_tokens") === toks.map(_.length.toLong).sum)
    assert(out("n_short_docs") === toks.count(_.length < 10).toLong)
    assert(out("short_doc_ppm") ===
      out("n_short_docs") * 1000000L / out("n_docs"))
    assert(out("exact_dup_ppm") ===
      out("n_exact_dup_docs") * 1000000L / out("n_docs"))
    assert(out("mean_doc_tokens_micro") ===
      out("total_tokens") * 1000000L / out("n_docs"))
    // quality quantiles: replay the u grid and the discrete-quantile rule
    val stop = TextAnalysis.stopwords.toSet
    val us = toks.map { tk =>
      val nt = tk.length
      val raw = if (nt == 0) 0.0
        else math.min(1.0, nt / 100.0) * 0.6 +
          tk.count(stop) .toDouble / nt * 0.4
      math.floor(math.floor(raw * 1e4 + 0.5) / 1e4 * 1e4 + 0.5).toLong
    }.sorted
    def pct(p: Int): Long = {
      val n = us.length
      us.zipWithIndex.collectFirst {
        case (u, i) if (i + 1) * 100 >= n.toLong * p => u }.get
    }
    assert(out("quality_p25_u4") === pct(25))
    assert(out("quality_p50_u4") === pct(50))
    assert(out("quality_p75_u4") === pct(75))
    assert(out("quality_p25_u4") <= out("quality_p50_u4") &&
      out("quality_p50_u4") <= out("quality_p75_u4"))
  }

  test("coverageMatrix: the full schema cube with zero cells surfaced") {
    val out = Profiler.coverageMatrix(spark, sf).collect()
    graft.CacheGuard.release()
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "lang").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")))
    val (sources, langs) = (docs.map(_._1).distinct, docs.map(_._2).distinct)
    assert(out.length === sources.length * langs.length)
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    val obs = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val perSource = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val n = obs.getOrElse(k, 0L)
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Boolean]("empty") === (n == 0L))
      assert(r.getAs[Long]("source_share_bp") ===
        n * 10000L / perSource(k._1))
    }
  }

  test("correlationAudit: Spearman and Pearson replay as exact rationals on a pair") {
    val out = Profiler.correlationAudit(spark, sf).collect()
      .map(r => r.getAs[String]("pair") -> r).toMap
    graft.CacheGuard.release()
    assert(out.size === 3)
    out.values.foreach { r =>
      assert(r.getAs[Long]("spearman_ppm") <= 1000000L &&
        r.getAs[Long]("spearman_ppm") >= -1000000L)
      assert(r.getAs[Long]("pearson_r2_ppm") >= 0L &&
        r.getAs[Long]("pearson_r2_ppm") <= 1000000L)
    }
    // full driver replay of the len↔tokens pair
    val rows = graft.Tables.documents(spark, sf)
      .select("n_chars", "text").collect()
      .map { r =>
        val tk = Option(r.getAs[String]("text")).getOrElse("")
          .toLowerCase.split("\\s+").filter(_.nonEmpty)
        (r.getAs[Long]("n_chars"), tk.length.toLong)
      }
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val freq = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sorted = freq.keys.toSeq.sorted
      val cum = sorted.scanLeft(0L)((acc, v) => acc + freq(v))
      sorted.zip(cum).map { case (v, cb) => v -> (2 * cb + freq(v) + 1) }.toMap
    }
    val (rx, ry) = (rank2(rows.map(_._1)), rank2(rows.map(_._2)))
    val n = BigInt(rows.length)
    val sd2 = rows.map { case (x, y) =>
      val d = BigInt(rx(x) - ry(y)); d * d }.sum
    val wantSp = BigInt(1000000) - (6 * sd2 * 1000000) / (4 * n * (n * n - 1))
    assert(BigInt(out("len_vs_tokens").getAs[Long]("spearman_ppm")) === wantSp)
    val (sx, sy) = (rows.map(r => BigInt(r._1)).sum, rows.map(r => BigInt(r._2)).sum)
    val sxx = rows.map(r => BigInt(r._1) * r._1).sum
    val syy = rows.map(r => BigInt(r._2) * r._2).sum
    val sxy = rows.map(r => BigInt(r._1) * r._2).sum
    val cov = n * sxy - sx * sy
    val vr = (n * sxx - sx * sx) * (n * syy - sy * sy)
    val wantR2 = if (vr == 0) BigInt(0) else cov * cov * 1000000 / vr
    assert(BigInt(out("len_vs_tokens").getAs[Long]("pearson_r2_ppm")) === wantR2)
    assert(out("len_vs_tokens").getAs[Long]("pearson_sign") === cov.signum.toLong)
  }

  test("fdProfile: true FDs hold with zero violations, false candidates measure theirs") {
    val out = Profiler.fdProfile(spark, sf).collect()
      .map(r => r.getAs[String]("candidate") -> r).toMap
    assert(out.size === 5)
    // structural truths of the star schema
    assert(out("nation_to_region").getAs[Boolean]("holds"))
    assert(out("custkey_to_segment").getAs[Boolean]("holds"))
    assert(out("orderkey_to_custkey").getAs[Boolean]("holds"))
    // a user emits many event types; priorities span statuses
    assert(!out("user_to_event_type").getAs[Boolean]("holds"))
    // driver replay of one candidate's exact violation count
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val nViol = ev.groupBy(_._1).values.count(_.map(_._2).distinct.length > 1)
    val r = out("user_to_event_type")
    assert(r.getAs[Long]("n_keys") === ev.map(_._1).distinct.length.toLong)
    assert(r.getAs[Long]("n_violating") === nViol.toLong)
    out.values.foreach { x =>
      assert(x.getAs[Long]("violation_bp") ===
        x.getAs[Long]("n_violating") * 10000L / x.getAs[Long]("n_keys"))
      assert(x.getAs[Boolean]("holds") === (x.getAs[Long]("n_violating") == 0))
    }
  }

  test("q287: randomized response — full mechanism replay and debias algebra") {
    import spark.implicits._
    val out = Profiler.randomizedResponse(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val langs = docs.map(_._2).distinct.sorted
    val k = langs.length.toLong
    val li = langs.zipWithIndex.map { case (l, i) => l -> i.toLong }.toMap
    def md532(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    // privatize every doc with the same deterministic coins
    val reported = docs.map { case (id, lang) =>
      val h = md532(s"rr:$id")
      val own = li(lang)
      if (h % Profiler.rrDen < Profiler.rrKeepNum) own
      else {
        val alt = (h / Profiler.rrDen) % (k - 1)
        if (alt >= own) alt + 1 else alt
      }
    }
    val obs = reported.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val trueN = docs.groupBy(d => li(d._2)).view
      .mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    out.foreach { r =>
      val i = li(r.getAs[String]("lang"))
      assert(r.getAs[Long]("true_n") === trueN.getOrElse(i, 0L))
      assert(r.getAs[Long]("reported_n") === obs.getOrElse(i, 0L))
      val est = (Profiler.rrDen * (k - 1) * obs.getOrElse(i, 0L) -
        (Profiler.rrDen - Profiler.rrKeepNum) * n) /
        (Profiler.rrKeepNum * k - Profiler.rrDen)
      assert(r.getAs[Long]("est_n") === est)
      assert(r.getAs[Long]("err") === est - trueN.getOrElse(i, 0L))
      assert(r.getAs[Long]("k") === k)
      assert(r.getAs[Long]("n") === n)
    }
    // the mechanism actually flipped somebody (p < 1) and the debiased
    // estimates track truth better than the raw observed counts overall
    assert(out.exists(r =>
      r.getAs[Long]("reported_n") !== r.getAs[Long]("true_n")))
    val rawErr = out.map(r => math.abs(
      r.getAs[Long]("reported_n") - r.getAs[Long]("true_n"))).sum
    val estErr = out.map(r => math.abs(r.getAs[Long]("err"))).sum
    assert(estErr <= rawErr,
      s"debias must not be worse than raw ($estErr vs $rawErr)")
  }

  test("lDiversityAudit: full driver replay of entropy/tvd integer math; consistent with q210's classes") {
    def round8(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pub = Profiler.publishedQi(spark, sf).collect()
      .map(r => ((r.getAs[Long]("qi_nation"), r.getAs[String]("qi_segment"),
        r.getAs[Boolean]("qi_acct_neg")), r.getAs[String]("sensitive")))
    val nTotal = pub.length.toLong
    val cc = pub.groupBy(identity).map { case ((qi, s), rs) =>
      (qi, s, rs.length.toLong) }.toSeq
    val g = cc.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    val out = Profiler.lDiversityAudit(spark, sf).collect()
    val byClass = cc.groupBy(_._1)
    assert(out.length === byClass.size)
    out.foreach { r =>
      val qi = (r.getAs[Long]("qi_nation"), r.getAs[String]("qi_segment"),
        r.getAs[Boolean]("qi_acct_neg"))
      val cnts = byClass(qi).map(_._3)
      val n = cnts.sum
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("l_distinct") === cnts.length.toLong)
      // entropy: per-term micro-nat quantization, then the h6 snap
      val hsumU = cnts.map(c => math.floor(
        (c.toDouble * round8(math.log(c.toDouble / n.toDouble))) * 1e6 +
          0.5).toLong).sum
      val h6 = math.floor(((-hsumU).toDouble / 1e6) / n.toDouble * 1e6 +
        0.5).toLong
      assert(r.getAs[Double]("entropy_nats") === h6.toDouble / 1e6)
      assert(r.getAs[Boolean]("entropy_l_violation") === (h6 < 1098613L))
      // t-closeness: integer-exact variational distance over ALL global
      // sensitive values (absent ones contribute g_s·n)
      val have = byClass(qi).map(t => t._2 -> t._3).toMap
      val tvdNum = g.map { case (s, gs) =>
        math.abs(have.getOrElse(s, 0L) * nTotal - gs * n) }.sum
      assert(r.getAs[Double]("tvd") ===
        math.floor(tvdNum.toDouble / (2.0 * (n * nTotal).toDouble) * 1e6 +
          0.5) / 1e6)
      assert(r.getAs[Boolean]("t_violation") === (tvdNum * 10 > n * nTotal * 7))
      // entropy l-diversity is strictly stronger than distinct-l: a
      // single-value class has H = 0 and must violate
      if (r.getAs[Long]("l_distinct") === 1L)
        assert(r.getAs[Boolean]("entropy_l_violation"))
    }
    // same release candidate as q210: class keys and sizes agree
    val k = Profiler.kAnonymityAudit(spark, sf).collect()
      .map(r => (r.getAs[Long]("qi_nation"), r.getAs[String]("qi_segment"),
        r.getAs[Boolean]("qi_acct_neg")) -> r.getAs[Long]("n")).toMap
    out.foreach { r =>
      val qi = (r.getAs[Long]("qi_nation"), r.getAs[String]("qi_segment"),
        r.getAs[Boolean]("qi_acct_neg"))
      assert(k(qi) === r.getAs[Long]("n"))
    }
  }
}
