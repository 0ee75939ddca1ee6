package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("hllDistinct: estimate lands within the p=8 error regime of the exact count") {
    val r = Sketches.hllDistinct(spark, sf).head()
    val est = r.getAs[Double]("hll_estimate")
    val exact = r.getAs[Long]("exact_distinct")
    val relErr = r.getAs[Double]("rel_err")
    assert(exact > 0L)
    assert(est > 0.0)
    // 256 registers → ~6.5% standard error; 4σ bound with headroom
    assert(relErr < 0.25, s"estimate $est vs exact $exact (rel_err $relErr)")
    assert(math.abs(relErr - math.abs(est - exact) / exact) < 1e-4)
  }

  test("hllDistinct: deterministic — two runs produce identical rows") {
    val a = Sketches.hllDistinct(spark, sf).head()
    val b = Sketches.hllDistinct(spark, sf).head()
    assert(a === b)
  }

  test("countMinHeavyHitters: never undercounts, top token matches a direct count") {
    import spark.implicits._
    val rows = Sketches.countMinHeavyHitters(spark, sf).collect()
    graft.CacheGuard.release()
    assert(rows.length === 20)
    // CMS structural invariant: estimate ≥ exact, overest is their gap
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
      assert(r.getAs[Long]("overest") ===
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact_cnt"))
    }
    val counts = rows.map(_.getAs[Long]("exact_cnt"))
    assert(counts.sameElements(counts.sortBy(-_)))
    val top = rows.head
    val direct = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .filter($"t" === top.getAs[String]("token")).count()
    assert(direct === top.getAs[Long]("exact_cnt"))
  }

  test("cmsJoinCardinality: estimate upper-bounds the exact join size") {
    import spark.implicits._
    val r = Sketches.cmsJoinCardinality(spark, sf).head()
    graft.CacheGuard.release()
    val exact = r.getAs[Long]("exact_size")
    val est = r.getAs[Long]("cms_estimate")
    assert(exact > 0L)
    assert(est >= exact)
    assert(r.getAs[Long]("overest") === est - exact)
    // sanity of the audit half: exact = actual row count of the join
    val ev = Tables.events(spark, sf)
    val joined = ev.filter($"event_type" === "view").select($"user_id")
      .join(ev.filter($"event_type" === "purchase").select($"user_id"), "user_id")
      .count()
    assert(exact === joined)
  }

  test("hll register shape: buckets in [0, 256), rho in [1, 25]") {
    import spark.implicits._
    // rebuild the register relation exactly as the operator does
    val h = graft.functions.TextFunctions.md5Hash32($"user_id".cast("string"))
    val w = h.bitwiseAND(lit(16777215L))
    val regs = Tables.events(spark, sf)
      .select(
        shiftright(h, 24).as("bucket"),
        when(w === 0, lit(25))
          .otherwise(lit(25) - (floor(log2(w)) + lit(1))).cast("long").as("rho"))
    val rows = regs.collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val rho = r.getAs[Long]("rho")
      assert(b >= 0L && b < Sketches.hllM.toLong)
      assert(rho >= 1L && rho <= 25L)
    }
  }

  test("kmvIntersection: estimate replays the theta-sketch arithmetic; exact is exact") {
    import spark.implicits._
    val r = Sketches.kmvIntersection(spark, sf).head()
    graft.CacheGuard.release()
    val nSample = r.getAs[Long]("n_sample")
    val theta = r.getAs[Long]("theta")
    val est = r.getAs[Double]("kmv_estimate")
    val exact = r.getAs[Long]("exact_overlap")
    assert(nSample >= 0L && nSample <= Sketches.kmvK.toLong)
    assert(theta > 0L)
    // the reported estimate IS the theta formula, bit for bit
    assert(est === BigDecimal(nSample * math.pow(2.0, 32) / theta)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // exact side recomputes from a direct join
    def users(t: String) = Tables.events(spark, sf)
      .filter($"event_type" === t).select($"user_id").distinct()
    assert(exact === users("view").intersect(users("purchase")).count())
    assert(exact > 0L)
  }

  test("quantileMergeAudit: merged = direct exactly; sample quantiles track exact") {
    val rows = Sketches.quantileMergeAudit(spark, sf).collect()
    assert(rows.length === Sketches.qsProbs.length)
    assert(rows.map(_.getAs[Double]("p")).toSeq === Sketches.qsProbs)
    rows.foreach { r =>
      // the merge theorem: both sketch paths yield the SAME sample
      assert(r.getAs[Double]("merged_q") === r.getAs[Double]("direct_q"))
      assert(r.getAs[Double]("merge_diff") === 0.0)
      // a 256-row uniform sample's quantile error: generous 4σ-ish bound
      assert(r.getAs[Double]("rel_err") < 0.25,
        s"p=${r.getAs[Double]("p")} rel_err=${r.getAs[Double]("rel_err")}")
    }
    // quantiles are monotone in p for every column
    for (c <- Seq("exact_q", "direct_q", "merged_q")) {
      val vs = rows.map(_.getAs[Double](c))
      assert(vs.zip(vs.tail).forall { case (a, b) => a <= b }, c)
    }
  }

  test("quantileMergeAudit: exact quantiles replay a driver-side sort of the column") {
    import spark.implicits._
    val vs = Tables.lineitem(spark, sf)
      .select($"l_extendedprice").as[Double].collect().sorted
    val byP = Sketches.quantileMergeAudit(spark, sf).collect()
      .map(r => r.getAs[Double]("p") -> r.getAs[Double]("exact_q")).toMap
    Sketches.qsProbs.foreach { p =>
      val rk = math.floor((vs.length - 1) * p).toLong + 1
      assert(byP(p) === vs((rk - 1).toInt), s"p=$p")
    }
  }

  test("kmvIntersection: deterministic across runs") {
    val a = Sketches.kmvIntersection(spark, sf).head()
    graft.CacheGuard.release()
    val b = Sketches.kmvIntersection(spark, sf).head()
    graft.CacheGuard.release()
    assert(a === b)
  }

  test("rollingHllWau: window merge equals a direct sketch of the window's users (mergeability)") {
    import spark.implicits._
    val out = Sketches.rollingHllWau(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    val m = Sketches.hllM
    def hllOf(users: Set[Long]): Double = {
      val regs = users.toSeq.map { u =>
        val h = h32(u.toString)
        val (b, w) = (h >> 24, h & 16777215L)
        val rho = if (w == 0) 25L
          else 25L - (math.floor(math.log(w.toDouble) / math.log(2.0)).toLong + 1)
        b -> rho
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val present = regs.size
      val sinv = regs.values.map(r => math.pow(2.0, -r.toDouble)).sum
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val eRaw = alpha * m * m / (sinv + (m - present))
      val v = m - present
      val e = if (eRaw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
        else eRaw
      math.floor(BigDecimal(e).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e4 + 0.5) / 1e4
    }
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("d")).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("d").toLocalDate))
    val days = ev.map(_._2).distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    out.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toLocalDate
      val tidx = days.indexOf(day) + 1
      val window = days.slice(math.max(0, tidx - 7), tidx).toSet
      val users = ev.filter(e => window(e._2)).map(_._1).toSet
      // mergeability: max-merged daily registers ≡ one sketch of the union
      assert(r.getAs[Double]("hll_wau") === hllOf(users), s"day $day")
      assert(r.getAs[Long]("exact_wau") === users.size.toLong, s"day $day")
      assert(r.getAs[Long]("window_days") === math.min(tidx, 7).toLong)
    }
    // the p=8 sketch stays in its accuracy regime on every window
    out.foreach(r => assert(r.getAs[Double]("rel_err") < 0.25))
  }

  test("MisraGriesAgg: reduce + merge keep the N/(k+1) error bound on adversarial splits") {
    val k = 9
    val agg = new graft.functions.MisraGriesAgg(k)
    val rng = new scala.util.Random(11)
    // 600 singleton-ish noise tokens + two genuine heavy items
    val stream = rng.shuffle(
      (0 until 600).map(i => s"noise$i") ++
        Seq.fill(300)("hot") ++ Seq.fill(150)("warm"))
    val n = stream.length.toLong
    val truth = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // split into 4 sub-streams, reduce each, merge pairwise both ways
    val parts = stream.grouped(stream.length / 4 + 1).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = parts.reduce(agg.merge)
    val mergedRev = parts.reverse.reduce(agg.merge)
    for (m <- Seq(merged, mergedRev)) {
      assert(m.size <= k)
      // guarantee: every item with freq > N/(k+1) is present...
      truth.foreach { case (t, c) =>
        if (c * (k + 1) > n) assert(m.contains(t), s"lost heavy hitter $t")
        // ...and every counter is an underestimate within N/(k+1)
        val est = m.getOrElse(t, 0L)
        assert(est <= c, s"$t overestimated")
        assert(c - est <= n / (k + 1) + 1, s"$t error beyond bound")
      }
    }
  }

  test("mgHeavyHittersOf: exact output on an adversarial wide-vocab stream") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val k = 9
    val stream = rng.shuffle(
      (0 until 800).map(i => s"n$i") ++
        Seq.fill(400)("alpha") ++ Seq.fill(200)("beta") ++ Seq.fill(90)("gamma"))
    val n = stream.length.toLong
    val got = Sketches.mgHeavyHittersOf(
        stream.toDF("t").repartition(5), k).collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("n_total"),
          r.getAs[Long]("share_bp"))))
    // exact heavy hitters at threshold N/(k+1): alpha (400) and beta
    // (200) clear 1490/10 = 149; gamma (90) and all noise do not
    assert(got.map(_._1).toSeq === Seq("alpha", "beta"))
    got.foreach { case (t, (cnt, total, bp)) =>
      assert(total === n)
      assert(cnt === (if (t == "alpha") 400L else 200L))
      assert(bp === cnt * 10000 / n)
    }
  }

  test("mgHeavyHitters: driver-side exact replay on the corpus") {
    val out = Sketches.mgHeavyHitters(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    // replay: exact token counts + threshold filter
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(r => Option(r.getString(0)).getOrElse(""))
    val toks = docs.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val n = toks.length.toLong
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = counts.filter { case (_, c) => c * 33 > n }
    assert(out.map(_.getAs[String]("token")).toSet === want.keySet)
    out.foreach { r =>
      assert(r.getAs[Long]("cnt") === want(r.getAs[String]("token")))
      assert(r.getAs[Long]("n_total") === n)
    }
  }

  test("q282: AMS F2 — full driver replay of signed folds, exact F2, and the mean estimate") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val out = Sketches.amsF2(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.length === Sketches.amsS)
    val tc = Tables.documents(spark, sf)
      .select(explode(tokens($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    def md532(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val zs = (0 until Sketches.amsS).map { i =>
      tc.map { case (t, c) =>
        (if (md532(s"ams$i#$t") % 2 == 0) 1L else -1L) * c }.sum
    }
    val f2 = tc.map { case (_, c) => c * c }.sum
    val nTok = tc.map(_._2).sum
    val est = zs.map(z => z * z).sum / Sketches.amsS
    out.sortBy(_.getAs[Long]("counter_id")).zipWithIndex.foreach {
      case (r, i) =>
        assert(r.getAs[Long]("z") === zs(i), s"counter $i")
        assert(r.getAs[Long]("z2") === zs(i) * zs(i))
        assert(r.getAs[Long]("f2_exact") === f2)
        assert(r.getAs[Long]("f2_est") === est)
        assert(r.getAs[Long]("n_tokens") === nTok)
        assert(r.getAs[Long]("err_bp") === math.abs(est - f2) * 10000 / f2)
    }
    // the estimator is doing its job at the gate SF: within 50% of exact
    assert(math.abs(est - f2) * 2 <= f2,
      s"AMS estimate $est vs exact $f2 drifted past 50%")
  }

  test("q288: KMV A-not-B — sketch replay, theta rule, exact-difference audit") {
    import spark.implicits._
    import graft.functions.TextFunctions.{tokens, wordShingles}
    val out = Sketches.kmvANotB(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.length === 1)
    val r = out.head
    def shingleSet(src: String): Set[String] =
      Tables.documents(spark, sf).filter($"source" === src)
        .select(explode(wordShingles(tokens($"text"), 3)).as("sh"))
        .collect().map(_.getString(0)).toSet
    val sa = shingleSet("src0"); val sb = shingleSet("src1")
    def md532(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val k = Sketches.kmvK
    val skA = sa.map(md532).toSeq.sorted.take(k)
    val skB = sb.map(md532).toSeq.sorted.take(k).toSet
    val theta = math.min(skA.max, (sb.map(md532).toSeq.sorted.take(k)).max)
    val nSample = skA.count(h => h < theta && !skB.contains(h)).toLong
    assert(r.getAs[Long]("theta") === theta)
    assert(r.getAs[Long]("n_sample") === nSample)
    assert(r.getAs[Long]("exact_diff") === (sa -- sb).size.toLong)
    val estimate =
      math.floor(nSample.toDouble * math.pow(2.0, 32) / theta.toDouble
        * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("kmv_estimate") === estimate)
    // the gate fixture is non-vacuous: a real difference exists and the
    // sketch lands within 50% of it
    val exact = r.getAs[Long]("exact_diff")
    assert(exact > 0L)
    assert(math.abs(estimate - exact) * 2 <= exact.toDouble,
      s"estimate $estimate vs exact $exact")
  }
}
