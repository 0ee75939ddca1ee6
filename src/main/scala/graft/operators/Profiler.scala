package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Generic per-column data-quality profiler — the "describe my table"
  * pass every ingestion pipeline runs before training on a new source
  * (row counts, null counts, cardinality, value range per column).
  *
  * Shape: MELT the fixed column list into (col_name, value-as-string)
  * rows, then two stacked keyed aggregations. The melt is the explicit
  * form of what a wide `agg(countDistinct(a), countDistinct(b), ...)`
  * makes Catalyst do anyway (an Expand multiplying rows by the number of
  * distinct aggregates) — but keyed melt keeps every aggregate fully
  * partial (map-side combine on (col, value) first, so the second
  * shuffle carries one row per DISTINCT value, not per row). At 100 TB:
  * two shuffles, both combiner-reduced; no per-column job fan-out; adding
  * a column costs one more array element, not one more scan.
  *
  * Values compare in STRING space — the type-generic contract (numeric
  * range profiling would cast before the melt); both engines use
  * byte-lexicographic VARCHAR ordering so min/max agree.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("kv"))
      .select(col("kv.c").as("col_name"), col("kv.v").as("v"))
    melted
      .groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(col("v")).as("n_distinct"), // count() skips null rows
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"))
      .orderBy(col("col_name"))
  }

  /** The `documents` table profiled over all five columns. */
  def documentsProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  /** Equi-width histogram of `events.value` — the distribution sketch a
    * profiling pass draws next to the per-column stats. Two passes: one
    * tiny min/max aggregate (broadcast back as a 1-row relation), then
    * one partial-aggregated groupBy over at most `nb` bucket keys — the
    * corpus never sorts and the exchange carries ≤ nb rows per
    * partition. The max value clamps into the last bucket (`least`), the
    * standard closed-top-bucket convention. Empty buckets are absent
    * (the oracle mirrors both choices). */
  def valueHistogram(spark: SparkSession, dir: String,
                     nb: Int = 20): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"value")
      .filter($"value".isNotNull)
    val bounds = ev.agg(min($"value").as("lo"), max($"value").as("hi"))
    ev.crossJoin(broadcast(bounds))
      .select(least(
          floor(($"value" - $"lo") / (($"hi" - $"lo") / nb)).cast("long"),
          lit(nb - 1L)).as("bucket"),
        $"lo", $"hi")
      .select($"bucket",
        (Quant.r4($"lo" + $"bucket" * (($"hi" - $"lo") / nb)) + lit(0.0))
          .as("bucket_lo"))
      .groupBy($"bucket", $"bucket_lo")
      .agg(count(lit(1)).as("n"))
      .orderBy($"bucket")
  }

  /** Declarative data-quality expectation suite (the Deequ /
    * Great-Expectations artifact): named constraints over `orders`
    * evaluated into a verdict table — check, column, satisfied count,
    * observed basis points, threshold, pass — the CI gate a pipeline
    * runs before publishing a snapshot (q83 profiles; this VERIFIES).
    * One deliberately tight bound (`totalprice ≤ 3·10⁵`) fails on the
    * real data so the verdict column genuinely carries both outcomes.
    *
    * Scale shape: all row-local constraints ride ONE scan as
    * conditional sums (map-side partials to a single row); uniqueness
    * adds the unavoidable distinct on the key column; the referential
    * check is a broadcast semi-join count (the q01 allowlist shape).
    * Everything integer: observed_bp = satisfied·10⁴ div n. */
  def expectationSuite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val custKeys = Tables.customer(spark, dir).select($"c_custkey").distinct()
    val base = o.agg(
      count(lit(1)).as("n"),
      sum(when($"o_custkey".isNotNull, 1L).otherwise(0L)).as("s_complete"),
      sum(when($"o_totalprice" >= 0 && $"o_totalprice" < 1000000, 1L)
        .otherwise(0L)).as("s_range"),
      sum(when($"o_orderstatus".isin("O", "F", "P"), 1L).otherwise(0L))
        .as("s_domain"),
      sum(when($"o_totalprice" <= 300000, 1L).otherwise(0L)).as("s_cap"))
    val uniq = o.agg(countDistinct($"o_orderkey").as("s_unique"))
    val ref = o.join(broadcast(custKeys), $"o_custkey" === $"c_custkey",
        "left_semi")
      .agg(count(lit(1)).as("s_ref"))
    val m = base.crossJoin(uniq).crossJoin(ref)
    def row(check: String, column: String, s: org.apache.spark.sql.Column,
            thresholdBp: Long) =
      m.select(lit(check).as("check"), lit(column).as("column"),
        s.as("satisfied"), $"n",
        expr(s"${s.toString} * 10000 div n").as("observed_bp"),
        lit(thresholdBp).as("threshold_bp"))
    Seq(
      row("completeness", "o_custkey", $"s_complete", 10000L),
      row("uniqueness", "o_orderkey", $"s_unique", 10000L),
      row("value_range_0_1m", "o_totalprice", $"s_range", 10000L),
      row("status_domain", "o_orderstatus", $"s_domain", 10000L),
      row("price_cap_300k", "o_totalprice", $"s_cap", 10000L),
      row("referential_customer", "o_custkey", $"s_ref", 10000L))
      .reduce(_.unionByName(_))
      .withColumn("pass", $"observed_bp" >= $"threshold_bp")
      .orderBy($"check")
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala 2007)
    * — the release-gate complement of the GDPR cascade (q125) and keyed
    * pseudonymization (q162): BEFORE a curated slice ships, measure how
    * re-identifiable its quasi-identifiers leave each row. The "published"
    * relation is orders joined to their customers; the quasi-identifier is
    * (nation, market segment, account-balance sign) — attributes an
    * adversary plausibly knows — and the sensitive attribute is the
    * order's priority. Per equivalence class (distinct QI tuple):
    *   - `n` rows sharing the QI (the class's k): small classes
    *     re-identify — `k_violation` flags n < kMin,
    *   - `l` distinct sensitive values: a class where everyone shares one
    *     priority leaks it even at large k — `l_violation` flags l < lMin,
    * plus the class share in basis points. The release verdict is then
    * one filter away (any violating class → suppress or generalize).
    *
    * Scale shape: one orders⋈customer equi-join (customer is the smaller
    * side but both shuffle-partition by custkey at 100 TB; AQE may
    * broadcast at test SF), then ONE groupBy over the O(classes) QI
    * domain with map-side partial counts + a partial-aggregable
    * `countDistinct` over the tiny priority domain. No window, no
    * per-class sort; the total-row count for the share column is
    * broadcast back from a 1-row aggregate. The sign band (not a float
    * bucket) is deliberate: banding a DOUBLE balance with floor-division
    * is the half-boundary class BASELINE.md retired. */
  def kAnonymityAudit(spark: SparkSession, dir: String,
                      kMin: Int = 10, lMin: Int = 3): DataFrame = {
    import spark.implicits._
    val published = publishedQi(spark, dir)
    val classes = published
      .groupBy($"qi_nation", $"qi_segment", $"qi_acct_neg")
      .agg(count(lit(1)).as("n"),
        countDistinct($"sensitive").as("l"))
    val total = published.agg(count(lit(1)).as("n_total"))
    classes.crossJoin(broadcast(total))
      .select($"qi_nation", $"qi_segment", $"qi_acct_neg", $"n", $"l",
        expr("n * 10000 div n_total").as("share_bp"),
        ($"n" < kMin).as("k_violation"),
        ($"l" < lMin).as("l_violation"))
      .orderBy($"qi_nation", $"qi_segment", $"qi_acct_neg")
  }

  /** The q210/q309 "published" relation: orders joined to their
    * customers, projected to the quasi-identifier tuple plus the
    * sensitive attribute. Factored so the k-anonymity audit and the
    * l-diversity/t-closeness audit measure the SAME release candidate. */
  private[operators] def publishedQi(spark: SparkSession,
                                     dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long").as("qi_nation"),
        $"c_mktsegment".as("qi_segment"),
        ($"c_acctbal" < 0).as("qi_acct_neg"),
        $"o_orderpriority".as("sensitive"))
  }

  /** Entropy l-diversity + t-closeness audit (Machanavajjhala et al.
    * 2007 §3; Li, Li & Venkatasubramanian 2007) — the two published
    * strengthenings of q210's distinct-l check, over the SAME released
    * relation ([[publishedQi]]). Distinct-l is gameable: a class of
    * 1000 rows with 999 '1-URGENT' and one of each other priority
    * passes l=5 while leaking the sensitive value with 99.9%
    * confidence. Per equivalence class this audit reports:
    *   - `n`, `l_distinct` — q210's measures, for continuity;
    *   - `entropy_nats` — Shannon entropy of the class's sensitive
    *     distribution; entropy l-diversity requires H ≥ ln(l). The
    *     violation flag compares the QUANTIZED micro-nat value against
    *     ⌈ln(3)·10⁶⌉ = 1098613 carried as an exact integer literal
    *     (the benfordPpm discipline: no cross-engine transcendental at
    *     the comparison boundary);
    *   - `tvd` + `t_violation` — t-closeness distance between the
    *     class distribution and the GLOBAL sensitive distribution.
    *     For a categorical attribute the variational distance
    *     ½·Σ|p_c − p_g| is the published instantiation (Li §4.1), and
    *     it is computed INTEGER-EXACTLY: Σ|cnt_cs·N − g_s·n| in
    *     BIGINT, one final division for the report column, and the
    *     t > 0.35 flag as the pure integer test 10·num > 7·n·N.
    *
    * Cross-engine float discipline: the only transcendental is ln(p),
    * ulp-snapped with round(·,8) then quantized to micro-nat LONGs per
    * term, so the per-class sum is order-independent (the round-7
    * discipline; see Quant).
    *
    * Scale shape: ONE shuffle over (QI, sensitive) with map-side
    * partial counts; everything downstream — class totals, global
    * marginals, entropy terms, the zero-filled class×value grid for
    * t-closeness — re-aggregates the barriered O(classes·values)
    * count relation, never the published rows. The grid is
    * classes×values (bounded domains), not rows×values. */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qi = Seq("qi_nation", "qi_segment", "qi_acct_neg")
    val cc = graft.CacheGuard.barrier(
      publishedQi(spark, dir)
        .groupBy($"qi_nation", $"qi_segment", $"qi_acct_neg", $"sensitive")
        .agg(count(lit(1)).as("cnt")))
    val cls = cc.groupBy($"qi_nation", $"qi_segment", $"qi_acct_neg")
      .agg(sum($"cnt").as("n"), count(lit(1)).as("l_distinct"))
    val g = cc.groupBy($"sensitive").agg(sum($"cnt").as("g_cnt"))
    val tot = cc.agg(sum($"cnt").as("n_total"))
    val ent = cc
      .join(cls.select($"qi_nation", $"qi_segment", $"qi_acct_neg", $"n"), qi)
      .withColumn("u", floor(($"cnt".cast("double") *
        round(log($"cnt".cast("double") / $"n".cast("double")), 8)) * // round-ok: ulp-snap on ln before quantize (round-7 discipline)
        lit(1e6) + lit(0.5)).cast("long"))
      .groupBy($"qi_nation", $"qi_segment", $"qi_acct_neg")
      .agg(sum($"u").as("hsum_u"))
    val tvdNum = cls.select($"qi_nation", $"qi_segment", $"qi_acct_neg", $"n")
      .crossJoin(broadcast(g))
      .join(cc, qi :+ "sensitive", "left")
      .crossJoin(broadcast(tot))
      .withColumn("term",
        abs(coalesce($"cnt", lit(0L)) * $"n_total" - $"g_cnt" * $"n"))
      .groupBy($"qi_nation", $"qi_segment", $"qi_acct_neg")
      .agg(sum($"term").as("tvd_num"))
    cls.join(ent, qi).join(tvdNum, qi).crossJoin(broadcast(tot))
      .withColumn("h6", floor((((-$"hsum_u").cast("double") / lit(1e6)) /
        $"n".cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
      .select($"qi_nation", $"qi_segment", $"qi_acct_neg",
        $"n", $"l_distinct",
        ($"h6".cast("double") / lit(1e6)).as("entropy_nats"),
        ($"h6" < lit(1098613L)).as("entropy_l_violation"), // ⌈ln(3)·1e6⌉, exact literal
        (floor(($"tvd_num".cast("double") /
          (lit(2.0) * ($"n" * $"n_total").cast("double"))) * lit(1e6) +
          lit(0.5)) / lit(1e6)).as("tvd"),
        ($"tvd_num" * lit(10L) > $"n" * $"n_total" * lit(7L))
          .as("t_violation"))
      .orderBy($"qi_nation", $"qi_segment", $"qi_acct_neg")
  }

  /** Benford expected first-digit shares in exact ppm — log₁₀(1+1/d)·10⁶
    * rounded to the nearest ppm (the nine roundings sum to exactly 10⁶),
    * precomputed so neither engine evaluates a transcendental at query
    * time (log is 1-ulp wobbly cross-engine; a literal table cannot be).
    * Shared with the q213 oracle SQL the way `CorpusOps.defaultRates`
    * feeds q49's CASE — one source of truth. */
  val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford's-law first-digit audit (Newcomb 1881; Benford 1938) over
    * order totals — the classic fabricated-numbers screen: organically
    * grown magnitudes follow P(d) = log₁₀(1+1/d), while invented or
    * range-capped figures drift. Per digit: observed count, observed
    * share in ppm, the expected Benford ppm, absolute deviation, and a
    * >1pp deviation flag. A uniform price generator (this corpus) flags
    * several digits — exactly what the audit is for.
    *
    * First-digit extraction is EXACT: prices quantize to integer cents
    * (`⌊p·100+0.5⌋`, the u-unit money discipline — both engines compute
    * the same BIGINT), and the leading digit of the cents integer equals
    * the leading digit of the price (×100 never changes the leading
    * significant digit) — so the digit is `substr(CAST(cents), 1, 1)`,
    * a deterministic integer render on both engines. Never
    * floor(x/10^⌊log₁₀x⌋): the float log wobbles cross-engine at powers
    * of ten.
    *
    * Scale shape: one scan collapsing to 9 rows with map-side partials;
    * the total re-joins from a broadcast 1-row aggregate. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = Tables.orders(spark, dir)
      .select(substring(
        floor($"o_totalprice" * 100 + lit(0.5)).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum($"n").as("n_total"))
    val expected = benfordPpm.toDF("digit", "benford_ppm")
    digits.crossJoin(broadcast(total))
      .join(broadcast(expected), "digit")
      .select($"digit", $"n",
        expr("n * 1000000 div n_total").as("observed_ppm"),
        $"benford_ppm",
        abs(expr("n * 1000000 div n_total") - $"benford_ppm")
          .as("deviation_ppm"))
      .withColumn("flagged", $"deviation_ppm" > 10000L)
      .orderBy($"digit")
  }

  /** Dataset card — the datasheet/model-card summary (Gebru et al. 2021)
    * a corpus release ships with, as ONE queryable artifact: size (docs,
    * sources, languages, tokens), duplication (exact-fingerprint dup
    * docs + ppm), shortness (sub-10-token docs + ppm), quality
    * distribution (exact p25/p50/p75 of the q26/q168 quality score in
    * 1e-4 units), source concentration (largest source's share), and
    * mean document length in micro-tokens. Every value is an exact
    * BIGINT (counts, ppm, u4 grid quantiles) — the card hash-compares
    * across engines and across releases, so a corpus diff is a table
    * diff.
    *
    * Scale shape: one pass computes the per-doc features (tokens, stop
    * count, fingerprint) behind a cache barrier; the global stats are
    * partial-aggregated counts/distincts, the quantiles ride the
    * (u, cnt) frequency grid (O(distinct scores) rows — the q168
    * discipline, never a corpus sort), and source concentration rolls
    * up the O(sources) count relation. The card itself is a stack
    * unpivot of a 1-row aggregate. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.{fingerprint, stopwordCount, tokens}
    val toks = tokens($"text")
    val base = graft.CacheGuard.barrier(
      Tables.documents(spark, dir).select($"source", $"lang",
        size(toks).cast("long").as("nt"),
        stopwordCount(toks, TextAnalysis.stopwords)
          .cast("long").as("ns"),
        fingerprint($"text").as("fp")))
    val totals = base.agg(
      count(lit(1)).as("n_docs"),
      countDistinct($"source").as("n_sources"),
      countDistinct($"lang").as("n_langs"),
      sum($"nt").as("total_tokens"),
      sum(when($"nt" < 10, 1L).otherwise(0L)).as("n_short"),
      countDistinct($"fp").as("n_distinct_fp"))
    val freq = base
      .select(floor(TextAnalysis.qualityExpr($"nt", $"ns") * 1e4 + lit(0.5))
        .cast("long").as("u"))
      .groupBy($"u").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"u")  // global-window-ok: O(u4 quality grid) value-frequency table
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = freq.withColumn("cum", sum($"cnt").over(w))
      .crossJoin(broadcast(freq.agg(sum($"cnt").as("n"))))
    // all three percentiles from ONE cumulative grid as conditional mins —
    // the previous per-percentile filter+agg built three clones of the
    // freq/window/crossjoin tower into the final plan, and whole-stage
    // codegen compiled every clone (45–52 s compile_ms cold, r16 verdict
    // #4; the data was never the cost — the generated code was)
    val pcts = cum.agg(
      min(when($"cum" * 100 >= $"n" * 25, $"u")).as("p25"),
      min(when($"cum" * 100 >= $"n" * 50, $"u")).as("p50"),
      min(when($"cum" * 100 >= $"n" * 75, $"u")).as("p75"))
    val conc = base.groupBy($"source").agg(count(lit(1)).as("sc"))
      .agg(max($"sc").as("max_source"))
    // one stack(13) over one 1-row crossjoin: the old stack(12) UNION'd a
    // second full reference to the row relation for the 13th stat, which
    // doubled the compiled plan for one extra output row
    totals.crossJoin(pcts).crossJoin(conc).selectExpr(
        """stack(13,
          |  'n_docs', n_docs,
          |  'n_sources', n_sources,
          |  'n_langs', n_langs,
          |  'total_tokens', total_tokens,
          |  'mean_doc_tokens_micro', total_tokens * 1000000 div n_docs,
          |  'n_exact_dup_docs', n_docs - n_distinct_fp,
          |  'exact_dup_ppm', (n_docs - n_distinct_fp) * 1000000 div n_docs,
          |  'n_short_docs', n_short,
          |  'short_doc_ppm', n_short * 1000000 div n_docs,
          |  'quality_p25_u4', p25,
          |  'quality_p50_u4', p50,
          |  'quality_p75_u4', p75,
          |  'top_source_share_ppm', max_source * 1000000 div n_docs)
          |AS (stat, value)""".stripMargin)
      .orderBy($"stat")
  }

  /** Coverage MATRIX — the completeness grid a corpus QA dashboard
    * shows: every (source × lang) cell the observed marginals imply,
    * with its doc count — including the ZERO cells, which are the
    * finding (a source that stopped shipping a language is invisible
    * to any groupBy over observed rows; the grid anti-join surfaces
    * it). Cells also carry their share of the source's docs in bp and
    * an `empty` flag.
    *
    * Scale shape: the grid is the CROSS of two tiny distinct relations
    * (O(sources × langs) rows — the schema's cube, not the data's);
    * observed counts come from one map-side-partial groupBy; the fill
    * is a LEFT join of grid onto counts, never a scan per cell. */
  def coverageMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.CacheGuard.barrier(
      Tables.documents(spark, dir).select($"source", $"lang"))
    val grid = docs.select($"source").distinct()
      .crossJoin(docs.select($"lang").distinct())
    val counts = docs.groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n"))
    val perSource = docs.groupBy($"source").agg(count(lit(1)).as("n_source"))
    grid.join(counts, Seq("source", "lang"), "left")
      .join(broadcast(perSource), "source")
      .select($"source", $"lang", coalesce($"n", lit(0L)).as("n_docs"),
        expr("coalesce(n, 0) * 10000 div n_source").as("source_share_bp"),
        $"n".isNull.as("empty"))
      .orderBy($"source", $"lang")
  }

  /** EXACT correlation audit — "is document quality just length?" and
    * every other feature-redundancy question, answered with two
    * correlation statistics computed as EXACT RATIONALS (a float corr()
    * hash-diverges on summation order; these cannot):
    *   - Spearman via the Σd² formula on tie-averaged DOUBLED ranks
    *     (avg rank of a tied block = cum_before + (cnt+1)/2, doubled to
    *     stay integer: r₂ = 2·cum_before + cnt + 1), ρ_ppm = 10⁶ −
    *     (6·Σd²·10⁶) div (4·n(n²−1)) — the dividend is nonnegative, so
    *     truncation ≡ floor on both engines,
    *   - Pearson's r² in ppm from the five power sums, numerator
    *     (nΣxy−ΣxΣy)² over the variance product, sign reported
    *     separately — no square root anywhere.
    * DECIMAL(38) intermediates throughout (Σd²·10⁶ alone passes BIGINT
    * at sf1).
    *
    * Scale shape: rank maps come from per-feature VALUE-FREQUENCY
    * tables (cumulative window over O(distinct values), the q168
    * discipline — never a corpus sort) and broadcast back; power sums
    * are one map-side-partial aggregation. */
  def correlationAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.{stopwordCount, tokens}
    val toks = tokens($"text")
    val base = graft.CacheGuard.barrier(
      Tables.documents(spark, dir).select(
        $"n_chars".as("len"),
        floor(TextAnalysis.qualityExpr(size(toks).cast("long"),
          stopwordCount(toks, TextAnalysis.stopwords).cast("long")) * 1e4
          + lit(0.5)).cast("long").as("q"),
        size(toks).cast("long").as("nt")))
    def rank2Map(c: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))  // global-window-ok: O(distinct values) value-frequency table
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum($"cnt").over(w), lit(0L)))
        .select(col(c).as(s"${c}_v"),
          (lit(2L) * $"cb" + $"cnt" + 1L).as(s"r2_$c"))
    }
    def pair(name: String, x: String, y: String): DataFrame = {
      val ranked = base
        .join(broadcast(rank2Map(x)), col(x) === col(s"${x}_v"))
        .join(broadcast(rank2Map(y)), col(y) === col(s"${y}_v"))
      val agg = ranked.agg(
        count(lit(1)).as("n"),
        sum(((col(s"r2_$x") - col(s"r2_$y")) * (col(s"r2_$x") - col(s"r2_$y")))
          .cast("decimal(38,0)")).as("sd2"),
        sum(col(x).cast("decimal(38,0)")).as("sx"),
        sum(col(y).cast("decimal(38,0)")).as("sy"),
        sum((col(x) * col(x)).cast("decimal(38,0)")).as("sxx"),
        sum((col(y) * col(y)).cast("decimal(38,0)")).as("syy"),
        sum((col(x) * col(y)).cast("decimal(38,0)")).as("sxy"))
      agg.select(lit(name).as("pair"), $"n",
          expr("1000000 - (6 * sd2 * 1000000) div " +
            "(cast(4 as decimal(38,0)) * n * (cast(n as decimal(38,0)) * n - 1))")
            .as("spearman_ppm"),
          expr("cast(n as decimal(38,0)) * sxy - sx * sy").as("cov_n"),
          expr("(cast(n as decimal(38,0)) * sxx - sx * sx) * " +
            "(cast(n as decimal(38,0)) * syy - sy * sy)").as("var_n"))
        .select($"pair", $"n", $"spearman_ppm",
          when($"var_n" === 0, 0L)
            .otherwise(expr("((cov_n * cov_n) * 1000000) div var_n"))
            .as("pearson_r2_ppm"),
          when($"cov_n" > 0, 1L).when($"cov_n" < 0, -1L).otherwise(0L)
            .as("pearson_sign"))
    }
    pair("len_vs_quality", "len", "q")
      .unionByName(pair("len_vs_tokens", "len", "nt"))
      .unionByName(pair("tokens_vs_quality", "nt", "q"))
      .orderBy($"pair")
  }

  /** Functional-dependency PROFILER — the schema-discovery pass a data
    * catalog runs before trusting join keys and denormalizations: does
    * determinant column A functionally determine dependent B (every A
    * value maps to exactly one B)? Candidates audited across the star:
    * true FDs (nation → region via n_regionkey; custkey → segment),
    * and plausible-but-false ones (order priority → status; user →
    * event type) — the profiler's value is separating the two with
    * exact violation counts, not asserting the schema's intent. Per
    * candidate: distinct determinant values, violating determinants
    * (those with >1 distinct dependent), violation bp, and the holds
    * verdict.
    *
    * Scale shape: per candidate ONE groupBy(A) with a partial-aggregable
    * `countDistinct(B)` (tiny dependent domains), then an O(keys)
    * rollup — never a self-join; candidates on different tables are
    * independent scans united at O(candidates) rows. */
  def fdProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def audit(name: String, rel: DataFrame, det: String,
              dep: String): DataFrame =
      rel.select(col(det).cast("string").as("a"),
          col(dep).cast("string").as("b"))
        .groupBy($"a").agg(countDistinct($"b").as("nb"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when($"nb" > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(name).as("candidate"), $"n_keys", $"n_violating",
          expr("n_violating * 10000 div n_keys").as("violation_bp"),
          ($"n_violating" === 0).as("holds"))
    audit("nation_to_region", Tables.nation(spark, dir),
        "n_nationkey", "n_regionkey")
      .unionByName(audit("custkey_to_segment", Tables.customer(spark, dir),
        "c_custkey", "c_mktsegment"))
      .unionByName(audit("orderpriority_to_status", Tables.orders(spark, dir),
        "o_orderpriority", "o_orderstatus"))
      .unionByName(audit("user_to_event_type", Tables.events(spark, dir),
        "user_id", "event_type"))
      .unionByName(audit("orderkey_to_custkey", Tables.orders(spark, dir),
        "o_orderkey", "o_custkey"))
      .orderBy($"candidate")
  }

  /** Randomized-response keep probability = [[rrKeepNum]]/[[rrDen]],
    * shared with the q287 oracle. ε = ln(p·(k−1)/(1−p)) = ln(3(k−1)). */
  val rrKeepNum = 12
  val rrDen = 16

  /** LOCAL-DP RANDOMIZED RESPONSE AUDIT (q287) — Warner 1965 / the
    * RAPPOR primitive, completing the privacy kit (q210 measures
    * re-identification risk, q162 pseudonymizes, q125 erases — this
    * PRIVATIZES a categorical column and prices the utility cost):
    * each document reports its true `lang` with probability p = 12/16,
    * else one of the k−1 other categories uniformly; the aggregator
    * sees only privatized counts and DEBIASES with the closed form
    * n̂_c = (16(k−1)·obs_c − 4n) div (12k − 16) — exact integer
    * arithmetic, no float estimate. The "randomness" is a deterministic
    * md5 coin per doc_id (both engines replay the identical
    * privatization — what is audited is the MECHANISM + debias
    * algebra, not entropy). Output per category: true count (the
    * utility reference the aggregator would NOT have), observed
    * privatized count, debiased estimate, signed error, and the
    * mechanism's ε in u4.
    *
    * Scale shape: one scan with per-row hash arithmetic against a
    * broadcast O(k) category index (the global index window is
    * O(categories)); two keyed counts over the k-row key space —
    * map-side partials collapse everything before the exchange. */
  def randomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.md5Hash32
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select($"doc_id", $"lang")
    val idx = docs.select($"lang").distinct()
      .withColumn("li",
        row_number().over(Window.orderBy($"lang")).cast("long") - 1L)  // global-window-ok: O(languages)
    val kRow = idx.agg(count(lit(1)).as("k"))
    val coined = docs.join(broadcast(idx), "lang")
      .crossJoin(broadcast(kRow))
      .withColumn("h",
        md5Hash32(concat(lit("rr:"), $"doc_id".cast("string"))))
      .withColumn("keep", $"h" % rrDen < rrKeepNum)
      .withColumn("alt", expr(s"(h div $rrDen) % (k - 1)"))
      .withColumn("rep_li",
        when($"keep", $"li")
          .otherwise(when($"alt" >= $"li", $"alt" + 1L).otherwise($"alt")))
    val trueN = coined.groupBy($"li").agg(count(lit(1)).as("true_n"))
    val obsN = coined.groupBy($"rep_li".as("li"))
      .agg(count(lit(1)).as("reported_n"))
    val tot = docs.agg(count(lit(1)).as("n"))
    idx.join(trueN, Seq("li"), "left").join(obsN, Seq("li"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(kRow))
      .select($"lang",
        coalesce($"true_n", lit(0L)).as("true_n"),
        coalesce($"reported_n", lit(0L)).as("reported_n"),
        expr(s"($rrDen * (k - 1) * coalesce(reported_n, 0) - " +
          s"${rrDen - rrKeepNum} * n) div ($rrKeepNum * k - $rrDen)")
          .as("est_n"),
        $"k", $"n")
      .withColumn("err", $"est_n" - $"true_n")
      // ln is not correctly-rounded: snap at 8 dp before quantizing
      .withColumn("eps_u4",
        floor(round(log(lit(3.0) * ($"k" - 1L).cast("double")), 8) * 1e4 // round-ok: ulp-snap on ln before quantize
          + lit(0.5)).cast("long"))
      .orderBy($"lang")
  }

}
