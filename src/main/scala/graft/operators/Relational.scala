package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator surface (SURVEY.md §2.3–2.5): joins, aggregations,
  * dedup, union, windows. All money aggregates sum DECIMAL-cast inputs so
  * results are associative (order-independent) and hash-identical to the
  * DuckDB oracle regardless of partitioning — a requirement that also holds
  * on a 1000-executor cluster where partial-aggregate ordering is arbitrary.
  */
object Relational {

  /** A1-style conditional counters (`reddit_subm_extraction.py:71,79–93`):
    * total / matched / bad per group as one pass of conditional sums —
    * map-side partial aggregation, single shuffle on the group key. */
  def conditionalCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("total"),
        sum(when($"value" > 100.0, 1L).otherwise(0L)).as("matched"),
        sum(when($"value" <= 0.0 || $"value".isNull, 1L).otherwise(0L)).as("bad"))
      .orderBy($"event_type")
  }

  /** A2 distinct-collect (`reddit_subm_extraction.py:23–24`): the allowlist
    * normalization — lowercase + distinct. */
  def distinctTypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(lower($"event_type").as("event_type"))
      .distinct()
      .orderBy($"event_type")
  }

  /** A3 last-wins dedup (`tweet_download.py:34,50–52`: user id→username map,
    * later pages overwrite). Latest event per user, deterministic tie-break
    * on event_id. Window + row_number = one shuffle on user_id. */
  def lastWinsPerUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", Quant.r2($"value").as("value"))
      .orderBy($"user_id")
  }

  /** J2 key-association join (`tweet_download.py:41–57`, tweets↔users):
    * orders←customer as broadcast left join — the dimension side is small,
    * so at 100 TB the fact table never shuffles. */
  def ordersWithCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    Tables.orders(spark, dir)
      .join(broadcast(cust), $"o_custkey" === $"c_custkey", "left")
      .select($"o_orderkey", $"c_name", $"c_mktsegment",
        Quant.r2($"o_totalprice").as("o_totalprice"))
      .orderBy($"o_orderkey")
  }

  /** Anti-join coverage (NOT EXISTS): customers with no HIGH-VALUE order
    * (>350k), per segment. The filter is pushed below the anti-join so only
    * matching order keys ever reach the join; AQE picks the broadcast side
    * at runtime. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrderKeys = Tables.orders(spark, dir)
      .filter($"o_totalprice" > 350000.0)
      .select($"o_custkey")
    Tables.customer(spark, dir)
      .join(bigOrderKeys, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** TPC-H Q1-shaped pricing summary over lineitem, in deterministic
    * INTEGER 1e4-units: `floor(x·1e4 + 0.5)` quantizes each money/qty
    * double identically in both engines (a `CAST(double AS
    * DECIMAL(18,4))` does NOT — Spark rounds representable halves
    * HALF_UP, DuckDB half-even, and at 600k rows one boundary row
    * flipped the sf0.1 differential), sums are exact DECIMAL integers,
    * and each output is one correctly-rounded division. The disc-price
    * term is the exact integer product `price₄·(10⁴ − disc₄)` in 1e8
    * units. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def u4(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + lit(0.5)).cast("long")
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_linestatus",
        u4($"l_quantity").as("qty_u"),
        u4($"l_extendedprice").as("price_u"),
        u4($"l_discount").as("disc_u"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        (sum($"qty_u".cast("decimal(38,0)")).cast("double") / 1e4)
          .as("sum_qty"),
        (sum($"price_u".cast("decimal(38,0)")).cast("double") / 1e4)
          .as("sum_base_price"),
        (sum($"price_u".cast("decimal(38,0)") * (lit(10000L) - $"disc_u"))
          .cast("double") / 1e8).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Money doubles → exact 1e4-unit integers, the q14 quantization every
    * money aggregate shares: `floor(x·1e4 + 0.5)` is computed identically
    * in both engines (one binary multiply + floor), where `CAST(double AS
    * DECIMAL(18,4))` is NOT — Spark rounds the value's shortest decimal
    * rendering HALF_UP while DuckDB rounds the binary value half-even,
    * and any input whose rendering lands on a 4-dp half boundary flips
    * (the class the sf0.1 differential caught on q14; round 8 retired
    * every remaining decimal-cast money sum to this). */
  private[graft] def u4(c: org.apache.spark.sql.Column) =
    floor(c * 10000 + lit(0.5)).cast("long")

  /** TPC-H Q5-shaped multi-join revenue rollup: lineitem⋈orders (big-big,
    * sort-merge / shuffled-hash under AQE) then broadcast dims
    * customer⋈nation⋈region. Dimension joins never reshuffle the fact.
    * Revenue is the exact integer product `price₄·(10⁴ − disc₄)` in 1e8
    * units (q14's disc-price term), summed in DECIMAL(38,0). */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        (u4($"l_extendedprice") * (lit(10000L) - u4($"l_discount")))
          .cast("decimal(38,0)").as("rev"))
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name", $"n_regionkey")
    val reg = Tables.region(spark, dir).select($"r_regionkey", $"r_name")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg((sum($"rev").cast("double") / 1e8).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  /** Top-k per group via ranking window (the analytic extension SURVEY.md
    * §2.4 notes the reference lacks): top-3 orders per customer by price,
    * deterministic tie-break on o_orderkey. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"o_custkey", $"rk", $"o_orderkey",
        Quant.r2($"o_totalprice").as("o_totalprice"))
      .orderBy($"o_custkey", $"rk")
  }

  /** D1/D2/U1/P7 combined (`parser_media_articles.py:81–120`): two filtered
    * subsets unioned (`pd.concat`), null/empty dropped (`dropna`), exact
    * dedup on a derived key (`drop_duplicates("text1")` — here md5 of
    * normalized text), deterministic representative = min doc_id. */
  def unionDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val de = docs.filter($"lang" === "de")
    val es = docs.filter($"lang" === "es")
    de.unionByName(es)
      .filter($"text".isNotNull && length(trim($"text")) > 0)
      .withColumn("text_key", md5(lower(trim($"text"))))
      .groupBy($"text_key")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select($"doc_id", $"text_key", $"n_copies")
      .orderBy($"doc_id")
  }

  /** Dimension rollup completing table coverage: suppliers per nation with
    * decimal-exact balance totals — broadcast dim join + partial agg, the
    * same shape as q15 at any scale. */
  def suppliersByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    Tables.supplier(spark, dir)
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("n_suppliers"),
        (sum(u4($"s_acctbal").cast("decimal(38,0)")).cast("double") / 1e4)
          .as("total_acctbal"))
      .orderBy($"n_name")
  }

  /** §2.8 tumbling-window aggregation over the event stream, batch form:
    * identical groupBy(window(…)) works under Structured Streaming with a
    * watermark (see graft.streaming.StreamOps). */
  def hourlyEventCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        (sum(u4($"value").cast("decimal(38,0)")).cast("double") / 1e4)
          .as("sum_value"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        $"event_type", $"n_events", $"sum_value")
      .orderBy($"hour_start", $"event_type")
  }

  /** ROLLUP/grouping-sets reporting (the multi-grain aggregate surface a
    * reporting layer expects beyond plain groupBy): revenue by
    * (nation, order priority) with per-nation subtotals and a grand
    * total in ONE pass — Spark plans `Expand` + a single hash aggregate,
    * so the fact shuffles once for all three grains instead of once per
    * grain. `grouping()` flags distinguish a subtotal row from a real
    * 'ALL' value; sums are exact [[u4]] integer units (associative,
    * order-free) as everywhere else. Dim joins broadcast; the fact never
    * reshuffles. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    Tables.orders(spark, dir)
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .rollup($"n_name", $"o_orderpriority")
      .agg(
        // grouping() is only resolvable INSIDE the rollup's agg list
        grouping($"n_name").cast("long").as("g_nation"),
        grouping($"o_orderpriority").cast("long").as("g_priority"),
        count(lit(1)).as("n_orders"),
        (sum(u4($"o_totalprice").cast("decimal(38,0)")).cast("double") / 1e4)
          .as("revenue"))
      .select(
        coalesce($"n_name", lit("ALL")).as("nation"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"g_nation", $"g_priority", $"n_orders", $"revenue")
      .orderBy($"nation", $"priority")
  }

  /** Per-entity time-series window kit over the event stream: sequence
    * number, microsecond gap to the previous event, and a 3-row moving
    * average — lag/lead/sliding-frame analytics (session heuristics,
    * inter-arrival profiling, rate smoothing). All three functions share
    * ONE window spec, so the plan is a single shuffle on user_id + one
    * sort within partitions — adding window functions to the same spec
    * is free; a second spec would be a second sort. The input `value` is
    * pre-rounded so the sliding average aggregates identical doubles in
    * both engines. */
  def userActivityWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("v2", Quant.r2($"value"))
      .select($"event_id", $"user_id",
        row_number().over(w).cast("long").as("seq"),
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"),
        Quant.r4(avg($"v2").over(w.rowsBetween(-2, 0))).as("mavg3"))
      .orderBy($"event_id")
  }

  /** F5/F7/F8/F10/F11 scalar date kit (`parser_media_articles.py:14–15,25–38`):
    * dd.mm.yyyy formatting, regex group-reorder back to ISO, German month
    * name via map literal + zero-padded day — all built-in functions. */
  def dateFormatKit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val germanMonths = map(
      lit(1), lit("Januar"), lit(2), lit("Februar"), lit(3), lit("März"),
      lit(4), lit("April"), lit(5), lit("Mai"), lit(6), lit("Juni"),
      lit(7), lit("Juli"), lit(8), lit("August"), lit(9), lit("September"),
      lit(10), lit("Oktober"), lit(11), lit("November"), lit(12), lit("Dezember"))
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 100)
      .withColumn("dotted", date_format($"o_orderdate", "dd.MM.yyyy"))
      .select(
        $"o_orderkey",
        $"dotted",
        // reference's re.sub(r'(\d{2}).(\d{2}).(\d{4})', r'\3-\2-\1')
        regexp_replace($"dotted", "(\\d{2})\\.(\\d{2})\\.(\\d{4})", "$3-$2-$1").as("iso"),
        concat(
          lpad(dayofmonth($"o_orderdate").cast("string"), 2, "0"),
          lit(". "),
          element_at(germanMonths, month($"o_orderdate")),
          lit(" "),
          year($"o_orderdate").cast("string")).as("german"))
      .orderBy($"o_orderkey")
  }

  /** Pivoted language values for [[langMatrix]], shared with the q77
    * oracle (explicit value list = fixed output schema — the form that
    * scales, since an unlisted `pivot` first runs a distinct scan AND
    * makes the schema data-dependent). */
  val pivotLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** PIVOT reporting: the long→wide reshape every reporting layer wants —
    * documents counted per (source × language) as a matrix with one
    * column per language. Spark plans pivot as ONE partial-aggregated
    * groupBy(source) with a `count(CASE WHEN lang=v)` per pivot value —
    * a single fact shuffle of O(sources × langs) cells, the same
    * one-pass shape as q62's ROLLUP (never a union of per-language
    * scans). Missing cells are 0, not null, so the matrix is dense. */
  def langMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"source")
      .pivot("lang", pivotLangs)
      .agg(count(lit(1)))
      .na.fill(0L, pivotLangs)
      .orderBy($"source")
  }

  /** Hourly gap-fill + forward fill — the time-series regularization every
    * monitoring/feature pipeline runs before charting or model input:
    * counts per (event_type, hour) on a DENSE hour spine (missing hours
    * materialize as 0-count rows via `sequence`+`explode` against the
    * broadcast min/max bounds), and the hour's running total carries the
    * last known value forward (`last(..., ignoreNulls)` window).
    *
    * Engine-exact float discipline: hourly sums go through [[u4]]
    * integer 1e4-units (the q14 trick) so addition order cannot move an
    * ulp and no decimal-cast half boundary exists; the fill then copies
    * already-exact values. Scale shape: one
    * partial-agg shuffle on (type, hour); the spine is
    * O(types × hours) — tiny next to events — and the fill window
    * partitions per type over bounded hour counts (for per-entity fills
    * at scale, bucket the window like q73's prefix sum). */
  def hourlyGapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select($"event_type", expr("unix_micros(ts) div 3600000000").as("h"),
        u4($"value").cast("decimal(38,0)").as("v"))
    val agg = ev.groupBy($"event_type", $"h")
      .agg(count(lit(1)).as("n_events"),
        (sum($"v").cast("double") / 1e4).as("sv"))
    val bounds = ev.agg(min($"h").as("h0"), max($"h").as("h1"))
    val spine = ev.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(sequence($"h0", $"h1")).as("h"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq("event_type", "h"), "left")
      .select($"event_type", $"h",
        coalesce($"n_events", lit(0L)).as("n_events"),
        Quant.r2(coalesce(last($"sv", ignoreNulls = true).over(w), lit(0.0)))
          .as("filled_sum"))
      .orderBy($"event_type", $"h")
  }

  /** UNPIVOT — the wide→long inverse of [[langMatrix]], via `stack`
    * (one pass, rows fan out n-langs-per-input-row, zero shuffle beyond
    * the upstream pivot). Dropping the dense zeros makes the roundtrip
    * LAW hold: unpivot(pivot(T)) = groupBy(T) — which is exactly what
    * the oracle states, so the hash check proves both reshapes compose
    * losslessly. */
  def langMatrixLong(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stackArgs = pivotLangs.map(l => s"'$l', $l").mkString(", ")
    langMatrix(spark, dir)
      .select($"source",
        expr(s"stack(${pivotLangs.size}, $stackArgs) AS (lang, n_docs)"))
      .filter($"n_docs" > 0)
      .orderBy($"source", $"lang")
  }

  /** SCD2 (slowly-changing-dimension type 2) history build: a keyed
    * changelog becomes interval rows — `valid_from`/`valid_to` half-open
    * ranges, `is_current` on the open row, a per-key `version` counter.
    * The warehouse pattern behind every dimension table a reporting join
    * (q12/q15-style) targets; complements q95's MERGE (which keeps only
    * the LATEST state — SCD2 keeps the lineage).
    *
    * One window pass does everything: `lead(valid_from)` closes each
    * interval, `row_number` versions it, and both ride the SAME
    * (key, seq) window spec — one shuffle on doc_id, one sort, a single
    * Window operator. At 100 TB the changelog is partitioned by key
    * anyway (CDC topics are), so the exchange is the minimum possible.
    *
    * The changelog is derived deterministically from `documents`
    * (every doc has a v0 row; doc_id % 7 = 0 revises at seq 1;
    * doc_id % 21 = 0 again at seq 2 — in production it ARRIVES as CDC,
    * same contract as [[CorpusOps.snapshotMerge]]). */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.fingerprint
    val docs = Tables.documents(spark, dir)
    def rev(seq: Int, suffix: Option[String], pred: org.apache.spark.sql.Column) =
      docs.filter(pred).select(
        $"doc_id", lit(seq).as("seq"),
        fingerprint(suffix.fold[org.apache.spark.sql.Column]($"text")(s =>
          concat($"text", lit(s)))).as("fp"))
    val chg = rev(0, None, lit(true))
      .unionByName(rev(1, Some(" rev1"), $"doc_id" % 7 === 0))
      .unionByName(rev(2, Some(" rev2"), $"doc_id" % 21 === 0))
      .select($"doc_id", $"seq", $"fp",
        date_add(lit("2024-01-01").cast("date"),
          ($"seq" * 30 + $"doc_id" % 7).cast("int")).as("valid_from"))
    val w = Window.partitionBy($"doc_id").orderBy($"seq")
    chg.select($"doc_id", $"fp", $"valid_from",
        lead($"valid_from", 1).over(w).as("valid_to"),
        lead($"valid_from", 1).over(w).isNull.as("is_current"),
        row_number().over(w).cast("long").as("version"))
      .orderBy($"doc_id", $"version")
  }

  /** Point-in-time (PIT) lookup against the [[scd2History]] dimension —
    * the feature-store join that prevents training-serving skew: each
    * probe (entity, as-of date) must see the dimension version that was
    * CURRENT at that date, never a later revision (future leakage) and
    * never an expired one. Probes here are every document at three fixed
    * month-boundary dates, so revised docs demonstrably resolve to
    * different versions at different probe dates.
    *
    * Scale shape: an SCD2 key has a HANDFUL of versions, so the right
    * join is the plain equi-join on the key with the validity-range test
    * as a residual filter — one keyed shuffle, ≤versions candidates per
    * probe, no interval bucketing needed (that machinery — q75 — is for
    * UNKEYED range joins where nothing equi-partitions). The window that
    * built the history is not re-run per probe; the history relation is
    * cache-barriered and joined as data. */
  def pointInTimeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = graft.CacheGuard.barrier(scd2History(spark, dir))
    val probeDates = Seq("2024-01-15", "2024-02-15", "2024-03-15")
    val probes = Tables.documents(spark, dir)
      .select($"doc_id")
      .crossJoin(probeDates.toDF("pd").select($"pd".cast("date").as("probe_date")))
    probes.join(hist, Seq("doc_id"))
      .filter($"valid_from" <= $"probe_date" &&
        ($"valid_to".isNull || $"probe_date" < $"valid_to"))
      .select($"doc_id", $"probe_date", $"version", $"fp", $"is_current")
      .orderBy($"doc_id", $"probe_date")
  }

  /** GDPR/right-to-be-forgotten delete cascade, audited — the compliance
    * job a data platform runs on a deletion list: remove the users, their
    * orders, those orders' line items, and their events, and report per
    * relation how many rows the cascade touched. The deletion list is
    * tiny (it arrives as a request batch) and BROADCASTS into semi/anti
    * joins; the only non-broadcast hop is lineitem←orders, which is a
    * keyed semi-join on the order key at scale. Counts audit the cascade
    * rather than materializing the cleaned tables (the writes would be
    * `.write` of the anti-join sides — same plans). */
  /** PSEUDONYMIZATION audit — the privacy transform q125's delete
    * cascade complements: every customer key is remapped to a
    * deterministic keyed pseudonym (`md5('u:' ‖ id)` — a pure function,
    * so referential integrity is preserved BY CONSTRUCTION), and the
    * audit PROVES it relationally: per referencing relation, distinct
    * ids before vs distinct pseudonyms after (equal ⟺ no collision) and
    * orphaned references before vs after (equal ⟺ joinability
    * preserved). This is the "analytics-safe export" transform — the
    * downstream join graph works unchanged while raw ids never leave.
    *
    * Scale shape: remapping is per-row hash work inside each scan; the
    * orphan audits are key-distinct semi/anti joins (the exact joins the
    * exported data will run — auditing them IS the product guarantee).
    * Counts audit the transform rather than materializing the exports
    * (the writes would be `.write` of the remapped sides — same plans). */
  def pseudonymizeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def pid(c: org.apache.spark.sql.Column) =
      md5(concat(lit("u:"), c.cast("string")))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".as("id"), pid($"c_custkey").as("p"))
    def audit(name: String, refs: DataFrame): DataFrame = {
      val r = refs.select($"rid", pid($"rid").as("rp"))
      val ids = cust.select($"id").distinct()
      val pids = cust.select($"p").distinct()
      r.agg(count(lit(1)).as("n_rows"),
          countDistinct($"rid").as("n_ids"),
          countDistinct($"rp").as("n_pids"))
        .crossJoin(r.select($"rid").distinct()
          .join(ids, $"rid" === $"id", "left_anti")
          .agg(count(lit(1)).as("n_orphans_before")))
        .crossJoin(r.select($"rp").distinct()
          .join(pids, $"rp" === $"p", "left_anti")
          .agg(count(lit(1)).as("n_orphans_after")))
        .select(lit(name).as("relation"), $"n_rows", $"n_ids", $"n_pids",
          $"n_orphans_before", $"n_orphans_after",
          ($"n_ids" === $"n_pids" &&
            $"n_orphans_before" === $"n_orphans_after").as("intact"))
    }
    audit("orders", Tables.orders(spark, dir).select($"o_custkey".as("rid")))
      .unionByName(audit("events",
        Tables.events(spark, dir).select($"user_id".as("rid"))))
      .orderBy($"relation")
  }

  def forgetUsers(spark: SparkSession, dir: String, mod: Int = 97): DataFrame = {
    import spark.implicits._
    val del = Tables.customer(spark, dir)
      .filter($"c_custkey" % mod === 0).select($"c_custkey".as("k"))
    def audit(name: String, df: DataFrame, keyCol: String,
              keys: DataFrame): DataFrame = {
      val total = df.agg(count(lit(1)).as("n_before"))
      val deleted = df.join(broadcast(keys), df(keyCol) === keys("k"),
          "left_semi")
        .agg(count(lit(1)).as("n_deleted"))
      total.crossJoin(deleted)
        .select(lit(name).as("table_name"), $"n_before", $"n_deleted",
          ($"n_before" - $"n_deleted").as("n_after"))
    }
    val delOrders = Tables.orders(spark, dir)
      .join(broadcast(del), $"o_custkey" === $"k", "left_semi")
      .select($"o_orderkey".as("k"))
    audit("customer", Tables.customer(spark, dir), "c_custkey", del)
      .unionByName(audit("orders", Tables.orders(spark, dir), "o_custkey", del))
      .unionByName(audit("lineitem", Tables.lineitem(spark, dir), "l_orderkey",
        delOrders))
      .unionByName(audit("events", Tables.events(spark, dir), "user_id", del))
      .orderBy($"table_name")
  }

  /** Ordered funnel (view → click → purchase, strictly later each step)
    * over the event stream — the product-analytics query every event
    * pipeline serves. A step counts only if it happens AFTER the previous
    * step completed for that user: a click before the first view is not
    * a funnel click.
    *
    * The whole funnel is THREE STACKED CUMULATIVE MINS over ONE window
    * spec — (user_id, ts, event_id) rows-unbounded-preceding:
    *   v1 = min ts of views so far; c1 = min ts of clicks with ts > v1;
    *   p1 = min ts of purchases with ts > c1
    * so the plan is one exchange on user_id + one sort + a Window chain,
    * then a per-user flag aggregate. No self-joins (the naive
    * events×events×events funnel join explodes at 100 TB); state per row
    * is three timestamps. `event_id` tiebreaks equal timestamps so the
    * cumulative prefix is a total order — identical in both engines. */
  def funnelReport(spark: SparkSession, dir: String): DataFrame =
    funnelOver(Tables.events(spark, dir))

  /** The funnel core over any (user_id, ts, event_id, event_type) relation. */
  def funnelOver(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flags = events
      .select($"user_id", $"ts", $"event_id", $"event_type".as("et"))
      .withColumn("v1", min(when($"et" === "view", $"ts")).over(w))
      .withColumn("c1", min(when($"et" === "click" && $"ts" > $"v1", $"ts")).over(w))
      .withColumn("p1", min(when($"et" === "purchase" && $"ts" > $"c1", $"ts")).over(w))
      .groupBy($"user_id")
      .agg(
        max(when($"et" === "view", 1).otherwise(0)).as("f_view"),
        max($"c1".isNotNull.cast("int")).as("f_click"),
        max($"p1".isNotNull.cast("int")).as("f_purchase"))
    flags.agg(
        count(lit(1)).as("n_users"),
        sum($"f_view").as("n_view"),
        sum($"f_click").as("n_view_click"),
        sum($"f_purchase").as("n_full_funnel"))
      .select($"n_users", $"n_view", $"n_view_click", $"n_full_funnel",
        when($"n_view" === 0, lit(0.0))
          .otherwise(Quant.r4($"n_full_funnel".cast("double") /
            $"n_view".cast("double")))
          .as("view_to_purchase"))
  }

  /** Pivot → unpivot round trip over the (source × lang) document-count
    * matrix — the wide-report reshape every BI export needs, declared as
    * a cycle so the oracle hash match proves it LOSSLESS (absent cells
    * 0-filled, melt reproduces every cell, row totals preserved).
    *
    * Two deliberate scale choices: the pivot passes EXPLICIT values
    * (Spark's value-discovery overload runs a separate distinct job over
    * the corpus first — the declared language router domain is closed,
    * so that job is pure waste), making the whole pivot ONE aggregation
    * with map-side partials whose exchange is O(sources × langs); and
    * the melt is `stack` — a per-row generator over the O(sources) wide
    * relation, never a shuffle. */
  def pivotRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val langs = Seq("de", "en", "es", "fr", "zh")
    val wide = Tables.documents(spark, dir)
      .groupBy($"source").pivot("lang", langs).agg(count(lit(1)))
      .na.fill(0L, langs)
    val rowTotal = langs.map(col).reduce(_ + _)
    wide.select($"source", rowTotal.as("row_total"),
        expr("stack(5, 'de', de, 'en', en, 'es', es, 'fr', fr, 'zh', zh) " +
          "AS (lang, n)"))
      .select($"source", $"lang", $"n", $"row_total")
      .orderBy($"source", $"lang")
  }

  /** Multi-level revenue report via ROLLUP (region → nation → grand
    * total in one pass) — the grouping-sets operator the per-level
    * UNION-of-GROUP-BYs rewrite would otherwise scan the fact table
    * three times for. Spark plans rollup as one Expand (×3 rows map-side)
    * feeding a single partial-then-final aggregate, so the fact is read
    * ONCE and the exchange carries O(levels × groups) partials — at
    * 100 TB the Expand multiplication happens before the combine, never
    * across the wire. `lvl` is `grouping_id()` (bit 2 = region
    * aggregated, bit 1 = nation aggregated), revenue is the exact
    * integer 1e4-unit sum (u4 — the retired-decimal-cast discipline),
    * and NULL group labels are coalesced to '(all)' so the hash compare
    * never rides NULL-ordering differences. Dimensions broadcast onto
    * customer; orders⋈customer is the one keyed shuffle. */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"n_name", $"r_name")
    Tables.orders(spark, dir)
      .select($"o_custkey", u4($"o_totalprice").as("pu"))
      .join(cust, $"o_custkey" === $"c_custkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"), sum($"pu").as("revenue_u"),
        grouping_id().as("lvl"))
      .select(coalesce($"r_name", lit("(all)")).as("r_name"),
        coalesce($"n_name", lit("(all)")).as("n_name"),
        $"lvl", $"n_orders", $"revenue_u")
      .orderBy($"lvl", $"r_name", $"n_name")
  }

  /** Subject selector for [[subjectAccessReport]], shared with the q274
    * oracle: a deterministic 1/13 sample of the customer key space
    * standing in for the request list a DSAR batch actually ships. */
  val subjectStride = 13L

  /** SUBJECT ACCESS REPORT (q274) — the GDPR/CCPA right-of-access
    * export manifest, completing the compliance kit (q125 erases, q162
    * pseudonymizes, q210 audits re-identification; this one DISCLOSES):
    * one row per requesting subject with everything the estate holds —
    * profile fields, event count / value / id span, order count and
    * lifetime spend — plus an id checksum so the exported detail files
    * can be verified against the manifest. Money and event values are
    * exact integer 1e-4 units (per-row u4 then BIGINT sums — never a
    * float total).
    *
    * Scale shape: each fact table pre-aggregates TO THE SUBJECT KEY
    * behind the subject filter (map-side partials; the modulo filter
    * stands in for the broadcast semi-join a real request list would
    * drive), then two key-aligned joins against the O(subjects)
    * customer slice — the fact tables are never joined to each other.
    * Missing activity surfaces as zero counts with −1 id bounds, not
    * dropped rows: an access request must answer even when the answer
    * is "nothing held". */
  def subjectAccessReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val subjects = Tables.customer(spark, dir)
      .filter($"c_custkey" % subjectStride === 0)
      .select($"c_custkey".as("subject_id"), $"c_name".as("name"),
        $"c_mktsegment".as("segment"))
    val ev = Tables.events(spark, dir)
      .filter($"user_id" % subjectStride === 0)
      .groupBy($"user_id".as("subject_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(u4($"value")).as("events_value_u4"),
        min($"event_id").as("first_event_id"),
        max($"event_id").as("last_event_id"),
        sum($"event_id").as("event_id_checksum"))
    val ord = Tables.orders(spark, dir)
      .filter($"o_custkey" % subjectStride === 0)
      .groupBy($"o_custkey".as("subject_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(u4($"o_totalprice")).as("spend_u4"))
    subjects
      .join(ev, Seq("subject_id"), "left")
      .join(ord, Seq("subject_id"), "left")
      .select($"subject_id", $"name", $"segment",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"events_value_u4", lit(0L)).as("events_value_u4"),
        coalesce($"first_event_id", lit(-1L)).as("first_event_id"),
        coalesce($"last_event_id", lit(-1L)).as("last_event_id"),
        coalesce($"event_id_checksum", lit(0L)).as("event_id_checksum"),
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"spend_u4", lit(0L)).as("spend_u4"))
      .orderBy($"subject_id")
  }

}
