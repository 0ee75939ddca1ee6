package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-LAYOUT operators: the write-side clustering keys that make the
  * read side's file-skipping work. A 100 TB table is only as fast as the
  * fraction of it a scan can SKIP; sorting by one column serves one
  * predicate dimension, while a Z-order (Morton) key interleaves the bits
  * of two dimensions so a range of z-values covers a bounded RECTANGLE in
  * (x, y) — files clustered by zkey prune well under predicates on EITHER
  * dimension (the Delta/Iceberg `ZORDER BY` idea, re-expressed as a plain
  * codegen'd column).
  */
object Layout {

  /** Morton-interleave the low `bits` bits of x (even positions) and y
    * (odd positions). Pure shift/mask arithmetic — whole-stage-codegen'd,
    * zero shuffle, and byte-identical in any engine with integer bit ops
    * (the oracle replays it term by term). */
  def zValue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The matching DuckDB expression, one source of truth per bit. */
  def zValueSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Declared query: Z-order locality audit over events on the two
    * query dimensions (user bucket, day-of-year bucket). Each z-BLOCK
    * (zkey >> 6 — the "file" a range-partitioned write would cut) reports
    * its row count and its bounding rectangle in (x, y); `span` is the
    * rectangle area, the file-skipping currency: a predicate on either
    * dimension touches only blocks whose interval covers it, and small
    * spans mean most blocks don't.
    *
    * Scale shape: zkey is per-row arithmetic inside the scan's codegen
    * stage; the audit is ONE hash aggregate on zblock. The write path at
    * scale is `repartitionByRange(zkey)` + sortWithinPartitions before
    * the parquet write — range boundaries come from sampling, which is
    * nondeterministic, so the AUDIT buckets by fixed zkey prefix instead
    * (same geometry, exactly replayable). */
  def zorderAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.events(spark, dir)
      .select(($"user_id" % 256).as("x"),
        (dayofyear($"ts") % 256).cast("long").as("y"))
      .withColumn("zkey", zValue($"x", $"y"))
    keyed
      .groupBy(shiftright($"zkey", 6).as("zblock"))
      .agg(count(lit(1)).as("n_rows"),
        min($"x").as("x_min"), max($"x").as("x_max"),
        min($"y").as("y_min"), max($"y").as("y_max"))
      .select($"zblock", $"n_rows", $"x_min", $"x_max", $"y_min", $"y_max",
        (($"x_max" - $"x_min" + 1) * ($"y_max" - $"y_min" + 1)).as("span"))
      .orderBy($"zblock")
  }

  /** Z-order pruning EFFECTIVENESS — q216's zone-map audit pointed at
    * the q102 question: single-dimension clustering serves one predicate
    * dimension and starves the other, Z-order serves BOTH. Three
    * physical layouts of the same (user-bucket x, hour-of-day y) event
    * relation, blocks as a range-partitioned write would cut them
    * (hour, not day-of-year: the synthetic stream spans 30 days, so a
    * day predicate would be vacuously true everywhere — measured):
    *   - `user_block`: rows clustered by x (block = x div 8),
    *   - `hour_block`: rows clustered by y (block = y div 3),
    *   - `zorder`: block = zkey >> 6 (q102's fixed-prefix geometry).
    * For predicates x < 32 and y < 8, per (layout, predicate): blocks
    * provably skippable from min/max stats, skip bp, rows skipped. The
    * expected read IS the artifact: each 1-D layout prunes ~only its
    * own dimension; Z-order prunes meaningfully on both — the number
    * that justifies paying the Z-order write.
    *
    * Scale shape: one stat aggregation per layout over one scan each
    * (min/max partials), CASE sweep + stack unpivot on the O(blocks)
    * aggregate — q216's exact shape with the zkey arithmetic riding
    * the scan's codegen stage. */
  def zorderPruning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = graft.CacheGuard.barrier(
      Tables.events(spark, dir)
        .select(($"user_id" % 256).as("x"),
          hour($"ts").cast("long").as("y"))
        .withColumn("zkey", zValue($"x", $"y")))
    def stats(blk: Column, layout: String): DataFrame =
      keyed.groupBy(blk.as("blk"))
        .agg(min($"x").as("min_x"), max($"x").as("max_x"),
          min($"y").as("min_y"), max($"y").as("max_y"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit(layout))
    val st = stats(expr("x div 8"), "user_block")
      .unionByName(stats(expr("y div 3"), "hour_block"))
      .unionByName(stats(shiftright($"zkey", 6), "zorder"))
    val preds = Seq(
      ("x_lt_32", $"min_x" >= 32L),
      ("y_lt_8", $"min_y" >= 8L))
    val agg = st.groupBy($"layout").agg(
      count(lit(1)).as("n_blocks"),
      preds.flatMap { case (name, prunable) => Seq(
        sum(when(prunable, 1L).otherwise(0L)).as(s"sk_$name"),
        sum(when(prunable, $"n_rows").otherwise(0L)).as(s"rw_$name"))
      }: _*)
    val stackSql = preds.map { case (name, _) =>
      s"'$name', sk_$name, rw_$name" }.mkString(", ")
    agg.selectExpr("layout", "n_blocks",
        s"stack(${preds.size}, $stackSql) AS (predicate, n_skipped, rows_skipped)")
      .select($"layout", $"predicate", $"n_blocks", $"n_skipped",
        expr("n_skipped * 10000 div n_blocks").as("skip_bp"),
        $"rows_skipped")
      .orderBy($"layout", $"predicate")
  }

  /** Compaction target size (bytes of text per output file), shared with
    * the q132 oracle and spec. Small against the synthetic corpus so
    * multi-file bins actually occur. */
  val compactionTarget = 40000L

  /** Small-file COMPACTION planner — the `OPTIMIZE`/bin-packing pass
    * every long-lived lakehouse table needs: given the current file
    * inventory (here one "file" per (source, lang) leaf — the layout
    * q129 writes), assign files to target-size output bins by walking
    * each source's files in deterministic (lang) order and cutting a new
    * bin whenever the running byte total crosses the target. bin =
    * floor(cum_bytes_before / target) — the prefix-sum formulation of
    * greedy first-fit, which makes the plan a WINDOW expression instead
    * of a driver loop.
    *
    * Scale shape: the inventory aggregate is partial-first (O(leaves)
    * exchange); the prefix sum windows PER SOURCE — partitioned, never
    * the q84-style global-window collapse, because compaction never
    * crosses a partition directory. A real run feeds this plan to
    * per-bin coalesce writes; the PLAN is the deterministic, testable
    * part. */
  def compactionPlan(spark: SparkSession, dir: String,
                     target: Long = compactionTarget): DataFrame = {
    import spark.implicits._
    val files = Tables.documents(spark, dir)
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("bytes"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"lang")
      .rowsBetween(Long.MinValue, -1)
    files
      .withColumn("cum_before", coalesce(sum($"bytes").over(wCum), lit(0L)))
      .select($"source", $"lang", $"n_docs", $"bytes",
        floor($"cum_before".cast("double") / target.toDouble).cast("long")
          .as("bin"))
      .orderBy($"source", $"lang")
  }

  /** Vacuum-plan version mods (amend-at-v1 / delete-at-v1 / amend-at-v2)
    * and the per-version file bucket count, shared with the q139 oracle
    * and spec. */
  val vacAmend1Mod = 7
  val vacDeleteMod = 11
  val vacAmend2Mod = 13
  val vacBuckets = 16

  /** Snapshot VACUUM planner — the `expire_snapshots` / orphan-file GC
    * pass of a versioned table (Iceberg/Delta retention): three table
    * versions write row versions into (version, bucket) data files —
    * v0 the base load, v1 amends doc_id%7 and deletes doc_id%11, v2
    * amends doc_id%13 of the survivors. Retention keeps snapshots v1
    * and v2; a file is RECLAIMABLE iff no retained snapshot references
    * any row version in it (a snapshot references, per live row, the
    * file holding its newest version ≤ that snapshot).
    *
    * The whole plan derives from per-row CASE arithmetic: each row emits
    * its written (version, bucket) files in one pass (array + explode,
    * bounded fan-out ≤ 3), the retained-reference set emits the same way
    * from the snapshot-visibility rules, and reclaimable = written
    * LEFT ANTI referenced. Inventory aggregates are partial-first
    * O(versions × buckets); the reference set is distinct-collapsed
    * map-side and BROADCAST to the anti-join — the table itself shuffles
    * nothing. Output: every file with row/byte mass and its verdict (the
    * reclaim report a retention job logs before deleting). */
  def vacuumPlan(spark: SparkSession, dir: String): DataFrame =
    vacuumPlanOf(Tables.documents(spark, dir))

  /** Core of [[vacuumPlan]] over any `(doc_id, n_chars)` relation — split
    * out so specs can drive it with a CONSTRUCTED corpus (on the synthetic
    * sf tables the keep-v1+v2 retention never orphans a file: a v0 file
    * reclaims only when every live row in its bucket was amended at v1,
    * which id%7 on a uniform id range cannot produce; a corpus of ids
    * ≡ 0 (mod lcm(7, 16)) does, deterministically). */
  def vacuumPlanOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(
      $"doc_id", $"n_chars",
      ($"doc_id" % vacBuckets).as("bucket"),
      ($"doc_id" % vacAmend1Mod === 0).as("am1"),
      ($"doc_id" % vacDeleteMod === 0).as("del1"),
      ($"doc_id" % vacAmend2Mod === 0).as("am2"))
    // files this row wrote a version into: base always; v1/v2 on amend
    // (a v1 delete writes no data file; a v2 amend only if still live)
    val written = d.select($"n_chars", explode(concat(
        array(struct(lit(0L).as("version"), $"bucket")),
        when($"am1", array(struct(lit(1L).as("version"), $"bucket")))
          .otherwise(array().cast("array<struct<version:bigint,bucket:bigint>>")),
        when($"am2" && !$"del1",
          array(struct(lit(2L).as("version"), $"bucket")))
          .otherwise(array().cast("array<struct<version:bigint,bucket:bigint>>"))))
        .as("f"))
      .groupBy($"f.version".as("version"), $"f.bucket".as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum($"n_chars").as("bytes"))
    // retained snapshots v1, v2: the file of each live row's newest
    // version visible at that snapshot
    val refs = d.filter(!$"del1")
      .select(array_distinct(array(
          struct(when($"am1", 1L).otherwise(0L).as("version"), $"bucket"),
          struct(when($"am2", 2L).when($"am1", 1L).otherwise(0L).as("version"),
            $"bucket")))
        .as("fs"))
      .select(explode($"fs").as("f"))
      .select($"f.version".as("version"), $"f.bucket".as("bucket"))
      .distinct()
    written.join(broadcast(refs.withColumn("referenced", lit(true))),
        Seq("version", "bucket"), "left")
      .select($"version", $"bucket", $"n_rows", $"bytes",
        coalesce($"referenced", lit(false)).as("referenced"),
        when(coalesce($"referenced", lit(false)), 0L).otherwise($"bytes")
          .as("reclaim_bytes"))
      .orderBy($"version", $"bucket")
  }

  val exportShards = 16

  /** Export-shard assignment shared by the declared manifest query and
    * the writer: fingerprint-hash mod [[exportShards]] — engine-portable
    * (md5-derived, not Spark's Murmur3) and stable under re-runs, so an
    * incremental exporter re-deriving the layout routes every doc to the
    * same shard file. Empty docs are excluded (an export row must carry
    * payload). */
  def exportAssign(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions._
    docs.filter(coalesce($"text", lit("")) =!= "")
      .select($"doc_id", $"text", $"lang", $"source",
        length($"text").cast("long").as("n_chars"),
        md5Hash32(fingerprint($"text")).as("fp32"))
      .withColumn("shard", $"fp32" % exportShards)
  }

  /** Sharded-export manifest — the integrity artifact a training-data
    * drop ships next to its JSONL shards (WebDataset/`datasets` style):
    * per shard, the row count, byte-proxy char mass, id range, and an
    * order-independent content checksum (`bit_xor` of the 32-bit
    * fingerprint hashes — XOR never overflows and commutes, so the fold
    * is partition-order-proof in a way a sum at corpus scale is not).
    * Consumers re-derive the manifest from the files they received and
    * diff — a truncated, duplicated or bit-rotted shard surfaces as a
    * count or checksum mismatch (the `ExportManifestSpec` round-trip).
    *
    * Scale shape: one corpus scan computing (shard, fp32) per row, then
    * ONE hash aggregation to O(shards) rows — map-side partials carry
    * (count, sum, xor, min, max) per shard per partition. The writer
    * side (spec) is `partitionBy(shard)` JSONL: shard count bounds
    * output files, not input partitions. */
  def exportManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    exportAssign(Tables.documents(spark, dir))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("n_chars"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"),
        expr("bit_xor(fp32)").as("checksum32"))
      .orderBy($"shard")
  }

  /** Ring geometry shared with the q203 oracle. */
  val ringWorkers = 8
  val ringVnodes = 16

  /** Consistent-hash rebalance churn audit — the capacity-planning
    * artifact for growing q186's shard fleet: when worker W+1 joins,
    * how many keys MOVE under (a) a consistent-hash ring with virtual
    * nodes (Karger et al. 1997: only keys whose ring successor becomes
    * one of the new worker's vnodes move, ≈ 1/(W+1) of the corpus) vs
    * (b) naive `hash mod W` (≈ W/(W+1) moves — nearly everything,
    * which is why mod-sharded caches stampede on resize). Both
    * assignments are md5-integer arithmetic, so the measured churn and
    * post-resize load spread are engine-exact.
    *
    * Scale shape: the ring is O(workers × vnodes) points, collapsed to
    * ONE sorted-array row and broadcast — per-key assignment is an
    * array successor probe riding the scan (the codebook-broadcast
    * shape, q35's class), worker lookup a ≤144-row broadcast join; the
    * rollup is one O(strategies) aggregation. No corpus self-join, no
    * window. */
  def ringChurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.md5Hash32
    val (wOld, wNew, v) = (ringWorkers, ringWorkers + 1, ringVnodes)
    def ring(w: Int): DataFrame = spark.range(w.toLong * v)
      .select(expr(s"id div $v").as("worker"), ($"id" % v).as("vn"))
      .select($"worker", md5Hash32(concat(lit("w:"), $"worker",
        lit(":"), $"vn")).as("pt"))
    def assign(keys: DataFrame, r: DataFrame, out: String): DataFrame = {
      val pts = r.agg(sort_array(collect_list($"pt")).as("pts"))
      keys.crossJoin(broadcast(pts))
        .select($"doc_id", $"h",
          coalesce(array_min(filter($"pts", p => p >= $"h")),
            element_at($"pts", 1)).as("succ"))
        .join(broadcast(r), $"succ" === r("pt"))
        .select($"doc_id", $"h", $"worker".as(out))
    }
    val keys = graft.CacheGuard.barrier(Tables.documents(spark, dir)
      .select($"doc_id", md5Hash32($"doc_id".cast("string")).as("h")))
    val ringMoves = assign(keys, ring(wOld), "w_before")
      .join(assign(keys, ring(wNew), "w_after").drop("h"), "doc_id")
    val modMoves = keys.select($"doc_id", $"h",
      ($"h" % wOld).as("w_before"), ($"h" % wNew).as("w_after"))
    def summarize(df: DataFrame, strategy: String): DataFrame = {
      val loads = df.groupBy($"w_after").agg(count(lit(1)).as("load"))
        .agg(max($"load").as("max_load"), min($"load").as("min_load"))
      df.agg(count(lit(1)).as("n_keys"),
          sum(when($"w_before" =!= $"w_after", 1L).otherwise(0L))
            .as("n_moved"))
        .crossJoin(loads)
        .select(lit(strategy).as("strategy"), $"n_keys", $"n_moved",
          expr("n_moved * 10000 div n_keys").as("moved_bp"),
          $"max_load", $"min_load")
    }
    summarize(ringMoves, "ring").unionByName(summarize(modMoves, "mod"))
      .orderBy($"strategy")
  }

  /** Zone-map (min/max block statistics) pruning audit — MEASURES what
    * q102's Z-order and q129's partitioned scan assert: how much of the
    * table a given predicate can skip under a given physical layout.
    * Parquet/ORC/Delta/Iceberg all keep per-file min/max stats; a block
    * is prunable for a predicate iff its stat range proves no row can
    * match. Two layouts are audited side by side on orders:
    *   - `key_block`: files clustered by arrival order (o_orderkey div
    *     1000) — the default unclustered write,
    *   - `month`: files partitioned by order month — the date-clustered
    *     write.
    * For each (layout, predicate): block count, provably-skippable
    * blocks, skip rate in bp, and rows skipped. The artifact is the
    * layout decision itself: date predicates skip ~nothing under
    * key_block and nearly everything out-of-range under month, while
    * price predicates skip nothing under either — the "stats exist but
    * data isn't clustered" reality that motivates Z-ordering.
    *
    * Exactness: price bounds compare in integer cents (the u-unit money
    * discipline); date bounds compare as DATEs. Scale shape: one scan
    * per layout collapsing to O(blocks) stat rows with map-side
    * min/max partials; the predicate sweep is a per-stat-row CASE over
    * the fixed predicate set — the fact table is never rescanned. */
  def zoneMapAudit(spark: SparkSession, dir: String,
                   blockSize: Int = 1000): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, dir).select(
      $"o_orderkey", to_date($"o_orderdate").as("d"),
      floor($"o_totalprice" * 100 + lit(0.5)).cast("long").as("cents"))
    def stats(keyed: DataFrame, layout: String): DataFrame =
      keyed.groupBy($"blk")
        .agg(min($"d").as("min_d"), max($"d").as("max_d"),
          min($"cents").as("min_c"), max($"cents").as("max_c"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit(layout))
    val st = stats(base.withColumn("blk",
        concat(lit("k"), expr(s"o_orderkey div $blockSize"))), "key_block")
      .unionByName(stats(base.withColumn("blk",
        date_format($"d", "yyyy-MM")), "month"))
    val preds = Seq(
      ("date_ge_2000", ($"max_d" < lit("2000-01-01").cast("date"))),
      ("date_lt_1996", ($"min_d" >= lit("1996-01-01").cast("date"))),
      ("price_gt_400k", ($"max_c" <= lit(40000000L))),
      ("price_le_5k", ($"min_c" > lit(500000L))))
    // ONE aggregation over the stat rows (a per-predicate groupBy would
    // rescan the fact table once per predicate), then a stack unpivot of
    // the O(layouts)-row result into (layout, predicate) rows
    val agg = st.groupBy($"layout").agg(
      count(lit(1)).as("n_blocks"),
      preds.flatMap { case (name, prunable) => Seq(
        sum(when(prunable, 1L).otherwise(0L)).as(s"sk_$name"),
        sum(when(prunable, $"n_rows").otherwise(0L)).as(s"rw_$name"))
      }: _*)
    val stackSql = preds.map { case (name, _) =>
      s"'$name', sk_$name, rw_$name" }.mkString(", ")
    agg.selectExpr("layout", "n_blocks",
        s"stack(${preds.size}, $stackSql) AS (predicate, n_skipped, rows_skipped)")
      .select($"layout", $"predicate", $"n_blocks", $"n_skipped",
        expr("n_skipped * 10000 div n_blocks").as("skip_bp"),
        $"rows_skipped")
      .orderBy($"layout", $"predicate")
  }

  /** Run-length-encoding LAYOUT audit — the write-side companion of the
    * zone-map audit (q216): parquet/ORC encode columns per page, and a
    * low-cardinality column's page size is ~its RUN count, so "would
    * sorting this table shrink it" is answerable from run statistics
    * alone, before any rewrite. Per audited column:
    *   - `natural_runs`: runs summed over arrival-order blocks of 1000
    *     (block-local RLE — exactly the page boundary a writer sees;
    *     counted with one lag per block, never a global order),
    *   - `sorted_runs`: the floor any sort achieves = the column's
    *     distinct count (each value is one run),
    * and the implied shrink in basis points. The decision artifact for
    * q102's Z-order / q132's compaction: a column whose natural runs
    * already approach its distinct count gains nothing.
    *
    * Scale shape: one lag window PER BLOCK (bounded by blockSize) per
    * column + a distinct count; no global window, no rewrite. */
  def rleAudit(spark: SparkSession, dir: String,
               blockSize: Int = 1000): DataFrame = {
    import spark.implicits._
    val base = graft.CacheGuard.barrier(
      Tables.orders(spark, dir).select($"o_orderkey",
        expr(s"o_orderkey div $blockSize").as("blk"),
        $"o_orderstatus", $"o_orderpriority"))
    def audit(colName: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"blk").orderBy($"o_orderkey")
      val runs = base
        .withColumn("prev", lag(col(colName), 1).over(w))
        .agg(sum(when($"prev".isNull || $"prev" =!= col(colName), 1L)
          .otherwise(0L)).as("natural_runs"),
          count(lit(1)).as("n_rows"))
      val sorted = base.agg(countDistinct(col(colName)).as("sorted_runs"))
      runs.crossJoin(sorted)
        .select(lit(colName).as("column"), $"n_rows", $"natural_runs",
          $"sorted_runs",
          expr("(natural_runs - sorted_runs) * 10000 div natural_runs")
            .as("shrink_bp"))
    }
    audit("o_orderstatus").unionByName(audit("o_orderpriority"))
      .orderBy($"column")
  }
}
