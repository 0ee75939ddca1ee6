package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave for the property check. */
  private def morton(x: Long, y: Long, bits: Int = 8): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue: hand value and property vs reference implementation") {
    import spark.implicits._
    assert(morton(5L, 3L) === 27L)
    val rng = new scala.util.Random(42)
    val pts = Seq.fill(200)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") === morton(r.getAs[Long]("x"), r.getAs[Long]("y")))
    }
  }

  test("zorderAudit: every z-block is an 8x8 tile and row mass is conserved") {
    val rows = Layout.zorderAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // zkey >> 6 fixes all but 3 x-bits and 3 y-bits: an 8x8 rectangle
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 7L)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 7L)
      assert(r.getAs[Long]("span") <= 64L)
    }
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === Tables.events(spark, sf).count())
  }

  test("compactionPlan: bins replay the greedy prefix-sum walk per source") {
    val rows = Layout.compactionPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, files) =>
      // collect() preserves the orderBy(source, lang) output order
      var cum = 0L
      files.foreach { f =>
        assert(f.getAs[Long]("bin") ===
          math.floorDiv(cum, Layout.compactionTarget))
        cum += f.getAs[Long]("bytes")
      }
      // bins are contiguous non-decreasing from 0
      val bins = files.map(_.getAs[Long]("bin"))
      assert(bins.head === 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a })
    }
    // inventory covers the whole corpus
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
  }

  test("compactionPlan: the prefix sum windows PER SOURCE — no global-order collapse") {
    val plan = Layout.compactionPlan(spark, sf)
      .queryExecution.executedPlan.toString
    // a partitioned window plans hashpartitioning on source, never a
    // single-partition rangepartitioning before the window
    assert(plan.contains("hashpartitioning(source"), plan.take(1500))
  }

  test("vacuumPlan: verdicts replay the snapshot-visibility rules row by row") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def am1(id: Long) = id % Layout.vacAmend1Mod == 0
    def del(id: Long) = id % Layout.vacDeleteMod == 0
    def am2(id: Long) = id % Layout.vacAmend2Mod == 0
    def bucket(id: Long) = id % Layout.vacBuckets
    val written = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)] // file -> (rows, bytes)
    docs.foreach { case (id, ch) =>
      def add(v: Long): Unit = {
        val k = (v, bucket(id))
        val (r0, b0) = written.getOrElse(k, (0L, 0L))
        written(k) = (r0 + 1, b0 + ch)
      }
      add(0L)
      if (am1(id)) add(1L)
      if (am2(id) && !del(id)) add(2L)
    }
    val refs = docs.filter(d => !del(d._1)).flatMap { case (id, _) =>
      val v1 = if (am1(id)) 1L else 0L
      val v2 = if (am2(id)) 2L else v1
      Seq((v1, bucket(id)), (v2, bucket(id)))
    }.toSet
    val rows = Layout.vacuumPlan(spark, sf).collect()
    assert(rows.length === written.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("version"), r.getAs[Long]("bucket"))
      val (nr, by) = written(k)
      assert(r.getAs[Long]("n_rows") === nr)
      assert(r.getAs[Long]("bytes") === by)
      assert(r.getAs[Boolean]("referenced") === refs.contains(k))
      assert(r.getAs[Long]("reclaim_bytes") ===
        (if (refs.contains(k)) 0L else by))
    }
    // On the uniform-id sf corpus the keep-v1+v2 retention references
    // every file (a v0 file orphans only when EVERY live row in its
    // bucket was amended at v1, which id%7 over a dense id range never
    // produces) — the replay above must agree with that, and the
    // constructed-corpus test below proves the reclaim path fires.
    assert(rows.forall(_.getAs[Boolean]("referenced")))
  }

  test("vacuumPlan: a fully-amended bucket orphans its v0 file (constructed corpus)") {
    import spark.implicits._
    // Bucket 0 rows are ids ≡ 0 (mod lcm(7,16) = 112): every one amended
    // at v1, none deleted (112k % 11 ≠ 0 for k = 1..5), none amended at
    // v2 (% 13 ≠ 0) — so snapshot v1 AND v2 both read the v1 file and the
    // v0 bucket-0 file is unreferenced. Bucket 1 holds one untouched row
    // whose v0 file stays live.
    val docs = (Seq(112L, 224L, 336L, 448L, 560L).map((_, 100L)) :+ (1L, 7L))
      .toDF("doc_id", "n_chars")
    val rows = Layout.vacuumPlanOf(docs).collect()
      .map(r => ((r.getAs[Long]("version"), r.getAs[Long]("bucket")),
        (r.getAs[Boolean]("referenced"), r.getAs[Long]("reclaim_bytes"))))
      .toMap
    assert(rows.size === 3)
    assert(rows((0L, 0L)) === ((false, 500L))) // orphaned base file reclaims
    assert(rows((1L, 0L)) === ((true, 0L)))    // v1 amend file referenced
    assert(rows((0L, 1L)) === ((true, 0L)))    // untouched row keeps its v0
  }

  test("vacuumPlan: reference set broadcasts — the inventory never sort-merges") {
    val plan = Layout.vacuumPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("exportManifest: round-trip — a consumer re-deriving the manifest from written JSONL shards reproduces it") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-export").toString
    // writer side: JSONL shards partitioned by the assignment column
    Layout.exportAssign(Tables.documents(spark, sf))
      .select($"shard", $"doc_id", $"text", $"lang", $"source")
      .write.partitionBy("shard").mode("overwrite").json(out)
    // consumer side: read the files back, re-derive shard + manifest
    // from the payload ALONE (shard column comes from the directory,
    // but the checksum must recompute from text — that is the point)
    val back = spark.read.json(out)
    val rederived = Layout.exportAssign(
        back.select($"doc_id".cast("long").as("doc_id"),
          $"text", $"lang", $"source",
          length($"text").cast("long").as("n_chars")))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"),
        min($"doc_id").as("min_doc_id"), max($"doc_id").as("max_doc_id"),
        expr("bit_xor(fp32)").as("checksum32"))
      .orderBy($"shard").collect().toSeq
    val declared = Layout.exportManifest(spark, sf).collect().toSeq
    assert(rederived === declared)
    // directory-level shard from the writer agrees with the re-derived
    // assignment (the hash is stable, not partition-dependent)
    val mismatch = back.select($"shard".cast("long").as("dir_shard"),
        $"doc_id".cast("long").as("doc_id"), $"text", $"lang", $"source")
      .join(Layout.exportAssign(Tables.documents(spark, sf))
        .select($"doc_id", $"shard"), "doc_id")
      .filter($"dir_shard" =!= $"shard").count()
    assert(mismatch === 0L)
    // a corrupted shard surfaces: drop one row and the checksum flips
    val full = Layout.exportAssign(Tables.documents(spark, sf))
    val victim = full.orderBy($"doc_id").limit(1)
      .select($"doc_id", $"shard").head()
    val truncated = full
      .filter($"doc_id" =!= victim.getLong(0))
      .groupBy($"shard").agg(expr("bit_xor(fp32)").as("checksum32"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orig = declared
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("checksum32")).toMap
    assert(truncated(victim.getLong(1)) !== orig(victim.getLong(1)))
  }

  test("ringChurn: driver replay of both assignments; the Karger property holds") {
    val out = Layout.ringChurn(spark, sf).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    graft.CacheGuard.release()
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    val (w, v) = (Layout.ringWorkers, Layout.ringVnodes)
    def ring(workers: Int): Seq[(Long, Long)] =
      (for (wk <- 0 until workers; vn <- 0 until v)
        yield (h32(s"w:$wk:$vn"), wk.toLong)).sortBy(_._1)
    def assign(h: Long, r: Seq[(Long, Long)]): Long =
      r.find(_._1 >= h).getOrElse(r.head)._2
    val (r8, r9) = (ring(w), ring(w + 1))
    val keys = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).map(id => (id, h32(id.toString)))
    val ringMoved = keys.filter { case (_, h) =>
      assign(h, r8) != assign(h, r9) }
    val modMoved = keys.filter { case (_, h) => h % w != h % (w + 1) }
    assert(out("ring").getAs[Long]("n_keys") === keys.length.toLong)
    assert(out("ring").getAs[Long]("n_moved") === ringMoved.length.toLong)
    assert(out("mod").getAs[Long]("n_moved") === modMoved.length.toLong)
    // Karger: a ring key moves ONLY onto the new worker, and the churn
    // is a small fraction while mod reshuffles nearly everything
    ringMoved.foreach { case (_, h) => assert(assign(h, r9) === w.toLong) }
    assert(out("ring").getAs[Long]("moved_bp") <
      out("mod").getAs[Long]("moved_bp") / 3)
    // post-resize loads partition the corpus
    assert(out("ring").getAs[Long]("max_load") >=
      out("ring").getAs[Long]("min_load"))
  }

  test("zoneMapAudit: skip counts replay driver-side; clustering decides skippability") {
    val out = Layout.zoneMapAudit(spark, sf).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("predicate")) -> r)
      .toMap
    assert(out.size === 8) // 2 layouts x 4 predicates
    // driver replay of the month layout's date_ge_2000 skip count
    val rows = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("o_orderdate")).as("d"))
      .collect()
      .map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[java.sql.Date]("d").toLocalDate))
    val byMonth = rows.groupBy { case (_, d) =>
      f"${d.getYear}%04d-${d.getMonthValue}%02d" }
    val cut = java.time.LocalDate.parse("2000-01-01")
    val skippable = byMonth.filter(_._2.map(_._2).max(
      Ordering.by((x: java.time.LocalDate) => x.toEpochDay)).isBefore(cut))
    val got = out(("month", "date_ge_2000"))
    assert(got.getAs[Long]("n_blocks") === byMonth.size.toLong)
    assert(got.getAs[Long]("n_skipped") === skippable.size.toLong)
    assert(got.getAs[Long]("rows_skipped") ===
      skippable.values.map(_.length.toLong).sum)
    out.foreach { case ((_, _), r) =>
      assert(r.getAs[Long]("skip_bp") ===
        r.getAs[Long]("n_skipped") * 10000L / r.getAs[Long]("n_blocks"))
    }
    // the structural point: random key blocks cannot skip date ranges,
    // month clustering can
    assert(out(("key_block", "date_ge_2000")).getAs[Long]("n_skipped") === 0L)
    assert(out(("month", "date_ge_2000")).getAs[Long]("n_skipped") > 0L)
  }

  test("rleAudit: block-local runs replay driver-side; sorting floors at the distinct count") {
    val out = Layout.rleAudit(spark, sf).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    graft.CacheGuard.release()
    assert(out.keySet === Set("o_orderstatus", "o_orderpriority"))
    val rows = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[String]("o_orderstatus"),
        r.getAs[String]("o_orderpriority")))
    def runs(get: ((Long, String, String)) => String): Long =
      rows.groupBy(_._1 / 1000).values.map { blk =>
        val vs = blk.sortBy(_._1).map(get)
        1L + vs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
      }.sum
    out.foreach { case (cn, r) =>
      val get: ((Long, String, String)) => String =
        if (cn == "o_orderstatus") _._2 else _._3
      assert(r.getAs[Long]("natural_runs") === runs(get), cn)
      assert(r.getAs[Long]("sorted_runs") ===
        rows.map(get).distinct.length.toLong)
      assert(r.getAs[Long]("natural_runs") >= r.getAs[Long]("sorted_runs"))
      assert(r.getAs[Long]("shrink_bp") ===
        (r.getAs[Long]("natural_runs") - r.getAs[Long]("sorted_runs")) *
          10000L / r.getAs[Long]("natural_runs"))
      assert(r.getAs[Long]("n_rows") === rows.length.toLong)
    }
  }

  test("zorderPruning: each 1-D layout prunes only its own axis; zorder prunes both") {
    val out = Layout.zorderPruning(spark, sf).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("predicate")) -> r)
      .toMap
    graft.CacheGuard.release()
    assert(out.size === 6)
    def bp(l: String, p: String): Long = out((l, p)).getAs[Long]("skip_bp")
    // the y axis (hour of day) spans its full domain at every SF:
    // clustering on y serves y, the x-clustered layout starves it
    assert(bp("hour_block", "y_lt_8") > 0L)
    assert(bp("user_block", "y_lt_8") === 0L)
    assert(bp("zorder", "y_lt_8") > 0L)
    // the x axis only exceeds the predicate bound when enough users
    // exist (the sf0.001 fixture has 15) — gate those asserts on domain
    val maxX = graft.Tables.events(spark, sf)
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("user_id") % 256)).head.getLong(0)
    if (maxX >= 40) {
      assert(bp("user_block", "x_lt_32") > 0L)
      assert(bp("hour_block", "x_lt_32") === 0L)
      assert(bp("zorder", "x_lt_32") > 0L)
    }
    out.values.foreach { r =>
      assert(r.getAs[Long]("skip_bp") ===
        r.getAs[Long]("n_skipped") * 10000L / r.getAs[Long]("n_blocks"))
      assert(r.getAs[Long]("n_skipped") <= r.getAs[Long]("n_blocks"))
    }
  }
}
