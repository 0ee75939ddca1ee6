package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnnSearchSpec extends SparkSpec {

  test("bruteForceTopK: k rows, similarity non-increasing, query excluded") {
    val out = AnnSearch.bruteForceTopK(spark, sf, queryId = 0L, k = 10).collect()
    assert(out.length === 10)
    assert(out.forall(_.getAs[Long]("vec_id") !== 0L))
    val sims = out.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims === sims.sortBy(-_))
    sims.foreach(s => assert(s >= -1.0001 && s <= 1.0001))
  }

  test("bruteForceTopK plans a broadcast of the query side (no shuffle of the corpus)") {
    val df = AnnSearch.bruteForceTopK(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast in:\n$plan")
  }

  test("lshTopK: results are a subset of the query bucket, ranked like brute force") {
    val out = AnnSearch.lshTopK(spark, sf, queryId = 0L, k = 10, bits = 4).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("bucket")).distinct.length === 1) // all query's bucket
    // every LSH hit must appear in the exhaustive ranking with the same score
    val brute = AnnSearch.bruteForceTopK(spark, sf, k = 1000).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    out.foreach(r =>
      assert(brute(r.getAs[Long]("vec_id")) === r.getAs[Double]("cos_sim")))
  }

  test("ivfTopK: probed-list hits are scored identically to brute force; query's own list is probed") {
    val out = AnnSearch.ivfTopK(spark, sf, queryId = 0L, k = 10).collect()
    assert(out.nonEmpty && out.length <= 10)
    assert(out.forall(_.getAs[Long]("vec_id") !== 0L))
    val sims = out.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims === sims.sortBy(-_))
    val brute = AnnSearch.bruteForceTopK(spark, sf, k = 10000).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    out.foreach(r =>
      assert(brute(r.getAs[Long]("vec_id")) === r.getAs[Double]("cos_sim")))
    // nprobe=4 of nlist=16 → candidates span at most 4 distinct lists
    assert(out.map(_.getAs[Long]("list_id")).distinct.length <= 4)
  }

  test("batchTopK: k ranked hits per query, scores non-increasing within each") {
    val out = AnnSearch.batchTopK(spark, sf, nQueries = 5, k = 5).collect()
    assert(out.length === 25)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to 5))
      val sims = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sortBy(-_))
    }
  }

  test("batchTopK pre-reduces before the shuffle: partial top-k aggregate, no window") {
    val df = AnnSearch.batchTopK(spark, sf, nQueries = 5, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    // the typed TopKAgg plans as ObjectHashAggregate with a partial mode
    // below the q_id exchange — the shuffle carries bounded buffers, not
    // every scored corpus row ranked by a row_number window
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Window"), s"expected no Window operator in:\n$plan")
  }

  test("IVF layout: corpus written partitioned by list_id gives a partition-PRUNED probe scan") {
    import spark.implicits._
    // the documented 100 TB layout (SCALE.md): write the corpus partitioned
    // by its coarse-quantizer list id; an nprobe probe then reads only the
    // probed lists' files — partition pruning, not a full scan + filter
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-layout").toString
    graft.Tables.embeddings(spark, sf)
      .withColumn("list_id", pmod($"vec_id", lit(8)))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$tmp/ivf")
    val probed = spark.read.parquet(s"$tmp/ivf").filter($"list_id".isin(2, 5))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val files = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(f => f.contains("list_id=2") || f.contains("list_id=5")),
      files.mkString("\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("knnJoin: ≤k neighbors per vector, bucket-local, scores match brute force") {
    import spark.implicits._
    val out = AnnSearch.knnJoin(spark, sf, k = 3).collect()
    assert(out.nonEmpty)
    val byVec = out.groupBy(_.getAs[Long]("vec_id"))
    byVec.values.foreach { rows =>
      assert(rows.length <= 3)
      val sims = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sortBy(-_))
    }
    // spot-check: a reported neighbor score equals the exact pairwise cosine
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      math.rint(d / (na * nb) * 1e4) / 1e4
    }
    out.take(20).foreach { r =>
      assert(r.getAs[Double]("cos_sim") ===
        cos(emb(r.getAs[Long]("vec_id")), emb(r.getAs[Long]("nbr"))))
    }
  }

  test("embeddingNearDupPairs: every vector pairs with its shifted exact copy at 1.0") {
    val out = AnnSearch.embeddingNearDupPairs(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    val exact = out.filter(r => r.getAs[Long]("b") === r.getAs[Long]("a") + 100000L)
    // identical vectors always share every LSH bucket → all n pairs found
    assert(exact.length.toLong === n)
    exact.foreach(r => assert(r.getAs[Double]("cos_sim") === 1.0))
  }

  test("embeddingNearDupPairs: a degenerate hot bucket is capped, never quadratic") {
    import spark.implicits._
    // 1000 identical vectors → one LSH bucket of 2000 after the dup union.
    // Uncapped this is a ~2M-pair self-join on one partition; with the
    // maxBlock guard the hot bucket is dropped and the job stays O(n).
    val tmp = java.nio.file.Files.createTempDirectory("graft-hotbucket").toString
    (0L until 1000L).map(i => (i, "hot", Seq.fill(8)(1.0f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = AnnSearch.embeddingNearDupPairs(spark, tmp)
    assert(out.count() === 0L) // block of 2000 > maxBlock=20 → excluded
    // a small block under the cap still pairs: 3 vectors + 3 shifted copies
    // form one identical block of 6 → C(6,2) = 15 pairs at cos 1.0
    (0L until 3L).map(i => (i, "ok", Seq.fill(8)(1.0f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val pairs = AnnSearch.embeddingNearDupPairs(spark, tmp).collect()
    assert(pairs.length === 15)
    pairs.foreach(r => assert(r.getAs[Double]("cos_sim") === 1.0))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("trainIvfCodebook: Lloyd's invariants — members partition the corpus, centroids are member means") {
    import spark.implicits._
    val out = AnnSearch.trainIvfCodebook(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    val dims = out.map(_.getAs[Long]("dim")).distinct
    // every (list, dim) mean present; member counts sum to the corpus
    val perList = out.groupBy(_.getAs[Long]("list_id"))
    perList.values.foreach(g => assert(g.length === dims.length))
    assert(perList.values.map(_.head.getAs[Long]("n_members")).sum === nVecs)
    // a second run is identical (fully deterministic training)
    val again = AnnSearch.trainIvfCodebook(spark, sf).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("trained codebook improves stand-in IVF recall vs brute force") {
    // everything here is deterministic (no RNG anywhere in training or
    // search), so these recall counts are CONSTANTS of the sf0.001 data:
    // over queries 61+3k at nprobe=2 the stand-in codebook recalls 32/100
    // and the 2-round Lloyd's codebook 37/100. The tight nprobe is where
    // codebook quality matters most (fewer probes to paper over bad
    // centroids). Queries inside the seed region (vec_id < 16 ARE the
    // stand-in centroids) would bias toward the stand-in — the set sits
    // outside it.
    val trained = AnnSearch.trainedCentroids(spark, sf)
    assert(trained.nonEmpty)
    val queries = (0 until 10).map(61L + 3 * _)
    def recall(centroids: Option[Seq[Seq[Double]]]): Int = queries.map { q =>
      val truth = AnnSearch.bruteForceTopK(spark, sf, queryId = q, k = 10)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      val got = AnnSearch.ivfTopK(spark, sf, queryId = q, k = 10, nprobe = 2,
        centroids = centroids)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      (truth & got).size
    }.sum
    val standIn = recall(None)
    val lloyds = recall(Some(trained))
    assert(lloyds > standIn, s"trained recall $lloyds !> stand-in $standIn")
  }

  test("quantizeEmbeddings: max level saturates at 127; reconstruction error is small") {
    val out = AnnSearch.quantizeEmbeddings(spark, sf).collect()
    assert(out.length.toLong === Tables.embeddings(spark, sf).count())
    out.foreach { r =>
      // symmetric scaling maps max|x| exactly to ±127; no level overflows
      assert(r.getAs[Long]("max_level") === 127L)
      assert(r.getAs[Long]("scale_u4") > 0L)
      // SQ8 step is amax/127, per-dim error ≤ half a step; for unit-ish
      // random vectors mse stays far below 1e-3 (1e5 in 1e-8 units)
      val mse = r.getAs[Long]("mse_u8")
      assert(mse >= 0L && mse < 100000L,
        s"vec ${r.getAs[Long]("vec_id")} mse_u8=$mse")
    }
  }

  test("semanticDedup: shifted exact copies are pruned, their bases kept; clusters partition the corpus") {
    val out = AnnSearch.semanticDedup(spark, sf).collect()
    graft.CacheGuard.release()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong === 2 * n)
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    byId.foreach { case (id, r) =>
      assert(r.getAs[Long]("list_id") >= 1L && r.getAs[Long]("list_id") <= 16L)
      if (id >= 100000L) {
        // identical vector, identical scores → same cluster as its base;
        // cos 1.0 to the lower-id base → always pruned
        val base = byId(id - 100000L)
        assert(r.getAs[Long]("list_id") === base.getAs[Long]("list_id"))
        assert(r.getAs[Double]("max_cos_lower") === 1.0)
        assert(!r.getAs[Boolean]("is_kept"))
      }
    }
    // random 64-dim vectors are near-orthogonal: bases overwhelmingly survive
    val keptBases = out.count(r =>
      r.getAs[Long]("vec_id") < 100000L && r.getAs[Boolean]("is_kept"))
    assert(keptBases.toLong >= n * 9 / 10, s"only $keptBases/$n bases kept")
    // exactly-one-survivor-per-duplicate-pair: kept count = distinct vectors
    assert(out.count(_.getAs[Boolean]("is_kept")).toLong === keptBases.toLong)
  }

  test("pqEncode: m codes per vector in [1,k]; every subspace uses multiple codes; errors bounded") {
    val out = AnnSearch.pqEncode(spark, sf).collect()
    graft.CacheGuard.release()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong === n * 8)
    out.foreach { r =>
      assert(r.getAs[Long]("code") >= 1L && r.getAs[Long]("code") <= 16L)
      assert(r.getAs[Double]("err2") >= 0.0)
      // unit-ish 8-dim subvectors: squared distance to a same-space
      // centroid stays O(1) — a wrong n or scale blows this up
      assert(r.getAs[Double]("err2") < 4.0,
        s"vec ${r.getAs[Long]("vec_id")} sub ${r.getAs[Long]("sub")}")
    }
    (0L to 7L).foreach { s =>
      val codes = out.filter(_.getAs[Long]("sub") === s)
        .map(_.getAs[Long]("code")).distinct
      assert(codes.length >= 2, s"subspace $s collapsed to ${codes.toSeq}")
    }
  }

  test("annRecallAudit: one row per query; overlap bounded by both sides; recall consistent") {
    val out = AnnSearch.annRecallAudit(spark, sf).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val (ne, nl, ov) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_lsh"),
        r.getAs[Long]("n_overlap"))
      assert(ne === 10L) // corpus >> k: exact side always fills
      assert(ov <= math.min(ne, nl))
      assert(math.abs(r.getAs[Double]("recall") - ov.toDouble / ne) < 1e-9)
    }
    // the LSH index finds SOMETHING across the query set (4-bit buckets
    // at this SF are dense)
    assert(out.map(_.getAs[Long]("n_overlap")).sum > 0L)
  }

  test("pqAdcTopK: k ranked rows, query excluded, distances non-negative and non-decreasing") {
    val out = AnnSearch.pqAdcTopK(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.length === 10)
    assert(!out.exists(_.getAs[Long]("vec_id") === 0L))
    val ds = out.map(_.getAs[Double]("adc_dist2")).toSeq
    // each LUT entry is a true squared subspace distance up to rounding
    ds.foreach(d => assert(d >= -0.001, s"negative ADC distance $d"))
    assert(ds === ds.sorted)
  }

  test("pqEncode argmin is a partial aggregate — no window, no cartesian in the plan") {
    val plan = AnnSearch.pqEncode(spark, sf).queryExecution.executedPlan.toString
    graft.CacheGuard.release()
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("semanticDedup plans cluster-local joins — no cartesian product") {
    val plan = AnnSearch.semanticDedup(spark, sf).queryExecution.executedPlan.toString
    graft.CacheGuard.release()
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("hardNegatives: no anchor ever receives a same-label or NaN candidate") {
    import spark.implicits._
    val rows = AnnSearch.hardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("vec_id")) !== r.getAs[Int]("q_label"))
      assert(!r.getAs[Double]("cos_sim").isNaN)
      assert(r.getAs[Int]("rk") >= 1 && r.getAs[Int]("rk") <= 5)
    }
    // within an anchor, similarity is non-increasing by rank — the whole
    // point of "hard" negatives is the head of this order
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos_sim"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hardNegatives: partial TopKAgg, no window over the corpus") {
    val plan = AnnSearch.hardNegatives(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("embeddingOutliers: z-scores recompute from the label's distance population") {
    import spark.implicits._
    val got = AnnSearch.embeddingOutliers(spark, sf).collect()
    graft.CacheGuard.release()
    assert(got.length > 0 && got.length <= 20)
    // z descending, and every reported dist non-negative
    val zs = got.map(_.getAs[Double]("z"))
    assert(zs.sameElements(zs.sortBy(-_)))
    got.foreach(r => assert(r.getAs[Double]("dist") >= 0.0))
    // top outlier's z agrees with a direct two-pass computation over its label
    val top = got.head
    val cent = AnnSearch.centroidsByLabel(spark, sf)
      .filter($"label" === top.getAs[Int]("label"))
      .orderBy($"dim").collect().map(_.getAs[Double]("mean_val"))
    val vecs = graft.Tables.embeddings(spark, sf)
      .filter($"label" === top.getAs[Int]("label"))
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.zip(cent).map { case (x, m) =>
          val d = x.toDouble - m; d * d }.sum)
    val us = vecs.map { case (id, d2) =>
      id -> math.floor(math.sqrt(d2) * 1e6 + 0.5).toLong }
    val n = us.length.toDouble
    val su = us.map(_._2.toDouble).sum
    val su2 = us.map(u => u._2.toDouble * u._2).sum
    val u = us.toMap.apply(top.getAs[Long]("vec_id")).toDouble
    val z = (n * u - su) / math.sqrt(n * su2 - su * su)
    assert(math.abs(z - top.getAs[Double]("z")) < 1e-2,
      s"direct $z vs reported ${top.getAs[Double]("z")}")
  }

  test("rankingEval: relevance counts agree with the recall audit; metrics bounded") {
    val rank = AnnSearch.rankingEval(spark, sf).collect()
    graft.CacheGuard.release()
    val recall = AnnSearch.annRecallAudit(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_overlap")).toMap
    assert(rank.nonEmpty)
    rank.foreach { r =>
      val qid = r.getAs[Long]("q_id")
      // n_relevant is exactly the recall audit's overlap count — two
      // independent derivations of the same set intersection
      assert(r.getAs[Long]("n_relevant") === recall(qid))
      assert(r.getAs[Long]("n_relevant") <= r.getAs[Long]("n_exact"))
      val (mrr, ndcg) = (r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      // a query with any relevant hit has mrr ≥ 1/k and ndcg > 0
      if (r.getAs[Long]("n_relevant") > 0) {
        assert(mrr >= 1.0 / 10 - 1e-9)
        assert(ndcg > 0.0)
      } else assert(mrr === 0.0 && ndcg === 0.0)
    }
  }

  test("multiProbeAudit: multi-probe dominates single-probe on candidates and recall") {
    val rows = AnnSearch.multiProbeAudit(spark, sf).collect()
    graft.CacheGuard.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // probing strictly more buckets can only add candidates and recall
      assert(r.getAs[Long]("n_multi") >= r.getAs[Long]("n_single"))
      assert(r.getAs[Double]("recall_multi") >=
        r.getAs[Double]("recall_single") - 1e-9)
      assert(r.getAs[Double]("recall_multi") <= 1.0 + 1e-9)
    }
    // single-probe matches the existing recall audit's candidate source:
    // its recall@k can never exceed multi-probe aggregate recall
    val meanS = rows.map(_.getAs[Double]("recall_single")).sum / rows.length
    val meanM = rows.map(_.getAs[Double]("recall_multi")).sum / rows.length
    assert(meanM >= meanS)
  }

  test("embeddingOutliers: centroid model broadcasts — corpus is never exploded or cartesian-joined") {
    val plan = AnnSearch.embeddingOutliers(spark, sf)
      .queryExecution.executedPlan.toString
    graft.CacheGuard.release()
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("matryoshkaAudit: overlap bounds hold and the full-dim side matches batchTopK") {
    val rows = AnnSearch.matryoshkaAudit(spark, sf, nQueries = 5, k = 10).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= 10L)
      assert(r.getAs[Double]("overlap_frac") === n.toDouble / 10.0)
      // truncating half the dimensions on random-ish vectors cannot keep
      // the full ranking perfectly — and must not destroy it either
      if (r.getAs[Boolean]("top1_agree")) assert(n >= 1L)
    }
    // truncation degrades gracefully on average (the MRL premise)
    val mean = rows.map(_.getAs[Long]("n_overlap")).sum.toDouble / rows.length
    assert(mean >= 1.0, s"mean overlap $mean — truncated space is noise")
  }

  test("matryoshkaAudit: ONE corpus pass — both rankings share a single partial aggregate") {
    val plan = AnnSearch.matryoshkaAudit(spark, sf)
      .queryExecution.executedPlan.toString
    // both TopKAgg buffers live in the same ObjectHashAggregate pair
    // (partial + final) — one corpus scan, no Window, no second join
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.split("ObjectHashAggregate").length - 1 === 2, plan.take(2000))
  }

  test("ivfProbeSweep: candidates and recall are monotone in nprobe; fractions replay") {
    import spark.implicits._
    val rows = AnnSearch.ivfProbeSweep(spark, sf).collect()
    graft.CacheGuard.release()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq ===
      AnnSearch.probeSweep.map(_.toLong))
    val nTotal = Tables.embeddings(spark, sf)
      .filter($"vec_id" =!= 0L).count()
    rows.foreach { r =>
      val nc = r.getAs[Long]("n_candidates")
      assert(nc >= 1L && nc <= nTotal)
      assert(r.getAs[Double]("scanned_frac") ===
        BigDecimal(nc.toDouble / nTotal).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      val rec = r.getAs[Long]("n_recalled")
      assert(rec >= 0L && rec <= 10L)
      assert(r.getAs[Double]("recall") === rec / 10.0)
    }
    // the dial's defining trade: more probes never scan less or recall less
    val byNp = rows.sortBy(_.getAs[Long]("nprobe"))
    byNp.zip(byNp.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_candidates") <= b.getAs[Long]("n_candidates"))
      assert(a.getAs[Long]("n_recalled") <= b.getAs[Long]("n_recalled"))
    }
    // probing more lists genuinely buys recall on this corpus
    assert(byNp.last.getAs[Long]("n_recalled") >
      byNp.head.getAs[Long]("n_recalled"))
  }

  test("embeddingHealth: per-dim moments replay a driver-side computation; shares normalize") {
    import spark.implicits._
    val rows = AnnSearch.embeddingHealth(spark, sf).collect()
    val dims = Tables.embeddings(spark, sf)
      .select(size($"embedding")).head().getInt(0)
    assert(rows.length === dims)
    assert(math.abs(rows.map(_.getAs[Double]("var_share")).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      assert(r.getAs[Double]("variance") >= 0.0)
      assert(r.getAs[Double]("var_share") >= 0.0)
    }
    // replay dimension 1 exactly on the e3 grid
    val xs = Tables.embeddings(spark, sf)
      .select(element_at($"embedding", 1).cast("double")).collect()
      .map(r => math.floor(r.getDouble(0) * 1000 + 0.5).toLong)
    val n = xs.length.toDouble
    val (s, ssq) = (xs.sum.toDouble, xs.map(x => x * x).sum.toDouble)
    val d1 = rows.find(_.getAs[Long]("dim") === 1L).get
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d1.getAs[Double]("mean") ===
      math.floor(s * 1000.0 / n + 0.5) / 1e6)
    assert(d1.getAs[Double]("variance") === r6((ssq - s * s / n) / n / 1e6))
  }

  test("ivfDeltaAudit: every vector lands in one list; drift/flag arithmetic is consistent") {
    import spark.implicits._
    val rows = AnnSearch.ivfDeltaAudit(spark, sf).collect()
    assert(rows.length === 16)
    assert(rows.map(_.getAs[Long]("list_id")).toSeq === (1L to 16L))
    // membership conservation: per-list counts re-sum to the two splits
    val emb = Tables.embeddings(spark, sf)
    val nDelta = emb.filter($"vec_id" % AnnSearch.ivfDeltaMod === 0).count()
    val nBase = emb.count() - nDelta
    assert(rows.map(_.getAs[Long]("n_base")).sum === nBase)
    assert(rows.map(_.getAs[Long]("n_delta")).sum === nDelta)
    rows.foreach { r =>
      val (nb, nd) = (r.getAs[Long]("n_base"), r.getAs[Long]("n_delta"))
      val growth = r.getAs[Double]("growth")
      val drift = r.getAs[Double]("drift")
      assert(growth === BigDecimal(nd.toDouble / math.max(nb, 1L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // no delta arrivals -> the stored centroid cannot drift
      if (nd === 0L) assert(drift === 0.0)
      assert(drift >= 0.0)
      assert(r.getAs[Boolean]("needs_retrain") ===
        ((nb == 0L && nd > 0L) || drift > AnnSearch.ivfDriftTau ||
          growth > AnnSearch.ivfGrowthTau))
    }
    // the thresholds exercise BOTH branches on this corpus
    assert(rows.exists(_.getAs[Boolean]("needs_retrain")))
    assert(rows.exists(!_.getAs[Boolean]("needs_retrain")))
  }

  test("ivfDeltaAudit: the delta path never joins base rows to delta rows") {
    val plan = AnnSearch.ivfDeltaAudit(spark, sf)
      .queryExecution.executedPlan.toString
    // the only join is between the two nlist×dim stat relations (a tiny
    // sort-merge/shuffle join is fine there); no cartesian anywhere
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("clusterSilhouette: driver-side replay of a/b/s per vector; mass and misassignment exact") {
    val nlist = 16
    val rows = AnnSearch.clusterSilhouette(spark, sf, nlist).collect()
    assert(rows.nonEmpty)
    val cents = AnnSearch.trainedCentroids(spark, sf, nlist)
    val cc = cents.map(c => c.foldLeft(0.0)((s, x) => s + x * x))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    case class Cell(var n: Long = 0L, var neg: Long = 0L, var sum: Long = 0L)
    val cells = collection.mutable.Map[Long, Cell]()
    vecs.foreach { case (_, e) =>
      val ed = e.map(_.toDouble)
      val ee = ed.foldLeft(0.0)((s, x) => s + x * x)
      val dots = cents.map(c =>
        c.indices.foldLeft(0.0)((s, i) => s + ed(i) * c(i)))
      val own = dots.indexOf(dots.max) // first max = lowest cluster
      val dists = dots.indices.map(i => (ee - 2.0 * dots(i)) + cc(i))
      val a = dists(own)
      val b = dists.indices.filter(_ != own).map(dists).min
      val s0 = if (math.max(a, b) <= 0) 0.0 else (b - a) / math.max(a, b)
      val u = math.floor(BigDecimal(s0).setScale(8,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6 + 0.5).toLong
      val cell = cells.getOrElseUpdate(own + 1L, Cell())
      cell.n += 1; cell.sum += u; if (b < a) cell.neg += 1
    }
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === vecs.length.toLong)
    rows.foreach { r =>
      val c = cells(r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("n_vecs") === c.n)
      assert(r.getAs[Long]("n_misassigned") === c.neg)
      assert(r.getAs[Long]("mean_sil_u6") ===
        math.floor(c.sum.toDouble / c.n + 0.5).toLong)
      // silhouette mean stays in the legal band
      assert(math.abs(r.getAs[Long]("mean_sil_u6")) <= 1000000L)
    }
    // the audit has signal on this corpus: some cluster reports
    // misassigned vectors OR a sub-perfect mean
    assert(rows.exists(r => r.getAs[Long]("n_misassigned") > 0 ||
      r.getAs[Long]("mean_sil_u6") < 1000000L))
  }

  test("clusterPurity: contingency replay — purity and entropy recompose from the per-cluster language histogram") {
    val rows = AnnSearch.clusterPurity(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the (cluster, lang) histogram from the engine's own
    // assignment primitives
    val cents = AnnSearch.trainedCentroids(spark, sf, 16)
    val langs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hist = collection.mutable.Map[(Long, String), Long]()
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .foreach { r =>
        val ed = r.getSeq[Float](1).map(_.toDouble)
        val dots = cents.map(c =>
          c.indices.foldLeft(0.0)((s, i) => s + ed(i) * c(i)))
        val cl = dots.indexOf(dots.max) + 1L
        val k = (cl, langs(r.getLong(0)))
        hist(k) = hist.getOrElse(k, 0L) + 1L
      }
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === hist.values.sum)
    rows.foreach { r =>
      val cl = r.getAs[Long]("cluster")
      val cells = hist.collect { case ((c, l), n) if c == cl => (l, n) }.toSeq
      val n = cells.map(_._2).sum
      // majority election with (count desc, lang asc) tie-break
      val (topLang, nTop) = cells.sortBy { case (l, c) => (-c, l) }.head
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[String]("top_lang") === topLang, s"cluster $cl")
      assert(r.getAs[Long]("n_top") === nTop)
      assert(r.getAs[Long]("purity_u4") ===
        math.floor(nTop.toDouble / n * 1e4 + 0.5).toLong)
      val h = cells.map { case (_, c) =>
        val p = c.toDouble / n
        math.floor(BigDecimal(-p * math.log(p)).setScale(8,
          BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6 + 0.5).toLong
      }.sum
      assert(r.getAs[Long]("entropy_u6") === h, s"cluster $cl")
      // a one-language cluster has zero entropy and full purity; mixed
      // clusters have positive entropy
      if (cells.size == 1) {
        assert(r.getAs[Long]("entropy_u6") === 0L)
        assert(r.getAs[Long]("purity_u4") === 10000L)
      } else assert(r.getAs[Long]("entropy_u6") > 0L)
    }
    // the synthetic corpus mixes languages inside semantic clusters —
    // the audit must show at least one impure cluster
    assert(rows.exists(_.getAs[Long]("purity_u4") < 10000L))
  }

  test("clusterSilhouette: map-side against the broadcast codebook — no window, no join on the corpus side") {
    val plan = AnnSearch.clusterSilhouette(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ivfPqTopK: equals the unrestricted ADC ranking filtered to the integer-dot probe set") {
    import spark.implicits._
    val got = AnnSearch.ivfPqTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("list_id"),
        r.getAs[Double]("adc_dist2")))
    graft.CacheGuard.release()
    // unrestricted ADC distances for the whole corpus (q86 with a large k)
    val full = AnnSearch.pqAdcTopK(spark, sf, topK = 1000000).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adc_dist2")).toMap
    graft.CacheGuard.release()
    // driver-side replay of the INTEGER coarse quantizer: e3 grid, first-16
    // seeds, argmax dot with ties to the lowest list id
    val eq = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
      .toMap
    val cents = (0L until 16L).map(eq)
    def idots(e: Seq[Long]): Seq[Long] =
      cents.map(c => c.zip(e).map { case (a, b) => a * b }.sum)
    def listOf(e: Seq[Long]): Long = {
      val d = idots(e)
      (d.indexOf(d.max) + 1).toLong
    }
    val qd = idots(eq(0L))
    val probeSet = (1 to 16).filter { c =>
      (1 to 16).count(i => qd(i - 1) > qd(c - 1) ||
        (qd(i - 1) == qd(c - 1) && i < c)) < 4
    }.map(_.toLong).toSet
    // every elected row sits in a probed list, with the q86 distance
    got.foreach { case (v, l, d) =>
      assert(listOf(eq(v)) === l)
      assert(probeSet(l))
      assert(full(v) === d)
    }
    // and the result IS the top-10 of the probed fraction
    val expected = full.toSeq
      .filter { case (v, _) => v != 0L && probeSet(listOf(eq(v))) }
      .sortBy { case (v, d) => (d, v) }.take(10)
      .map { case (v, d) => (v, listOf(eq(v)), d) }
    assert(got.toSeq === expected)
  }

  test("contrastiveTriplets: positives elected from the pair graph, negatives never near-dups") {
    import spark.implicits._
    val out = AnnSearch.contrastiveTriplets(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    // the lexical pair graph, mapped out of the mirrored corpus
    val pairs = DedupOps.minHashLshPairsOracled(spark, sf,
        threshold = 0.2)
      .select(($"a" % 100000).as("x"), ($"b" % 100000).as("y"))
      .filter($"x" =!= $"y").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).distinct
    graft.CacheGuard.release()
    val partners = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val (a, p, n) = (r.getAs[Long]("anchor_id"), r.getAs[Long]("pos_id"),
        r.getAs[Long]("neg_id"))
      assert(p === pairs.filter(_._1 == a).map(_._2).min,
        s"positive must be the min partner of $a")
      assert(n != a && n != p)
      assert(!partners(a).contains(n), s"negative $n is a near-dup of $a")
      // margin and hard flag replay from the quantized cosines
      val (pc, nc) = (r.getAs[Double]("pos_cos"), r.getAs[Double]("neg_cos"))
      assert(r.getAs[Long]("margin_u4") ===
        math.floor(pc * 1e4 + 0.5).toLong - math.floor(nc * 1e4 + 0.5).toLong)
      assert(r.getAs[Boolean]("hard") === (nc >= pc))
    }
  }

  test("q280: prototype pruning — per-cluster rank structure, exact drop rules, mirror coherence") {
    val out = AnnSearch.prototypePrune(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("list_id"))
    byCluster.foreach { case (_, rows) =>
      val n = rows.length.toLong
      assert(rows.forall(_.getAs[Long]("cluster_n") === n))
      // ranks are a permutation of 1..n and descend by (cos, vec_id)
      val sorted = rows.sortBy(r =>
        (-r.getAs[Double]("cos_c"), r.getAs[Long]("vec_id")))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to n))
      // exact integer drop rules, counts = floor(n·pct/100)
      val protoN = rows.count(_.getAs[Boolean]("drop_proto"))
      val outN = rows.count(_.getAs[Boolean]("drop_outlier"))
      assert(protoN === (n * AnnSearch.protoPct / 100).toInt)
      assert(outN === (n * AnnSearch.outlierPct / 100).toInt)
      rows.foreach { r =>
        val rnk = r.getAs[Long]("rnk")
        assert(r.getAs[Boolean]("drop_proto") ===
          (rnk * 100 <= n * AnnSearch.protoPct))
        assert(r.getAs[Boolean]("drop_outlier") ===
          ((n - rnk + 1) * 100 <= n * AnnSearch.outlierPct))
        assert(r.getAs[Boolean]("is_kept") ===
          (!r.getAs[Boolean]("drop_proto") &&
            !r.getAs[Boolean]("drop_outlier")))
      }
    }
    // the designed +100000 mirror sits in the SAME cluster at the SAME
    // cosine as its base (identical embedding), ranked after it by the
    // vec_id tie-break
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    val base = out.filter(_.getAs[Long]("vec_id") < 100000L)
    assert(base.nonEmpty)
    base.foreach { r =>
      val m = byId(r.getAs[Long]("vec_id") + 100000L)
      assert(m.getAs[Long]("list_id") === r.getAs[Long]("list_id"))
      assert(m.getAs[Double]("cos_c") === r.getAs[Double]("cos_c"))
      assert(m.getAs[Long]("rnk") > r.getAs[Long]("rnk"))
    }
  }

  test("q286: reciprocal NN — mutuality replayed from the capped bucket candidates; pairs disjoint") {
    import spark.implicits._
    val out = AnnSearch.reciprocalNearestNeighbors(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    // replay buckets + norms driver-side on the raw table
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding",
        graft.functions.VectorFunctions.signLshBucket($"embedding", 4)
          .as("bucket"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getAs[Long]("bucket")))
    val byBucket = vecs.groupBy(_._3).filter(_._2.length <= 500)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4 + 0.5) / 1e4
    }
    val best = byBucket.values.flatMap { block =>
      block.map { case (v, e, _) =>
        val cands = block.filter(_._1 != v)
          .map { case (n, en, _) => (cos(e, en), n) }
        val top = cands.maxBy { case (c, n) => (c, -n) }
        v -> (top._2, top._1, cands.size.toLong)
      }
    }.toMap
    val wantPairs = best.collect {
      case (v, (n, c, _)) if best.get(n).exists(_._1 == v) && v < n =>
        (v, n) -> c
    }
    assert(out.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
      r.getAs[Double]("cos_sim")).toMap === wantPairs)
    out.foreach { r =>
      assert(r.getAs[Long]("a_cands") === best(r.getAs[Long]("a"))._3)
      assert(r.getAs[Long]("b_cands") === best(r.getAs[Long]("b"))._3)
    }
    // RNN pairs are a matching: no vector appears in two pairs
    val members = out.flatMap(r =>
      Seq(r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(members.distinct.length === members.length)
  }
}
