package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample: deterministic, bucket within rate, repeated runs identical") {
    val a = CorpusOps.stratifiedSample(spark, sf).collect()
    val b = CorpusOps.stratifiedSample(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq) // hash-based, not rand()
    assert(a.nonEmpty)
    a.foreach(r => assert(r.getAs[Long]("bucket") < r.getAs[Long]("rate")))
  }

  test("stratifiedSample: raising a rate gives a SUPERSET (nested samples)") {
    val small = CorpusOps.stratifiedSample(spark, sf, Seq("en" -> 20), default = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = CorpusOps.stratifiedSample(spark, sf, Seq("en" -> 60), default = 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(big.size > small.size)
  }

  test("trainingPipeline: dedup keeps one copy per content, sample respects rates, stages compose") {
    val out = CorpusOps.trainingPipeline(spark, sf).collect()
    assert(out.nonEmpty)
    // exact dedup stage: one surviving row per fingerprint, and the keeper
    // is always the base copy (min id), never the +100000 shifted one
    val fps = out.map(_.getAs[String]("fp"))
    assert(fps.distinct.length === fps.length)
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") < 100000L)
      assert(r.getAs[Long]("n_tokens") >= 5L)   // quality gate
      assert(r.getAs[Long]("bucket") < 100L)    // sample stage ran
    }
  }

  test("corpusStats: groups cover every source; counts add up; median within range") {
    val out = CorpusOps.corpusStats(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(out.map(_.getAs[String]("source")).toSet ===
      docs.select("source").distinct().collect().map(_.getString(0)).toSet)
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    out.foreach { r =>
      assert(r.getAs[Double]("median_chars") >= 0.0)
      assert(r.getAs[Long]("n_empty") <= r.getAs[Long]("n_docs"))
    }
  }

  test("mixtureWeights: weights normalize; temperature up-samples low-resource langs") {
    val out = CorpusOps.mixtureWeights(spark, sf).collect()
    assert(out.length > 1)
    val pSum = out.map(_.getAs[Double]("p")).sum
    val wSum = out.map(_.getAs[Double]("w")).sum
    assert(math.abs(pSum - 1.0) < 1e-3 && math.abs(wSum - 1.0) < 1e-3)
    // alpha < 1 compresses the distribution: the rarest language's
    // sampling rate exceeds the commonest language's
    val byN = out.sortBy(_.getAs[Long]("n_docs"))
    assert(byN.head.getAs[Double]("sample_rate") >
      byN.last.getAs[Double]("sample_rate"))
    // rates stay coupled: sum over langs of p * sample_rate = 1 (mass
    // conservation of the mix)
    val mass = out.map(r => r.getAs[Double]("p") * r.getAs[Double]("sample_rate")).sum
    assert(math.abs(mass - 1.0) < 1e-2)
  }

  test("sequencePack: contiguous exact packing — starts chain, offsets bounded, crossings consistent") {
    val out = CorpusOps.sequencePack(spark, sf).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(out.nonEmpty)
    // concatenation is gapless: each doc starts where the previous ended
    out.foldLeft(0L) { (expectStart, r) =>
      assert(r.getAs[Long]("start") === expectStart,
        s"doc ${r.getAs[Long]("doc_id")} starts at ${r.getAs[Long]("start")}, want $expectStart")
      expectStart + r.getAs[Long]("n_tokens")
    }
    val L = CorpusOps.packSeqLen
    out.foreach { r =>
      val (start, n) = (r.getAs[Long]("start"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("seq_id") === start / L)
      assert(r.getAs[Long]("seq_offset") === start % L)
      assert(r.getAs[Long]("n_boundary_crossings") === (start + n - 1) / L - start / L)
    }
  }

  test("sequencePack plan: the corpus prefix sum is BUCKETED, never a single global window") {
    val p = CorpusOps.sequencePack(spark, sf).queryExecution.executedPlan.toString
    // phase-1 window partitions by bucket (parallel); only the tiny
    // bucket-totals aggregate may pass through a single partition
    assert(p.contains("windowspecdefinition(bucket"), p)
  }

  test("corpusBuild capstone: every stage's contract holds on the composed output") {
    val out = CorpusOps.corpusBuild(spark, sf).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= CorpusOps.buildMinTokens) // gate
      assert(r.getAs[Double]("dup_ratio") <= 0.5)                   // span gate
      assert(r.getAs[Double]("mean_logprob") * 1e6 >
        CorpusOps.buildLogProbFloorUnits - 1)                       // LM floor
    }
    // packing is gapless over the SURVIVORS in doc order
    out.foldLeft(0L) { (expect, r) =>
      assert(r.getAs[Long]("start") === expect)
      assert(r.getAs[Long]("seq_id") === r.getAs[Long]("start") / CorpusOps.packSeqLen)
      expect + r.getAs[Long]("n_tokens")
    }
    // temperature sampling kept every language in the mix
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(out.map(_.getAs[String]("lang")).distinct.length.toLong === langs)
  }

  test("corpusDiff: every class present and counts match the deterministic v2 seeding") {
    import spark.implicits._
    val out = CorpusOps.corpusDiff(spark, sf).collect()
    val byStatus = out.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    val ids = Tables.documents(spark, sf).select($"doc_id").as[Long].collect()
    assert(byStatus("removed") === ids.count(_ % 5 == 4))
    assert(byStatus("added") === ids.count(_ % 11 == 0))
    // changed = amended docs that survived the drop (text genuinely differs)
    assert(byStatus("changed") === ids.count(i => i % 5 != 4 && i % 7 == 0))
    assert(byStatus.values.sum === out.length)
    // added docs carry the shifted id range
    out.filter(_.getAs[String]("status") == "added")
      .foreach(r => assert(r.getAs[Long]("doc_id") >= 300000L))
  }

  test("corpusStatsApprox: sketch median within the pinned tolerance of exact") {
    val approx = CorpusOps.corpusStatsApprox(spark, sf).collect()
    val exact = CorpusOps.corpusStats(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("median_chars")).toMap
    assert(approx.nonEmpty)
    approx.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"), s"sketch out of tolerance: $r")
      // the exact column agrees with corpusStats' independent computation
      assert(math.abs(r.getAs[Double]("median_exact") -
        exact(r.getAs[String]("source"))) < 1e-9)
    }
  }

  test("labelCentroids: one row per (label, dim); mean of a constant column is that constant") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-centroid").toString
    Seq((0L, "a", Seq(1.0f, 3.0f)), (1L, "a", Seq(3.0f, 3.0f)), (2L, "b", Seq(5.0f, 7.0f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = AnnSearch.centroidsByLabel(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === Map(("a", 1L) -> 2.0, ("a", 2L) -> 3.0, ("b", 1L) -> 5.0, ("b", 2L) -> 7.0))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("tfIdfTopTerms: k rows max per doc, non-increasing weights, df consistent") {
    val out = CorpusOps.tfIdfTopTerms(spark, sf, k = 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      assert(g.length <= 3)
      val byRk = g.sortBy(_.getAs[Long]("rk"))
      val ws = byRk.map(_.getAs[Double]("tfidf")).toSeq
      assert(ws === ws.sortBy(-_))
    }
    // a corpus-wide term (appears in every doc) has idf 0 → never a top term
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach(r => assert(r.getAs[Long]("df") <= nDocs))
  }

  test("reservoirSample: exact size, deterministic, and bottom-k samples nest") {
    val k100 = CorpusOps.reservoirSample(spark, sf, k = 100).collect()
    assert(k100.length === 100)
    val pri = k100.map(_.getAs[String]("priority")).toSeq
    assert(pri === pri.sorted) // bottom-k by priority, ordered
    val again = CorpusOps.reservoirSample(spark, sf, k = 100).collect()
    assert(k100.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // nesting: the k=40 sample is exactly the first 40 of the k=100 sample
    val k40 = CorpusOps.reservoirSample(spark, sf, k = 40).collect()
    assert(k40.map(_.getAs[Long]("doc_id")).toSeq ===
      k100.take(40).map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("contaminationCheck: every seeded (train, bench) pair surfaces with ≥2 shared 8-grams") {
    val ids = Tables.documents(spark, sf).select($"doc_id").as[Long].collect().toSet
    val benchIds = ids.filter(_ % CorpusOps.benchMod == 0)
    val seededTrain = ids.filter(i => i % CorpusOps.contamMod == 0 && i % CorpusOps.benchMod != 0)
    assert(benchIds.nonEmpty && seededTrain.nonEmpty)
    val out = CorpusOps.contaminationCheck(spark, sf).collect()
      .map(r => (r.getAs[Long]("train_doc"), r.getAs[Long]("bench_doc")) ->
        r.getAs[Long]("n_shared")).toMap
    // the 9-word canary carries exactly two distinct 8-grams; every seeded
    // train doc must collide with every bench doc on at least those two
    for (t <- seededTrain; b <- benchIds)
      assert(out.getOrElse((t, b), 0L) >= 2L, s"missed seeded pair ($t, $b)")
    // no train doc reports more shingles than it has
    out.foreach { case ((t, _), n) => assert(n >= 1L && t % CorpusOps.benchMod != 0) }
  }

  test("snapshotMerge: merged state has no deleted ids, all re-adds, amended fingerprints") {
    import spark.implicits._
    val out = CorpusOps.snapshotMerge(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    val base = Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    base.keys.foreach { id =>
      if (id % 5 === 4L) assert(!out.contains(id), s"deleted $id survived")
      else {
        assert(out.contains(id))
        if (id % 7 === 0L) assert(out(id) !== base(id), s"amended $id kept old fp")
        else assert(out(id) === base(id))
      }
      if (id % 11 === 0L) assert(out(id + 300000L) === base(id), s"re-add $id missing")
    }
    assert(out.size === base.count(_._1 % 5 != 4) + base.count(_._1 % 11 == 0))
  }

  test("robustOutliers: MAD and outlier counts behave on a constructed distribution") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-mad").toString
    // source A: 9 docs at 100 chars + one far outlier; MAD = 0 for the
    // tight cluster is avoided by a ±1 spread
    val rows = (0L until 9L).map(i => (i, "t", "en", "A", 100L + (i % 3) - 1L)) :+
      ((9L, "t", "en", "A", 10000L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.robustOutliers(spark, tmp).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 10L)
    assert(r.getAs[Double]("median_chars") === 100.0)
    assert(r.getAs[Double]("mad_chars") === 1.0)
    assert(r.getAs[Long]("n_outliers") === 1L) // only the 10000-char doc
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("chunkDocuments: windows cover every token; overlaps equal w−s; tails shortened") {
    import spark.implicits._
    val out = CorpusOps.chunkDocuments(spark, sf).collect()
    val lens = Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens($"text")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    val (w, s) = (CorpusOps.chunkSize, CorpusOps.chunkStride)
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      val n = lens(id)
      val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.length === 1 + math.ceil(math.max(n - w, 0) / s.toDouble).toInt)
      sorted.foreach { r =>
        val st = r.getAs[Long]("start_tok"); val nt = r.getAs[Long]("n_tok")
        assert(st === r.getAs[Long]("chunk_id") * s + 1)
        assert(nt === math.min(w.toLong, n - (st - 1)))
        assert(r.getAs[String]("chunk_text").split(" ").length.toLong === nt)
      }
      // last chunk reaches the final token: full coverage
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tok") - 1 === n.toLong)
    }
    // every non-empty doc chunked
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length ===
      lens.count(_._2 > 0))
  }

  test("curriculumShards: rank is the exact (n_chars, doc_id) permutation; shards near-equal and ordered") {
    val out = CorpusOps.curriculumShards(spark, sf).collect()
    graft.CacheGuard.release()
    val n = out.length
    // rank is a permutation of 1..n
    assert(out.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to n.toLong))
    // rank agrees with the naive total order
    val byOrder = out.sortBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
    byOrder.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rnk") === i + 1L, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // shards are contiguous in rank order and sized within 1 of each other
    assert(byOrder.map(_.getAs[Long]("shard")).toSeq === byOrder.map(_.getAs[Long]("shard")).sorted.toSeq)
    val sizes = out.groupBy(_.getAs[Long]("shard")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"shard sizes $sizes")
    assert(out.map(_.getAs[Long]("shard")).distinct.sorted.toSeq === (0L to 9L))
  }

  test("incrementalAggMaintenance ≡ recomputing the summary from the v2 snapshot") {
    import spark.implicits._
    val got = CorpusOps.incrementalAggMaintenance(spark, sf).collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_len")))
    // recompute in-engine from the same change rules
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"source", $"text")
    val v2 = docs.filter($"doc_id" % 5 =!= 4)
      .select($"doc_id", $"source",
        when($"doc_id" % 7 === 0, concat($"text", lit(" v2-edit")))
          .otherwise($"text").as("text"))
      .unionByName(docs.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 300000L).as("doc_id"), $"source", $"text"))
    val want = v2.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(length($"text")), lit(0L)).as("sum_len"))
      .orderBy($"source").collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_len")))
    assert(got.toSeq === want.toSeq)
  }

  test("weightedSample: keys recompute from the hash uniform; cut is the global top-k") {
    import spark.implicits._
    val got = CorpusOps.weightedSample(spark, sf, k = 50).collect()
    assert(got.length === 50)
    // recompute every doc's A-ES key and check the reported 50 ARE the top 50
    val all = graft.Tables.documents(spark, sf)
      .filter($"n_chars" > 0)
      .select($"doc_id",
        graft.functions.TextFunctions.md5Hash32($"doc_id".cast("string"))
          .as("h"), $"n_chars")
      .collect()
      .map { r =>
        val ks = math.log((r.getLong(1) + 0.5) / 4294967296.0) / r.getLong(2)
        (r.getLong(0), math.rint(ks * 1e8) / 1e8)
      }
    val want = all.sortBy { case (id, ks) => (-ks, id) }.take(50).map(_._1).toSeq
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === want)
    got.foreach { r =>
      val direct = all.toMap.apply(r.getAs[Long]("doc_id"))
      assert(math.abs(r.getAs[Double]("ks") - direct) < 1e-7)
    }
  }

  test("weightedSample: top-k is TakeOrdered — the corpus is never globally sorted") {
    val plan = CorpusOps.weightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("fuzzyContamination: pair counts extend q61 and the scores replay from them") {
    val fuzzy = CorpusOps.fuzzyContamination(spark, sf).collect()
    val exact = CorpusOps.contaminationCheck(spark, sf).collect()
      .map(r => (r.getAs[Long]("train_doc"), r.getAs[Long]("bench_doc")) ->
        r.getAs[Long]("n_shared")).toMap
    assert(fuzzy.nonEmpty)
    // same pair set as the exact checker, same shared counts
    assert(fuzzy.length === exact.size)
    fuzzy.foreach { r =>
      val shared = r.getAs[Long]("n_shared")
      val nTrain = r.getAs[Long]("n_train")
      val nBench = r.getAs[Long]("n_bench")
      assert(shared === exact(
        (r.getAs[Long]("train_doc"), r.getAs[Long]("bench_doc"))))
      assert(shared >= 1L && shared <= math.min(nTrain, nBench))
      def d4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("jaccard") ===
        d4(shared.toDouble / (nTrain + nBench - shared)))
      assert(r.getAs[Double]("containment") === d4(shared.toDouble / nBench))
      assert(r.getAs[Double]("jaccard") <= r.getAs[Double]("containment"))
    }
  }

  test("tokenizerFertility: totals cover the corpus; in-vocab floor makes fertility ≥ 1") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val rows = CorpusOps.tokenizerFertility(spark, sf).collect()
    val totalWords = Tables.documents(spark, sf)
      .select(explode(tokens($"text"))).count()
    assert(rows.map(_.getAs[Long]("n_words")).sum === totalWords)
    rows.foreach { r =>
      val fertility = r.getAs[Double]("fertility")
      val oovRate = r.getAs[Double]("oov_rate")
      assert(fertility >= 1.0) // every word is ≥ 1 token
      assert(oovRate >= 0.0 && oovRate <= 1.0)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_words"))
    }
  }

  test("tokenizerFertility: vocab broadcasts — the corpus-side join never sort-merges") {
    val plan = CorpusOps.tokenizerFertility(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("paddingSweep: token mass is conserved and the sweep is monotone in max_len") {
    import spark.implicits._
    val rows = CorpusOps.paddingSweep(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("max_len")).toSeq ===
      CorpusOps.packSweepLens.map(_.toLong))
    val totalTokens = Tables.documents(spark, sf)
      .select(sum(size(graft.functions.TextFunctions.tokens($"text"))
        .cast("long"))).head().getLong(0)
    rows.foreach { r =>
      val (l, nd) = (r.getAs[Long]("max_len"), r.getAs[Long]("n_docs"))
      val kept = nd * l - r.getAs[Long]("pad_tokens")
      // kept + lost = the corpus's token count, at every candidate length
      assert(kept + r.getAs[Long]("tokens_lost") === totalTokens)
      val u = r.getAs[Double]("utilization")
      assert(u > 0.0 && u <= 1.0)
      assert(r.getAs[Long]("n_truncated") <= nd)
    }
    // longer contexts: truncation can only fall, padding only grow
    val byLen = rows.sortBy(_.getAs[Long]("max_len"))
    byLen.zip(byLen.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_truncated") >= b.getAs[Long]("n_truncated"))
      assert(a.getAs[Long]("tokens_lost") >= b.getAs[Long]("tokens_lost"))
      assert(a.getAs[Long]("pad_tokens") <= b.getAs[Long]("pad_tokens"))
    }
  }

  test("batchNovelty: batch coverage and seen/novel partition; rates replay") {
    import spark.implicits._
    val rows = CorpusOps.batchNovelty(spark, sf).collect()
    val nBatch = Tables.documents(spark, sf)
      .filter($"doc_id" % CorpusOps.batchNovMod === 0)
      .filter(size(graft.functions.TextFunctions.tokens($"text")) >= 5)
      .count()
    assert(rows.length.toLong === nBatch)
    rows.foreach { r =>
      val (ns, seen, novel) = (r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_seen"), r.getAs[Long]("n_novel"))
      assert(seen + novel === ns)
      assert(seen >= 0L && novel >= 0L)
      assert(r.getAs[Double]("novelty_rate") ===
        BigDecimal(novel.toDouble / ns).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the history genuinely absorbs some batch spans and misses others
    assert(rows.exists(_.getAs[Long]("n_seen") > 0L))
    assert(rows.exists(_.getAs[Long]("n_novel") > 0L))
  }

  test("decontaminate: verdicts replay q133's pair relation; all train docs surface") {
    import spark.implicits._
    val rows = CorpusOps.decontaminate(spark, sf).collect()
    val nTrain = Tables.documents(spark, sf)
      .filter($"doc_id" % CorpusOps.benchMod =!= 0).count()
    assert(rows.length.toLong === nTrain)
    val pairAgg = CorpusOps.fuzzyContamination(spark, sf).collect()
      .groupBy(_.getAs[Long]("train_doc"))
      .view.mapValues(ps => (ps.length.toLong,
        ps.map(_.getAs[Double]("containment")).max)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (hits, maxC) = pairAgg.getOrElse(id, (0L, 0.0))
      assert(r.getAs[Long]("n_bench_hits") === hits)
      assert(r.getAs[Double]("max_containment") === maxC)
      assert(r.getAs[String]("status") ===
        (if (maxC >= CorpusOps.contamDropTau) "drop" else "keep"))
    }
    // the threshold genuinely splits the corpus
    assert(rows.exists(_.getAs[String]("status") == "drop"))
    assert(rows.count(_.getAs[String]("status") == "keep") >
      rows.length / 2)
  }

  test("noveltyCurve: decile mass re-sums to the span relation; cumulatives consistent") {
    import spark.implicits._
    val rows = CorpusOps.noveltyCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val spans = Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("tk"))
      .filter(size($"tk") >= 5)
      .select(explode(transform(sequence(lit(0), (size($"tk") / 5).cast("int") - 1),
        i => md5(array_join(slice($"tk", i * 5 + 1, lit(5)), " ")))).as("s"))
    assert(rows.map(_.getAs[Long]("n_spans")).sum === spans.count())
    assert(rows.map(_.getAs[Long]("n_new")).sum ===
      spans.select($"s").distinct().count())
    var (cs, cn) = (0L, 0L)
    rows.foreach { r =>
      val (ns, nn) = (r.getAs[Long]("n_spans"), r.getAs[Long]("n_new"))
      assert(nn >= 0L && nn <= ns)
      cs += ns; cn += nn
      assert(r.getAs[Long]("cum_spans") === cs)
      assert(r.getAs[Long]("cum_new") === cn)
      val rate = r.getAs[Double]("novelty_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the first decile is all-novel relative to nothing before it only in
    // cum terms: cum_distinct_frac at decile 0 equals its novelty_rate
    assert(rows.head.getAs[Double]("cum_distinct_frac") ===
      rows.head.getAs[Double]("novelty_rate"))
  }

  test("tokenBudgetPlan: allocation stays inside the budget and replays the formula") {
    import spark.implicits._
    val rows = CorpusOps.tokenBudgetPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    // floor allocation can never exceed the budget
    assert(rows.map(_.getAs[Long]("target_tokens")).sum <=
      CorpusOps.mixBudgetTokens)
    // weights normalize (up to the 6-dp display rounding)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(totalTokens === Tables.documents(spark, sf)
      .select(sum(size(graft.functions.TextFunctions.tokens($"text"))
        .cast("long"))).head().getLong(0))
    rows.foreach { r =>
      val (t, tgt) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("target_tokens"))
      assert(r.getAs[Double]("epochs") ===
        BigDecimal(tgt.toDouble / t).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Boolean]("oversampled") === (tgt > t))
      // α=0.5 squashing: every slice's weight sits between its natural
      // share and the uniform share (the temperature-sampling guarantee)
      val natural = t.toDouble / totalTokens
      val uniform = 1.0 / rows.length
      val w = r.getAs[Double]("weight")
      assert(w >= math.min(natural, uniform) - 1e-6, r.getAs[String]("lang"))
      assert(w <= math.max(natural, uniform) + 1e-6, r.getAs[String]("lang"))
    }
  }

  test("sourceKlDrift: KL is non-negative per source; term counts are the source vocab") {
    import spark.implicits._
    val rows = CorpusOps.sourceKlDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val vocab = Tables.documents(spark, sf)
      .select($"source",
        explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .groupBy($"source").agg(countDistinct($"t").as("v")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("v")).toMap
    rows.foreach { r =>
      // Gibbs: KL ≥ 0 up to the micro-unit quantization slack
      assert(r.getAs[Double]("kl") >= -1e-3, r.getAs[String]("source"))
      assert(r.getAs[Long]("n_terms") === vocab(r.getAs[String]("source")))
    }
    // the sources genuinely differ from the corpus somewhere
    assert(rows.exists(_.getAs[Double]("kl") > 0.0))
  }

  test("dsirWeights: target-language documents score most target-like") {
    import spark.implicits._
    val rows = CorpusOps.dsirWeights(spark, sf).collect()
    graft.CacheGuard.release()
    assert(rows.nonEmpty)
    val (tgt, rest) = rows.partition(
      _.getAs[String]("lang") == CorpusOps.dsirTargetLang)
    assert(tgt.nonEmpty && rest.nonEmpty)
    def meanW(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("weight")).sum / rs.length
    // the DSIR premise: importance weights separate the target domain
    assert(meanW(tgt) > meanW(rest),
      s"target ${meanW(tgt)} vs rest ${meanW(rest)}")
    // weights are per-bigram sums: n_feats = doc bigram count
    val bigrams = Tables.documents(spark, sf)
      .select($"doc_id", size(graft.functions.TextFunctions.wordShingles(
        graft.functions.TextFunctions.tokens($"text"), 2)).cast("long").as("nb"))
      .filter($"nb" > 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nb")).toMap
    assert(rows.length === bigrams.size)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_feats") === bigrams(r.getAs[Long]("doc_id"))))
  }

  test("dsirWeights: the feature-weight table broadcasts into the scoring join") {
    val plan = CorpusOps.dsirWeights(spark, sf)
      .queryExecution.executedPlan.toString
    graft.CacheGuard.release()
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("clusterBudgetPlan: every doc allocated once; budget conserved; q155 arithmetic per cluster") {
    import spark.implicits._
    val rows = CorpusOps.clusterBudgetPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    // every embedded doc lands in exactly one cluster
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.embeddings(spark, sf).count())
    // floor allocation: never over budget, and the total shortfall is
    // bounded by one token per cluster (each floor loses < 1)
    val allocated = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(allocated <= CorpusOps.mixBudgetTokens)
    assert(CorpusOps.mixBudgetTokens - allocated < rows.length,
      s"allocated $allocated of ${CorpusOps.mixBudgetTokens}")
    // weights normalize (up to 6-dp display rounding)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4)
    // token mass equals the corpus total for the embedded docs
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(totalTokens === Tables.documents(spark, sf)
      .join(Tables.embeddings(spark, sf), $"doc_id" === $"vec_id")
      .select(sum(size(graft.functions.TextFunctions.tokens($"text"))
        .cast("long"))).head().getLong(0))
    // per-row q155 formula replay + the α=0.5 temperature guarantee:
    // each cluster's weight sits between its natural and uniform share
    rows.foreach { r =>
      val (t, tgt) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("target_tokens"))
      assert(r.getAs[Double]("epochs") ===
        BigDecimal(tgt.toDouble / t).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Boolean]("oversampled") === (tgt > t))
      val natural = t.toDouble / totalTokens
      val uniform = 1.0 / rows.length
      val w = r.getAs[Double]("weight")
      assert(w >= math.min(natural, uniform) - 1e-6,
        s"cluster ${r.getAs[Long]("cluster")}")
      assert(w <= math.max(natural, uniform) + 1e-6,
        s"cluster ${r.getAs[Long]("cluster")}")
    }
  }

  test("clusterBudgetPlan: assignment is map-side against the broadcast codebook — the corpus never shuffles before the O(nlist) rollup") {
    val plan = CorpusOps.clusterBudgetPlan(spark, sf)
      .queryExecution.executedPlan.toString
    // no sort-merge join anywhere: the doc-token join hashes on the
    // already-tiny assigned relation or broadcasts, and no Window exists
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("WindowExec"), plan.take(3000))
  }

  test("bm25Rank: exact replay of the k1=1.2/b=0.75 rational form; ranking and tie-break deterministic") {
    val rows = CorpusOps.bm25Rank(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side replay from raw tokens
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toLong
    val t = docs.map(_._2.length.toLong).sum
    val tfm = docs.flatMap { case (id, tk) =>
      tk.groupBy(identity).map { case (w, g) => (id, w, g.length.toLong, tk.length.toLong) }
    }
    val dfm = tfm.groupBy(_._2).map { case (w, g) => w -> g.length.toLong }
    def u(tf: Long, df: Long, dl: Long): Long = {
      val idf = BigDecimal(math.log((2 * n + 2).toDouble / (2 * df + 1).toDouble))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      val frac = (44.0 * t * tf) / (20.0 * t * tf + 6.0 * t + 18.0 * dl * n)
      math.floor(idf * frac * 1e4 + 0.5).toLong
    }
    val expect = CorpusOps.bm25Queries.groupBy(_._1).map { case (q, qt) =>
      val terms = qt.map(_._2).toSet
      val scores = tfm.filter(x => terms(x._2))
        .groupBy(_._1)
        .map { case (id, g) => id -> g.map(x => u(x._3, dfm(x._2), x._4)).sum }
      q -> scores.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(CorpusOps.bm25K)
    }
    rows.foreach { r =>
      val (q, rk) = (r.getAs[Long]("query_id"), r.getAs[Long]("rk"))
      val (eid, es) = expect(q)(rk.toInt - 1)
      assert(r.getAs[Long]("doc_id") === eid, s"q$q rk$rk")
      assert(r.getAs[Long]("score_u4") === es, s"q$q rk$rk")
    }
    assert(rows.length === expect.values.map(_.length).sum)
  }

  test("bm25Rank: ranking pre-reduces through the bounded top-k aggregate — no Window, no corpus-keyed SortMergeJoin") {
    val plan = CorpusOps.bm25Rank(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("hybridRrf: seeded fixture — fusion recovers the gold that each single retriever ranks below its deceivers") {
    // Gold docs 10–12 carry the probe term once AND sit near the query
    // embedding; lexical deceivers 20–21 spam the term with orthogonal
    // embeddings (BM25 ranks them 1–2); semantic deceivers 30–31 hug the
    // query vector with no term (cosine ranks them 1–2). RRF's both-list
    // bonus (2·1/(60+3) > 1/(60+1)) must put the gold at fused 1–3.
    val tmp = java.nio.file.Files.createTempDirectory("rrf").toString
    import spark.implicits._
    def doc(id: Long, text: String) = (id, text, "en", "src0", text.length.toLong)
    val docs = Seq(
      doc(1L, "anchor doc for the query id itself"),
      doc(10L, "zzq pad pad pad pad"), doc(11L, "zzq pad pad pad pad"),
      doc(12L, "zzq pad pad pad pad"),
      doc(20L, "zzq zzq zzq zzq zzq"), doc(21L, "zzq zzq zzq zzq pad")) ++
      (30L to 31L).map(i => doc(i, "pad pad pad pad pad")) ++
      (40L to 49L).map(i => doc(i, "pad pad pad pad pad"))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def vec(c: Double) = Seq(c.toFloat, math.sqrt(1 - c * c).toFloat, 0f, 0f)
    val embs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0),
      (10L, vec(0.97), 0), (11L, vec(0.96), 0), (12L, vec(0.95), 0),
      (20L, Seq(0f, 0f, 1f, 0f), 1), (21L, Seq(0f, 0f, 1f, 0f), 1),
      (30L, vec(0.999), 0), (31L, vec(0.998), 0)) ++
      (40L to 49L).map(i => (i, Seq(0f, 0f, 0f, 1f), 2))
    embs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val queries = Seq((1L, "zzq"))
    val gold = Set(10L, 11L, 12L)

    val fused = CorpusOps.hybridRrf(spark, tmp, queries, k = 5).collect()
    assert(fused.map(_.getAs[Long]("rk")).toSeq === (1L to 5L))
    // fused precision@3 = 1.0: the gold, in both-lists-bonus order
    assert(fused.take(3).map(_.getAs[Long]("doc_id")).toSeq === Seq(10L, 11L, 12L))
    // exact integer RRF scores: floor(1e6/(60+r)+0.5) summed per list
    def c(r: Long) = math.floor(1e6 / (60.0 + r) + 0.5).toLong
    assert(fused.take(3).map(_.getAs[Long]("rrf_u6")).toSeq ===
      Seq(2 * c(3), 2 * c(4), 2 * c(5)))
    // ranks 4–5: one deceiver from each list, equal score, doc_id tie
    assert(fused.drop(3).map(_.getAs[Long]("doc_id")).toSeq === Seq(20L, 30L))
    assert(fused.drop(3).map(_.getAs[Long]("rrf_u6")).toSeq === Seq(c(1), c(1)))

    // BM25 alone: deceivers 20–21 outrank the gold → precision@3 = 1/3
    val lex = CorpusOps.bm25Rank(spark, tmp, queries, k = 5).collect()
    assert(lex.take(2).map(_.getAs[Long]("doc_id")).toSeq === Seq(20L, 21L))
    assert(lex.take(3).count(r => gold(r.getAs[Long]("doc_id"))) === 1)
    // dense alone: gold sits at cosine ranks 3–5 (deceivers 30–31 above)
    // → precision@3 = 1/3, visible in the fused rows' dense_rk column
    val byDoc = fused.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc(10L).getAs[Long]("dense_rk") === 3L)
    assert(byDoc(30L).getAs[Long]("dense_rk") === 1L)
    assert(byDoc(30L).getAs[Long]("bm25_rk") === 0L) // absent from lexical
    assert(byDoc(20L).getAs[Long]("dense_rk") === 0L) // absent from dense
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("hybridRrf: fusion window is bounded — no corpus-sized exchange above the two top-k inputs") {
    val plan = CorpusOps.hybridRrf(spark, sf)
      .queryExecution.executedPlan.toString
    // the only WindowExec input is the full-outer join of two ≤q×k
    // relations; assert no SortMergeJoin handles a corpus-keyed side
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("stratifiedSplit: exact floor counts per stratum, ranks a permutation, deterministic") {
    val out = CorpusOps.stratifiedSplit(spark, sf).collect()
    assert(out.length === graft.Tables.documents(spark, sf).count().toInt)
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val n = rs.length.toLong
      val (nv, nt) = (n / 10, n / 10)
      val splits = rs.groupBy(_.getAs[String]("split"))
        .view.mapValues(_.length.toLong).toMap
      assert(splits.getOrElse("val", 0L) === nv, s"$lang val")
      assert(splits.getOrElse("test", 0L) === nt, s"$lang test")
      assert(splits.getOrElse("train", 0L) === n - nv - nt, s"$lang train")
      // ranks are exactly 1..n within the stratum
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to n))
      rs.foreach { r =>
        assert(r.getAs[Long]("n_train") === n - nv - nt)
        assert(r.getAs[Long]("n_val") === nv)
        assert(r.getAs[Long]("n_test") === nt)
      }
    }
    // md5 assignment is re-run stable
    val again = CorpusOps.stratifiedSplit(spark, sf).collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toSeq ===
      again.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toSeq)
  }

  test("paretoFrontier: equals the naive pairwise dominance test, frontier is a staircase") {
    import spark.implicits._
    val out = CorpusOps.paretoFrontier(spark, sf).collect()
    assert(out.nonEmpty)
    // naive replay: recompute (q_u4, n_chars) per doc and test dominance
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars", $"text").collect().map { r =>
        val toks = Option(r.getAs[String]("text")).getOrElse("")
          .toLowerCase.split("\\s+").filter(_.nonEmpty)
        val stop = toks.count(Set("the", "a", "of", "and", "to", "in"))
        val q = if (toks.isEmpty) 0.0
          else math.min(1.0, toks.length / 100.0) * 0.6 +
            stop.toDouble / math.max(toks.length, 1) * 0.4
        val u = math.floor(math.floor(q * 1e4 + 0.5) / 1e4 * 1e4 + 0.5).toLong
        (r.getAs[Long]("doc_id"), u, r.getAs[Long]("n_chars"))
      }
    val want = docs.filter { case (_, q, l) =>
      !docs.exists { case (_, oq, ol) =>
        oq >= q && ol <= l && (oq > q || ol < l) }
    }.map(_._1).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet === want)
    // staircase: higher-quality frontier points must pay strictly more
    // length (otherwise they would dominate the lower-quality point)
    val byQ = out.map(r => (r.getAs[Long]("q_u4"), r.getAs[Long]("n_chars")))
      .distinct.sortBy(_._1)
    byQ.sliding(2).foreach {
      case Array((q1, l1), (q2, l2)) if q1 < q2 => assert(l2 > l1)
      case _ => ()
    }
  }

  test("prfExpandRank: dominates 2x the base ranking on common docs; expansion fires") {
    val base = CorpusOps.bm25Rank(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("score_u4")).toMap
    val prf = CorpusOps.prfExpandRank(spark, sf).collect()
    val qids = CorpusOps.bm25Queries.map(_._1).distinct.toSet
    assert(prf.map(_.getAs[Long]("query_id")).toSet === qids)
    prf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(ranks === (1L to ranks.length))
      val scores = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("score_u4"))
      assert(scores.toSeq === scores.sortBy(-_).toSeq)
    }
    // original terms carry weight 2 and expansion contributions are ≥ 0,
    // so any doc in both top-k lists scores ≥ 2x its base score; strict
    // inequality somewhere proves an expansion term actually matched
    val common = prf.flatMap { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))
      base.get(k).map(b => (r.getAs[Long]("score_u4"), b))
    }
    assert(common.nonEmpty)
    common.foreach { case (p, b) => assert(p >= 2 * b) }
    assert(common.exists { case (p, b) => p > 2 * b },
      "no expansion term matched any common doc")
  }

  test("tokenBudgetAllocation: greedy in quality order, budget exactly exhausted, one partial boundary source") {
    val out = CorpusOps.tokenBudgetAllocation(spark, sf).collect()
    assert(out.nonEmpty)
    // rank order is (quality desc, source) and taken amounts are greedy:
    // full supplies down the ranking, one partial source, zeros after
    val byRank = out.sortBy(_.getAs[Int]("rk"))
    val qualities = byRank.map(_.getAs[Long]("mean_q_u4"))
    assert(qualities.zip(qualities.tail).forall { case (a, b) => a >= b })
    val supplies = byRank.map(_.getAs[Long]("src_tokens"))
    val taken = byRank.map(_.getAs[Long]("tokens_taken"))
    val budget = supplies.sum / CorpusOps.budgetDen
    assert(taken.sum === budget) // supplies cover B by construction (B = total/4)
    val partial = byRank.indices.filter(i => taken(i) > 0 && taken(i) < supplies(i))
    assert(partial.size <= 1)
    val cut = byRank.indexWhere(r => r.getAs[Long]("tokens_taken") === 0L)
    byRank.zipWithIndex.foreach { case (r, i) =>
      if (cut >= 0 && i >= cut) assert(r.getAs[Long]("tokens_taken") === 0L)
    }
    // greedy = prefix sums: taken(i) == clamp(B - sum(supplies before i))
    var prior = 0L
    byRank.zipWithIndex.foreach { case (r, _) =>
      val expect = math.max(0L, math.min(r.getAs[Long]("src_tokens"), budget - prior))
      assert(r.getAs[Long]("tokens_taken") === expect)
      prior += r.getAs[Long]("src_tokens")
    }
  }

  test("sftPairs: parent convention matches q190, election is (quality desc, id) argmax, hygiene cuts hold") {
    val out = CorpusOps.sftPairs(spark, sf).collect()
    assert(out.nonEmpty)
    val byPrompt = out.map(r => r.getAs[Long]("prompt_doc") -> r).toMap
    assert(byPrompt.size === out.length) // one elected pair per prompt
    out.foreach { r =>
      assert(r.getAs[Long]("prompt_tokens") >= CorpusOps.sftMinTokens)
      assert(r.getAs[Long]("response_tokens") >= CorpusOps.sftMinTokens)
      assert(r.getAs[Long]("n_candidates") >= 1L)
      // the parent convention: the elected reply really points at its prompt
      val c = r.getAs[Long]("response_doc")
      val pos = c % CorpusOps.sftBlock
      assert(pos != 0L)
      val h = { // TextFunctions.md5Hash32 driver twin
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(c.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 8), 16)
      }
      assert(r.getAs[Long]("prompt_doc") === c - pos + (h % pos))
    }
    // election replay on one busy prompt: no candidate beats the winner
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    val busy = out.maxBy(_.getAs[Long]("n_candidates"))
    assert(busy.getAs[Long]("n_candidates") > 1L)
    val toks = graft.functions.TextFunctions.tokens($"text")
    val q = floor(TextAnalysis.qualityExpr(size(toks).cast("long"),
      graft.functions.TextFunctions.stopwordCount(toks, TextAnalysis.stopwords).cast("long")) * 1e4
      + lit(0.5)).cast("long")
    val candidates = graft.Tables.documents(spark, sf)
      .select($"doc_id", q.as("q_u4"))
      .filter($"doc_id" % CorpusOps.sftBlock =!= 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val winner = busy.getAs[Long]("response_doc")
    val wq = busy.getAs[Long]("response_q_u4")
    assert(candidates(winner) === wq)
  }

  test("sampleLadder: rungs are NESTED subsets, counts replay the hash threshold exactly") {
    val sparkS = spark
    import sparkS.implicits._
    val out = CorpusOps.sampleLadder(spark, sf).collect()
    assert(out.map(_.getAs[Long]("rung_bp")).toSeq === CorpusOps.ladderBp)
    // monotone growth in every cumulative column (nesting)
    def col(name: String) = out.map(_.getAs[Long](name))
    Seq("n_docs", "n_tokens", "n_sources").foreach { c =>
      val v = col(c); assert(v.zip(v.tail).forall { case (a, b) => b >= a }, c)
    }
    // the 100% rung is the whole corpus
    val docs = graft.Tables.documents(spark, sf)
    assert(out.last.getAs[Long]("n_docs") === docs.count())
    // driver replay of the hash threshold at one interior rung
    def h32(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val ids = docs.select($"doc_id").as[Long].collect()
    val rung = CorpusOps.ladderBp(2) // 5%
    val expect = ids.count(id => h32(s"ladder:$id") % 10000L < rung).toLong
    assert(out(2).getAs[Long]("n_docs") === expect)
    assert(expect > 0) // the rung genuinely samples at this SF
  }

  test("prunedIndexAudit: f=100 reproduces q167 exactly; overlap monotone-ish and kept volume shrinks") {
    val sparkS = spark
    import sparkS.implicits._
    val out = CorpusOps.prunedIndexAudit(spark, sf).collect()
    val byKey = out.map(r => (r.getAs[Long]("pct"), r.getAs[Long]("query_id")) -> r).toMap
    val queries = CorpusOps.bm25Queries.map(_._1).distinct
    assert(out.length === CorpusOps.prunePcts.length * queries.length)
    // f=100: full self-overlap at the returned k
    queries.foreach { q =>
      val r = byKey((100L, q))
      assert(r.getAs[Long]("n_overlap_full") === r.getAs[Long]("k_returned"))
    }
    // the full rankings agree with the declared q167 top-k
    val full = CorpusOps.bm25Rank(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    queries.foreach { q =>
      assert(byKey((100L, q)).getAs[Long]("k_returned") === full(q).length.toLong)
    }
    // pruning only removes scored docs
    queries.foreach { q =>
      val v = CorpusOps.prunePcts.map(p => byKey((p, q)).getAs[Long]("n_scored_docs"))
      assert(v.zip(v.tail).forall { case (a, b) => a <= b })
    }
    // the audit is non-vacuous: somewhere pruning actually drops volume
    assert(queries.exists(q =>
      byKey((25L, q)).getAs[Long]("n_scored_docs") <
        byKey((100L, q)).getAs[Long]("n_scored_docs")))
  }

  test("matchedHoldout: quotas sum to E, Hamilton bound holds, selection replays the md5 rank") {
    val sparkS = spark
    import sparkS.implicits._
    val out = CorpusOps.matchedHoldout(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val n = docs.length.toLong
    val e = n / CorpusOps.holdoutDen
    // exact size: quotas sum to E (largest remainder fills every slot)
    assert(out.map(_.getAs[Long]("quota")).sum === e)
    out.foreach { r =>
      assert(r.getAs[Long]("n_selected") === r.getAs[Long]("quota"))
      // Hamilton bound: |quota/E - n_src/N| <= 1/E  (u4: <= 10000/E + 1)
      assert(r.getAs[Long]("share_err_u4") <= 10000L / e + 1L)
    }
    // selection replay on the largest source: smallest md5 ranks win
    def h32(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val big = out.maxBy(_.getAs[Long]("n_src"))
    val srcDocs = docs.filter(_._2 == big.getAs[String]("source")).map(_._1)
    val expect = srcDocs.sortBy(id => (h32(s"hold:$id"), id))
      .take(big.getAs[Long]("quota").toInt)
    assert(big.getAs[Long]("sel_id_sum") === expect.sum)
    assert(big.getAs[Long]("sel_id_min") === expect.min)
    assert(big.getAs[Long]("sel_id_max") === expect.max)
  }

  test("poissonBootstrap: replicate means bracket the true mean, weights replay the CDF grid") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    val out = CorpusOps.poissonBootstrap(spark, sf).collect()
    assert(out.length === CorpusOps.bootReplicates)
    val n = graft.Tables.documents(spark, sf).count()
    // Poisson(1) mass: every replicate's n_eff is near N (mean 1/doc)
    out.foreach { r =>
      val eff = r.getAs[Long]("n_eff")
      assert(eff > n / 2 && eff < n * 2, s"n_eff $eff vs N $n")
    }
    // the replicate means BRACKET the point estimate (CI non-degenerate
    // in both directions) and stay within a plausible band of it
    val toks = graft.functions.TextFunctions.tokens($"text")
    val trueMean = graft.Tables.documents(spark, sf)
      .select(floor(TextAnalysis.qualityExpr(size(toks).cast("long"),
        graft.functions.TextFunctions.stopwordCount(toks,
          TextAnalysis.stopwords).cast("long")) * 1e4 + lit(0.5))
        .cast("long").as("q")).agg(expr("sum(q) div count(*)"))
      .collect().head.getLong(0)
    val means = out.map(_.getAs[Long]("mean_q_u4"))
    assert(means.min <= trueMean && trueMean <= means.max)
    assert(means.distinct.length > 1) // genuinely resampled
    // one replicate replayed driver-side from the md5 grid
    def h32(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", floor(TextAnalysis.qualityExpr(
        size(toks).cast("long"),
        graft.functions.TextFunctions.stopwordCount(toks,
          TextAnalysis.stopwords).cast("long")) * 1e4 + lit(0.5))
        .cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val thr = CorpusOps.bootPoissonCdfU4
    def wOf(u: Long) = thr.indexWhere(u < _) match {
      case -1 => thr.length.toLong; case i => i.toLong
    }
    val b0 = docs.map { case (id, q) =>
      val w = wOf(h32(s"boot:0:$id") % 10000L); (w, w * q)
    }
    val r0 = out.find(_.getAs[Long]("b") === 0L).get
    assert(r0.getAs[Long]("n_eff") === b0.map(_._1).sum)
    assert(r0.getAs[Long]("mean_q_u4") ===
      b0.map(_._2).sum / math.max(b0.map(_._1).sum, 1L))
  }

  test("q267: cells partition each source's corpus; ratios are weighted, in range") {
    val out = CorpusOps.commonnessQualityMatrix(spark, sf).collect()
    assert(out.nonEmpty)
    val docsPerSource = graft.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val cellSum = out.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(cellSum === docsPerSource)
    out.foreach { r =>
      val c = r.getAs[Long]("common_u4")
      assert(c >= 0L && c <= 10000L)
      assert(r.getAs[Long]("tokens_per_doc") > 0L)
    }
    // both Gopher verdicts are populated (non-vacuity of the split)
    assert(out.map(_.getAs[Boolean]("gopher_pass")).toSet === Set(true, false))
  }

  test("q268: both policies partition the corpus; RRD spread is bounded by the largest doc") {
    val out = CorpusOps.balancedShards(spark, sf).collect()
    assert(out.length === CorpusOps.balancedShardCount)
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).cast("long").as("nt"))
      .collect().map(_.getAs[Long]("nt"))
    assert(out.map(_.getAs[Long]("rr_docs")).sum === docs.length.toLong)
    assert(out.map(_.getAs[Long]("hash_docs")).sum === docs.length.toLong)
    assert(out.map(_.getAs[Long]("rr_tokens")).sum === docs.sum)
    assert(out.map(_.getAs[Long]("hash_tokens")).sum === docs.sum)
    // round-robin-decreasing telescopes: max-min shard load <= max doc
    val rr = out.map(_.getAs[Long]("rr_tokens"))
    assert(rr.max - rr.min <= docs.max,
      s"RRD spread ${rr.max - rr.min} exceeds largest doc ${docs.max}")
    // and beats hash sharding on this corpus (the report's point)
    val hs = out.map(_.getAs[Long]("hash_tokens"))
    assert(rr.max - rr.min <= hs.max - hs.min)
  }

  test("q284: UniMax water-filling — budget exhausted exactly, caps respected, level optimal") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val out = CorpusOps.unimaxAllocation(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    // independent per-language mass recount
    val mass = Tables.documents(spark, sf)
      .select($"lang", size(tokens($"text")).cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = mass.values.sum * CorpusOps.unimaxBudgetVolumes
    out.foreach { r =>
      val l = r.getAs[String]("lang")
      assert(r.getAs[Long]("mass") === mass(l))
      assert(r.getAs[Long]("cap") === mass(l) * CorpusOps.unimaxEpochCap)
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("cap"))
      assert(r.getAs[Long]("alloc") >= 0L)
      assert(r.getAs[Long]("epochs_u4") ===
        r.getAs[Long]("alloc") * 10000L / math.max(mass(l), 1L))
    }
    // the water-filling contract: Σ alloc = B exactly (integer residual
    // dealt), bound languages sit at cap ≤ level, unbound within 1 of
    // the level and never below a bound cap
    assert(out.map(_.getAs[Long]("alloc")).sum === budget)
    val level = out.head.getAs[Long]("water_level")
    assert(out.forall(_.getAs[Long]("water_level") === level))
    val (bound, unbound) = out.partition(_.getAs[Boolean]("bound"))
    assert(bound.forall(r => r.getAs[Long]("cap") <= level))
    unbound.foreach { r =>
      val a = r.getAs[Long]("alloc")
      assert(a === level || a === level + 1L, s"${r.getAs[String]("lang")}")
    }
    // the gate corpus is genuinely skewed: at least one language binds
    // at its epoch cap and at least one takes the level
    assert(bound.nonEmpty && unbound.nonEmpty,
      "fixture must exercise both branches")
  }

  test("q295: padding waste — bucket replay from sorted lengths; waste monotone in bucket count") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val out = CorpusOps.paddingWasteTable(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.length === CorpusOps.padBucketCounts.length)
    val lens = Tables.documents(spark, sf)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).map(_._1) // (length, doc_id) global rank order
    val n = lens.length.toLong
    val byK = out.map(r => r.getAs[Long]("k") -> r).toMap
    CorpusOps.padBucketCounts.map(_.toLong).foreach { k =>
      val buckets = lens.zipWithIndex.groupBy { case (_, i) =>
        i.toLong * k / n }
      val padded = buckets.values.map(b =>
        b.map(_._1).max * b.length).sum
      val raw = lens.sum
      val r = byK(k)
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("raw_tokens") === raw)
      assert(r.getAs[Long]("padded_tokens") === padded)
      assert(r.getAs[Long]("waste_tokens") === padded - raw)
      assert(r.getAs[Long]("waste_bp") ===
        (padded - raw) * 10000L / math.max(padded, 1L))
    }
    // k=1 pads everything to the global max; more buckets never waste
    // more (equal-population split by rank is nested enough to be
    // monotone on the doubling ladder)
    assert(byK(1L).getAs[Long]("padded_tokens") === lens.max * n)
    val wastes = CorpusOps.padBucketCounts.map(k =>
      byK(k.toLong).getAs[Long]("waste_tokens"))
    assert(wastes === wastes.sorted.reverse,
      s"waste not monotone: $wastes")
  }

  test("q296: Dirichlet QL — full driver replay of the decomposed scoring and the top-k cut") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val out = CorpusOps.dirichletQlRank(spark, sf).collect()
    graft.CacheGuard.release()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", tokens($"text").as("tk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val t = docs.map(_._2.size.toLong).sum
    val terms = CorpusOps.bm25Queries.map(_._2).distinct.toSet
    val ctf = docs.flatMap(_._2).filter(terms.contains)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val mu = CorpusOps.qlMu
    def snap(x: Double): Long =
      math.floor(BigDecimal(math.log(x))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6
        + 0.5).toLong
    val byQuery = CorpusOps.bm25Queries.groupBy(_._1)
    val want = byQuery.map { case (qid, qterms) =>
      val nq = qterms.size.toLong
      val scores = docs.flatMap { case (id, tk) =>
        val dl = tk.size.toLong
        val matches = qterms.map(_._2).flatMap { w =>
          val tf = tk.count(_ == w).toLong
          if (tf == 0) None
          else Some(snap(1.0 + (tf * t).toDouble / (mu * ctf(w)).toDouble))
        }
        if (matches.isEmpty) None
        else Some(id -> (matches.sum +
          nq * snap(mu.toDouble / (dl + mu).toDouble)))
      }
      qid -> scores.sortBy { case (id, s) => (-s, id) }
        .take(CorpusOps.bm25K).toSeq
    }
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rows) =>
      val got = rows.sortBy(_.getAs[Long]("rk"))
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_u6"))
        .toSeq
      assert(got === want(qid), s"query $qid")
    }
  }

  test("epochShuffle: full driver replay of the md5 shard assignment; shards partition both epochs") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val assign = docs.map { case (id, lang) =>
      (h32(s"$id:0") % 8, h32(s"$id:1") % 8, lang) }
    val out = CorpusOps.epochShuffle(spark, sf).collect()
    // shards partition the corpus in BOTH epochs (inner join kept every
    // populated epoch-0 shard at this SF)
    assert(out.map(_.getAs[Long]("n_e0")).sum === docs.length.toLong)
    assert(out.map(_.getAs[Long]("n_e1")).sum === docs.length.toLong)
    out.foreach { r =>
      val s = r.getAs[Long]("shard")
      val in0 = assign.filter(_._1 == s)
      assert(r.getAs[Long]("n_e0") === in0.length.toLong)
      assert(r.getAs[Long]("n_e1") === assign.count(_._2 == s).toLong)
      assert(r.getAs[Long]("n_stay") ===
        in0.count(_._2 == s).toLong)
      val byLang = in0.groupBy(_._3).map { case (l, g) => l -> g.length }
      assert(r.getAs[Long]("n_langs_e0") === byLang.size.toLong)
      // dominant language: max count, ties to the larger lang string
      val (topLang, topCnt) = byLang.toSeq.maxBy { case (l, c) => (c, l) }
      assert(r.getAs[String]("top_lang") === topLang)
      assert(r.getAs[Long]("top_share_bp") ===
        topCnt.toLong * 10000L / in0.length)
      assert(r.getAs[Long]("balance_bp") ===
        in0.length.toLong * 10000L * 8L / docs.length)
      // re-keying actually re-keys: staying is the exception, not the rule
      assert(r.getAs[Long]("n_stay") < r.getAs[Long]("n_e0"))
    }
  }
}
