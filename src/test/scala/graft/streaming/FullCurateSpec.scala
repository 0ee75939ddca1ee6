package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class FullCurateSpec extends SparkSpec {

  private def curatedMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("source"), r.getAs[String]("fp"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("q_u4"))).toMap

  private def floorsDf = graft.operators.TextAnalysis
    .sourceQualityFloor(spark, sf)
    .select("source", "thr_u4")

  test("composed gate replay: each stage genuinely cuts, and the near-dup stage works beyond the exact gate") {
    import org.apache.spark.sql.functions._
    val sparkS = spark
    import sparkS.implicits._
    val out = FullCurate.replayBatch(spark, sf)
    val ids = out.select($"doc_id").as[Long].collect().toSet
    graft.CacheGuard.release()
    assert(ids.nonEmpty)
    // exact stage: every +100000 re-arrival has an identical-fp
    // predecessor, so none survives
    assert(!ids.exists(id => id >= 100000L && id < FullCurate.editOffset))
    // near-dup stage: edited re-crawls pass the Bloom gate (new fp), so
    // any suppression among them is the near-dup gate's alone — and the
    // fixture must produce BOTH verdicts (suppressed and admitted-edit
    // would each be vacuous alone)
    val edits = FullCurate.fullDocs(spark, sf)
      .filter($"doc_id" >= FullCurate.editOffset)
    val editIds = edits.select($"doc_id").as[Long].collect().toSet
    graft.CacheGuard.release()
    assert(editIds.nonEmpty)
    val ndAdmitted = NearDupGate.replayOver(
        edits.toDF().filter(size($"sig") > 0).select($"doc_id", $"sig")
          .unionByName(FullCurate.fullDocs(spark, sf)
            .filter($"doc_id" < FullCurate.editOffset)
            .toDF().filter(size($"sig") > 0).select($"doc_id", $"sig")))
      .filter($"doc_id" >= FullCurate.editOffset)
    val suppressed = ndAdmitted.filter(!$"admitted").count()
    val admitted = ndAdmitted.filter($"admitted").count()
    graft.CacheGuard.release()
    assert(suppressed > 0, "no edit was near-dup-suppressed — stage vacuous")
    assert(admitted > 0, "every edit suppressed — admission path vacuous")
    // and the composed output agrees: no near-dup-suppressed edit is in it
    val sup = ndAdmitted.filter(!$"admitted")
      .select($"doc_id").as[Long].collect().toSet
    graft.CacheGuard.release()
    assert(ids.intersect(sup).isEmpty)
  }

  test("decision log: curated set matches q248, dropped_by follows stage order, every stage appears") {
    val sparkS = spark
    import sparkS.implicits._
    val log = FullCurate.decisionLog(spark, sf).collect()
    graft.CacheGuard.release()
    val curatedIds = FullCurate.replayBatch(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    graft.CacheGuard.release()
    // the log covers the whole composed corpus and agrees with q248
    assert(log.map(_.getAs[Long]("doc_id")).toSet.size === log.length)
    assert(log.filter(_.getAs[Boolean]("curated"))
      .map(_.getAs[Long]("doc_id")).toSet === curatedIds)
    // label consistency: 'none' ⟺ curated; a label names a failing stage
    log.foreach { r =>
      val label = r.getAs[String]("dropped_by")
      assert((label == "none") === r.getAs[Boolean]("curated"))
      label match {
        case "exact" => assert(!r.getAs[Boolean]("emitted"))
        case "neardup" =>
          assert(r.getAs[Boolean]("emitted") && !r.getAs[Boolean]("nd_ok"))
        case "length" => assert(r.getAs[Boolean]("emitted") &&
          r.getAs[Boolean]("nd_ok") && !r.getAs[Boolean]("len_ok"))
        case "floor" => assert(r.getAs[Boolean]("emitted") &&
          r.getAs[Boolean]("nd_ok") && r.getAs[Boolean]("len_ok") &&
          !r.getAs[Boolean]("floor_ok"))
        case "none" =>
      }
    }
    // the fixture exercises every drop reason (a stage whose label never
    // fires is a stage the log proves nothing about)
    val reasons = log.map(_.getAs[String]("dropped_by")).toSet
    assert(reasons === Set("none", "exact", "neardup", "length", "floor"))
  }

  test("funnel: stage columns + n_curated re-sum to n_arrived and replay the decision log") {
    val sparkS = spark
    import sparkS.implicits._
    val funnel = FullCurate.funnelReport(spark, sf).collect()
    graft.CacheGuard.release()
    val log = FullCurate.decisionLog(spark, sf).collect()
    graft.CacheGuard.release()
    assert(funnel.nonEmpty)
    funnel.foreach { r =>
      assert(r.getAs[Long]("n_exact_dropped") + r.getAs[Long]("n_neardup_dropped") +
        r.getAs[Long]("n_length_dropped") + r.getAs[Long]("n_floor_dropped") +
        r.getAs[Long]("n_curated") === r.getAs[Long]("n_arrived"))
    }
    val bySource = log.groupBy(_.getAs[String]("source"))
    funnel.foreach { r =>
      val rows = bySource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_arrived") === rows.length.toLong)
      def n(label: String) =
        rows.count(_.getAs[String]("dropped_by") == label).toLong
      assert(r.getAs[Long]("n_exact_dropped") === n("exact"))
      assert(r.getAs[Long]("n_neardup_dropped") === n("neardup"))
      assert(r.getAs[Long]("n_length_dropped") === n("length"))
      assert(r.getAs[Long]("n_floor_dropped") === n("floor"))
      assert(r.getAs[Long]("n_curated") === n("none"))
      assert(r.getAs[Long]("yield_u4") === n("none") * 10000L / rows.length)
    }
  }

  test("stream ≡ replay: both stateful branches + batch-local combine match the declared q248 over micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val docs = FullCurate.fullDocs(spark, sf).collect().sortBy(_.doc_id)
    graft.CacheGuard.release()
    val floors = floorsDf
    val outDir = java.nio.file.Files.createTempDirectory("graft-fc-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fc-ckpt").toString
    val mem = MemoryStream[FullDoc]
    val q = FullCurate.curatedStream(mem.toDS(), floors, outDir, ckpt)
    docs.grouped(math.max(1, docs.length / 3)).foreach { b =>
      mem.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = curatedMap(spark.read.parquet(outDir))
    val replay = curatedMap(FullCurate.replayBatch(spark, sf))
    graft.CacheGuard.release()
    assert(streamed === replay)
    assert(streamed.nonEmpty)
  }

  test("restart from the checkpoint on RocksDB: both gates' state survives, stream still ≡ replay") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = FullCurate.fullDocs(spark, sf).collect().sortBy(_.doc_id)
      graft.CacheGuard.release()
      val floors = floorsDf
      val outDir = java.nio.file.Files.createTempDirectory("graft-fcr-out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-fcr-ckpt").toString
      val mem = MemoryStream[FullDoc]
      def startQuery() = FullCurate.curatedStream(mem.toDS(), floors, outDir, ckpt)
      // incarnation 1 sees only originals; the re-arrivals and edits in
      // incarnation 2 are suppressed ONLY if the recovered Bloom words
      // and band histories continue the folds where the stop left them
      val (b1, b2) = docs.splitAt(docs.count(_.doc_id < 100000L))
      assert(b2.nonEmpty)
      val q1 = startQuery()
      mem.addData(b1.toIndexedSeq: _*)
      q1.processAllAvailable()
      q1.stop()
      val q2 = startQuery()
      mem.addData(b2.toIndexedSeq: _*)
      q2.processAllAvailable()
      q2.stop()
      val streamed = curatedMap(spark.read.parquet(outDir))
      val replay = curatedMap(FullCurate.replayBatch(spark, sf))
      graft.CacheGuard.release()
      assert(streamed === replay)
      // a lost exact-gate state would admit every +100000 re-arrival
      assert(!streamed.keySet.exists(id =>
        id >= 100000L && id < FullCurate.editOffset))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("phaseFunnel: the designed per-phase fate profile holds exactly") {
    val out = FullCurate.phaseFunnel(spark, sf).collect()
      .map(r => r.getAs[String]("phase") -> r).toMap
    graft.CacheGuard.release()
    assert(out.keySet === Set("base", "exact_rearrival", "edited_recrawl"))
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_exact_dropped") + r.getAs[Long]("n_neardup_dropped") +
        r.getAs[Long]("n_length_dropped") + r.getAs[Long]("n_floor_dropped") +
        r.getAs[Long]("n_curated") === r.getAs[Long]("n_arrived"))
    }
    // re-arrivals: every one dies at the exact gate (identical fp,
    // original always earlier) — the gate's defining guarantee
    val re = out("exact_rearrival")
    assert(re.getAs[Long]("n_exact_dropped") === re.getAs[Long]("n_arrived"))
    assert(re.getAs[Long]("n_curated") === 0L)
    // bases: never near-dup-dropped (nothing arrives before them at
    // est >= tau except other bases, which the corpus lacks)
    val base = out("base")
    assert(base.getAs[Long]("n_curated") > 0L)
    // edits: pass the exact gate (new fp, no bloom collision by design
    // fixture scale), split at the near-dup gate BOTH ways
    val ed = out("edited_recrawl")
    assert(ed.getAs[Long]("n_neardup_dropped") > 0L)
    assert(ed.getAs[Long]("n_neardup_dropped") <
      ed.getAs[Long]("n_arrived") - ed.getAs[Long]("n_exact_dropped"))
  }
}
