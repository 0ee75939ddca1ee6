package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class QuotaGateSpec extends SparkSpec {

  test("quotaReplayBatch: admissions clip at the quota, never above") {
    val out = QuotaGate.quotaReplayBatch(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val arrived = r.getAs[Long]("n_arrived")
      val admitted = r.getAs[Long]("n_admitted")
      assert(admitted === math.min(arrived, QuotaGate.quotaPerBucket),
        s"key ${r.getAs[String]("source")}/${r.getAs[Long]("bucket")}")
      assert(r.getAs[Long]("last_admitted") >= 0L)
    }
    // the fixture is designed to CLIP at every SF — assert non-vacuity
    assert(out.forall(r =>
      r.getAs[Long]("n_admitted") < r.getAs[Long]("n_arrived")),
      "quota never clipped — fixture degenerated")
    // totals account for every arriving document
    val total = QuotaGate.quotaDocs(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_arrived")).sum === total)
  }

  test("runFold: split calls advance the counter exactly as one call") {
    val docs = (1L to 7L).map(i => QuotaDoc("s", 0L, i))
    val (o1, n1) = QuotaGate.runFold(docs.take(3), 0L, q = 4L)
    val (o2, n2) = QuotaGate.runFold(docs.drop(3), n1, q = 4L)
    val (all, nAll) = QuotaGate.runFold(docs, 0L, q = 4L)
    assert(o1 ++ o2 === all)
    assert(n2 === nAll && nAll === 4L)
    assert(all.map(v => v.doc_id -> v.admitted).toMap ===
      Map(1L -> true, 2L -> true, 3L -> true, 4L -> true,
        5L -> false, 6L -> false, 7L -> false))
  }

  /** Armed processing-time timers + the test harness's zero-interval
    * trigger make Spark's no-data micro-batches busy-spin re-checking
    * timers, so `processAllAvailable` never settles (see
    * [[QuotaGate.gateStream]]'s operational note) — disable them for
    * the streaming tests; timeouts then fire on the next data batch. */
  private def withoutNoDataBatches[T](body: => T): T = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming gate equals the relational replay in doc_id order") { withoutNoDataBatches {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val docs = QuotaGate.quotaDocs(spark, sf).as[QuotaDoc]
      .collect().sortBy(_.doc_id)
    val mem = MemoryStream[QuotaDoc]
    val q = QuotaGate.gateStream(mem.toDS())
      .writeStream.format("memory").queryName("quotagate")
      .outputMode("append").start()
    docs.grouped(math.max(1, docs.length / 3)).foreach { b =>
      mem.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    val streamed = spark.table("quotagate").as[QuotaVerdict].collect()
    q.stop()
    assert(streamed.length === docs.length)
    // fold the replay's per-key verdict from the same rollup contract:
    // admitted iff rank within (source, bucket) by doc_id <= quota
    val expect = docs.groupBy(d => (d.source, d.bucket)).toSeq.flatMap {
      case (_, ds) => ds.sortBy(_.doc_id).zipWithIndex.map {
        case (d, i) => d.doc_id -> (i < QuotaGate.quotaPerBucket)
      }
    }.toMap
    assert(streamed.map(v => v.doc_id -> v.admitted).toMap === expect)
  } }

  test("state TTL: a closed bucket's counter is evicted after expiry; in-flight buckets keep their verdicts") { withoutNoDataBatches {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    def run(name: String, ttlMs: Long, sleepMs: Long): Map[Long, Boolean] = {
      val mem = MemoryStream[QuotaDoc]
      val q = QuotaGate.gateStream(mem.toDS(), ttlMs = ttlMs)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // quota 4: 1–4 admitted, 5–6 rejected; arms the ("s", 0) timeout
      mem.addData((1 to 6).map(i => QuotaDoc("s", 0L, i.toLong)): _*)
      q.processAllAvailable()
      Thread.sleep(sleepMs) // let (or don't let) the TTL lapse
      // an UNRELATED key's batch: timeouts fire on any micro-batch, so
      // this is the sweep that evicts ("s", 0) iff it expired
      mem.addData(QuotaDoc("t", 1L, 100L))
      q.processAllAvailable()
      // same key again, after the sweep
      mem.addData((7 to 8).map(i => QuotaDoc("s", 0L, i.toLong)): _*)
      q.processAllAvailable()
      val out = spark.table(name).as[QuotaVerdict].collect()
        .filter(_.source == "s").map(v => v.doc_id -> v.admitted).toMap
      q.stop()
      out
    }
    // TTL lapsed → the counter is GONE: the late arrivals re-open the
    // bucket at zero and are admitted (the documented lateness
    // trade-off — and the proof the state was evicted, not merely idle)
    val evicted = run("quota_ttl_evict", ttlMs = 300L, sleepMs = 1200L)
    assert(evicted === Map(1L -> true, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> false, 7L -> true, 8L -> true))
    // same batch cadence, generous TTL → the bucket is still in flight:
    // the counter survives the sweep batch and the verdicts are EXACTLY
    // the no-eviction fold's — eviction never changes an in-flight
    // bucket's verdicts
    val inFlight = run("quota_ttl_live", ttlMs = 600000L, sleepMs = 0L)
    assert(inFlight === Map(1L -> true, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> false, 7L -> false, 8L -> false))
    val (foldOut, _) = QuotaGate.runFold(
      (1 to 8).map(i => QuotaDoc("s", 0L, i.toLong)), 0L)
    assert(inFlight === foldOut.map(v => v.doc_id -> v.admitted).toMap)
  } }
}
