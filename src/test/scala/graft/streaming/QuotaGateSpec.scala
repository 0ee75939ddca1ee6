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

  test("streaming gate equals the relational replay in doc_id order") {
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
  }
}
