package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class ContamGateSpec extends SparkSpec {

  private def verdicts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_toks"), r.getAs[Long]("n_hit_grams"),
        r.getAs[Boolean]("admitted"))).toMap

  test("stream ≡ batch: the stateless gate gives identical per-doc verdicts across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val bm = graft.operators.CorpusOps.benchMod
    val cm = graft.operators.CorpusOps.contamMod
    val docs = ContamGate.canaryDocs(spark, sf)
      .filter($"doc_id" % bm =!= 0)
      .as[ContamDoc].collect().sortBy(_.doc_id) // collect-ok: gate-SF spec replay
    val bench = ContamGate.benchmarkGrams(spark, sf)
    val mem = MemoryStream[ContamDoc]
    val q = ContamGate.gate(mem.toDS().toDF(), bench)
      .writeStream.format("memory").queryName("contamgate")
      .outputMode("append").start()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    mem.addData(b1.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = verdicts(spark.table("contamgate"))
    q.stop()
    val batch = verdicts(ContamGate.contamGateBatch(spark, sf))
    assert(streamed === batch)
    // the gate genuinely fires: every canary-planted train doc (the q61
    // designed-contaminated slice) is dropped, and most docs are admitted
    val contaminated = docs.filter(_.doc_id % cm == 0)
    assert(contaminated.nonEmpty)
    contaminated.foreach(d => assert(!batch(d.doc_id)._3,
      s"contaminated train doc ${d.doc_id} must be gated"))
    assert(batch.values.count(_._3) > batch.size / 2)
    // the canary contributes exactly its 8-gram windows to the hit count
    val canaryGrams = graft.operators.CorpusOps.contaminationCanary
      .split(" ").length - ContamGate.gateGramN + 1
    assert(canaryGrams >= 1)
    contaminated.foreach(d => assert(batch(d.doc_id)._2 >= canaryGrams))
  }
}
