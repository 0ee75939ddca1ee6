package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SemanticGateSpec extends SparkSpec {

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Boolean]("admitted"), r.getAs[Long]("n_prior_semdups"),
        r.getAs[Long]("first_collider"))).toMap

  test("stream ≡ replay: per-bucket GroupState fold over micro-batches matches the declared batch query") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    val docs = SemanticGate.vecDocs(spark, sf).collect().sortBy(_.vec_id)
    val mem = MemoryStream[VecDoc]
    val q = SemanticGate.gateStream(mem.toDS())
      .writeStream.format("memory").queryName("semgate")
      .outputMode("append").start()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    mem.addData(b1.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq: _*)
    q.processAllAvailable()
    val streamed = verdictMap(
      SemanticGate.admittedOfBatch(spark.table("semgate")))
    q.stop()
    graft.CacheGuard.release()
    val replay = verdictMap(SemanticGate.replayBatch(spark, sf))
    graft.CacheGuard.release()
    assert(streamed === replay)
    // exact-duplicate recall is GUARANTEED (identical signs → identical
    // bucket): every id-shifted copy is suppressed at cosine 1.0, with
    // its own base as the earliest collider unless an even-earlier
    // semantic duplicate of the base exists
    val copies = docs.map(_.vec_id).filter(_ >= 100000L)
    assert(copies.nonEmpty)
    copies.foreach { id =>
      val (adm, n, fc) = replay(id)
      assert(!adm && n >= 1, s"copy $id not suppressed")
      assert(fc <= id - 100000L, s"copy $id collider $fc later than base")
    }
    // base vectors at gate SF are random — the vast majority admit
    val bases = docs.map(_.vec_id).filter(_ < 100000L)
    assert(bases.count(id => replay(id)._1) * 10 >= bases.length * 9)
  }

  test("groupCap: a hot bucket stops registering at the cap but later arrivals are still checked") {
    val e = Seq.fill(8)(0.5f)
    val docs = (1L to 5L).map(i => VecDoc(i, e, 7L))
    val (v1, entries) = SemanticGate.runFold(docs, Seq.empty, 7L, cap = 3)
    assert(entries.map(_.vec_id) === Seq(1L, 2L, 3L))
    assert(v1.find(_.vec_id == 4L).get.colliders === Seq(1L, 2L, 3L))
    assert(v1.find(_.vec_id == 5L).get.colliders === Seq(1L, 2L, 3L))
    // carried state continues the fold in a later micro-batch
    val (v2, e2) = SemanticGate.runFold(
      Seq(VecDoc(6L, e, 7L)), entries, 7L, cap = 3)
    assert(e2.size === 3)
    assert(v2.head.colliders === Seq(1L, 2L, 3L))
  }

  test("cosR4 replicates the declared query's quantized-cosine arithmetic") {
    // identical vectors: exactly 1.0 after quantization
    val a = Seq(0.3f, -0.7f, 0.11f, 2.5f)
    assert(SemanticGate.cosR4(a, a) === 1.0)
    // orthogonal vectors: exactly 0.0
    assert(SemanticGate.cosR4(Seq(1f, 0f), Seq(0f, 1f)) === 0.0)
    // a boundary case lands ON the r4 grid in both engines: construct
    // cos = 0.6 → quantized 0.6 exactly
    val x = Seq(3f, 4f); val y = Seq(1f, 0f) // cos = 3/5
    assert(SemanticGate.cosR4(x, y) === 0.6)
    // threshold comparison is on the QUANTIZED value
    assert(SemanticGate.cosR4(x, y) < SemanticGate.tau)
  }
}
