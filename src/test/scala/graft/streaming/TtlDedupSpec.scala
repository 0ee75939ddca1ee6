package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TtlDedupSpec extends SparkSpec {

  test("ttlDedupReplay: occ 0 admitted, occ 1 inside TTL suppressed, occ 2 outside re-admitted (unique-text chains)") {
    import spark.implicits._
    val rows = TtlDedup.ttlDedupReplay(spark, sf).collect()
    assert(rows.nonEmpty)
    // chains of length 3 (unique text) follow the designed pattern; docs
    // sharing text form longer chains with their own gaps — check the
    // designed pattern only where the fingerprint is unique to the doc
    val fpCount = TtlDedup.occurrences(spark, sf)
      .groupBy("fp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val occs = TtlDedup.occurrences(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("occ")) -> r.getAs[String]("fp"))
      .toMap
    val unique = rows.filter { r =>
      fpCount(occs((r.getAs[Long]("doc_id"), r.getAs[Int]("occ")))) == 3L
    }
    assert(unique.nonEmpty)
    unique.foreach { r =>
      val expect = r.getAs[Int]("occ") match {
        case 0 => true  // first sighting
        case 1 => false // +3 days, inside the 7-day TTL
        case 2 => true  // gap 8 days from occ 1 — outside
      }
      assert(r.getAs[Boolean]("admitted") === expect,
        s"doc ${r.getAs[Long]("doc_id")} occ ${r.getAs[Int]("occ")}")
    }
  }

  test("transformWithState gate equals the relational replay across two micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    // transformWithState's contract: RocksDB state store provider
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val occs = TtlDedup.occurrences(spark, sf).as[OccRow]
        .collect().sortBy(r => (r.ts_day, r.doc_id, r.occ))
      val mem = MemoryStream[OccRow]
      val q = TtlDedup.gateStream(mem.toDS())
        .writeStream.format("memory").queryName("ttlgate")
        .outputMode("append").start()
      // batch 1 = everything up to day 15, batch 2 = the rest — state
      // (last-seen day per fingerprint) must survive the batch boundary
      val (b1, b2) = occs.partition(_.ts_day <= 15)
      mem.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ttlgate").as[TtlVerdict].collect()
        .map(v => (v.doc_id, v.occ) -> v.admitted).toMap
      q.stop()
      val replay = TtlDedup.ttlDedupReplay(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("occ")) ->
          r.getAs[Boolean]("admitted")).toMap
      assert(streamed.size === replay.size)
      assert(streamed === replay)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
