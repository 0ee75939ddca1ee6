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
}
