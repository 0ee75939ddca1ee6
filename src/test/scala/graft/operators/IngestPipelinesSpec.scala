package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IngestPipelinesSpec extends SparkSpec {

  test("redditFilter: allowlist + predicates hold on every output row") {
    import spark.implicits._
    val out = IngestPipelines.redditFilter(spark, sf).collect()
    assert(out.nonEmpty)
    val allowed = Set("click", "view", "purchase")
    out.foreach { r =>
      assert(allowed.contains(r.getAs[String]("event_type").toLowerCase))
      assert(r.getAs[Double]("value") > 50.0)
      assert(r.getAs[Long]("k") >= 10L)
    }
    // subset of input, ordered by event_id
    val ids = out.map(_.getAs[Long]("event_id")).toSeq
    assert(ids === ids.sorted)
    assert(out.length <= Tables.events(spark, sf).count())
  }

  test("keywordFilter: every kept doc contains a keyword; none dropped wrongly") {
    import spark.implicits._
    val kws = Seq("spark", "window")
    val kept = IngestPipelines.keywordFilter(spark, sf, kws)
      .select("doc_id").as[Long].collect().toSet
    val expected = Tables.documents(spark, sf)
      .filter(kws.map(k => contains(lower($"text"), lit(k))).reduce(_ || _))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === expected)
    assert(kept.nonEmpty)
  }

  test("regexKeywordCounts: hyphenated keyword matches its space variant too") {
    import spark.implicits._
    val docs = Seq(
      (1L, "uses a merge-join here", "en", "s", 10L),
      (2L, "uses a merge join here", "en", "s", 10L),
      (3L, "no match at all", "en", "s", 10L),
      (4L, "mergejoin is not a word boundary match", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-kw").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = IngestPipelines.regexKeywordCounts(spark, tmp, Seq("merge-join"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_docs") === 2L) // doc 1 and 2, not 3/4
  }

  test("termsExtract: terms are only the requested keywords, count = csv arity") {
    val out = IngestPipelines.termsExtract(spark, sf, Seq("spark", "vector")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val terms = r.getAs[String]("terms_csv").split(",")
      assert(terms.nonEmpty)
      assert(terms.forall(Set("spark", "vector").contains))
      assert(r.getAs[Long]("n_terms") === terms.length.toLong)
    }
  }

  test("dateRangeCounts: group totals cover exactly the in-range rows") {
    import spark.implicits._
    val total = IngestPipelines.dateRangeCounts(spark, sf)
      .agg(sum("n_orders")).head().getLong(0)
    val expected = Tables.orders(spark, sf)
      .filter($"o_orderdate".between(lit("1996-01-01"), lit("1998-12-31"))).count()
    assert(total === expected)
  }

  test("commentsFilter: body-only match, 7-field projection with defaults") {
    import spark.implicits._
    val kws = Seq("query", "merge", "batch")
    val out = IngestPipelines.commentsFilter(spark, sf, kws)
    assert(out.columns.toSeq === Seq(
      "doc_id", "lang", "source", "n_chars", "body_len", "snippet", "body_md5"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val matched = Tables.documents(spark, sf)
      .filter(kws.map(k => contains(lower($"text"), lit(k))).reduce(_ || _)).count()
    assert(rows.length.toLong === matched)
    rows.foreach { r =>
      assert(r.getAs[String]("snippet").length <= 40)
      assert(r.getAs[Long]("body_len") >= r.getAs[String]("snippet").length.toLong)
    }
  }

  test("stringShapePredicates: each row satisfies suffix-regex OR contains") {
    val out = IngestPipelines.stringShapePredicates(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getAs[String]("p_type").toLowerCase
      val n = r.getAs[String]("p_name")
      assert(t.endsWith("economy") || t.endsWith("promo") || n.contains("widget"))
    }
  }

  test("crawlPlan: snake schedule replays on the driver; loads and makespan are consistent") {
    val out = IngestPipelines.crawlPlan(spark, sf).collect()
    assert(out.nonEmpty)
    // driver replay from the raw host relation
    val hosts = TextAnalysis.hostOf(spark, sf)
      .groupBy(col("host")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val w = IngestPipelines.crawlWorkers
    val ranked = hosts
      .map { case (h, n) => (h, n, n * IngestPipelines.politenessMs) }
      .sortBy { case (h, _, d) => (-d, h) }.zipWithIndex
    val assign = ranked.map { case ((h, n, d), i) =>
      val lane = i % (2 * w)
      (h, n, d, if (lane < w) lane.toLong else (2 * w - 1 - lane).toLong)
    }
    val loads = assign.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
    val makespan = loads.values.max
    val expect = assign.map { case (h, n, d, wk) =>
      (h, n, d, wk, loads(wk), makespan) }.sortBy(_._1)
    val got = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect.toSeq)
    // schedule sanity: loads partition the total drain; makespan is at
    // least the ideal share and every worker fits under it
    val total = hosts.map(_._2 * IngestPipelines.politenessMs).sum
    assert(loads.values.sum === total)
    assert(makespan >= total / w)
    loads.values.foreach(l => assert(l <= makespan))
  }

  test("kwicConcordance: pos is the first case-insensitive hit and every snippet window contains it") {
    val kws = Seq("spark", "window")
    val out = IngestPipelines.kwicConcordance(spark, sf, kws).collect()
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    out.foreach { r =>
      val (id, kw, pos, snip) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getString(3))
      val text = texts(id)
      assert(pos === text.toLowerCase.indexOf(kw) + 1, s"doc $id kw $kw")
      assert(snip.toLowerCase.contains(kw))
      assert(snip.length <= kw.length + 60)
      // the snippet is literally the claimed slice of the original text
      val start = math.max(1, pos - 30).toInt - 1
      assert(snip === text.slice(start, start + kw.length + 60))
    }
    // completeness: every (doc, keyword) hit in the corpus is reported
    val expected = for {
      (id, t) <- texts.toSeq; kw <- kws
      if t.toLowerCase.contains(kw)
    } yield (id, kw)
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSet ===
      expected.toSet)
  }

  test("kwicConcordance: keyword side broadcasts — the corpus is never shuffled") {
    val plan = IngestPipelines.kwicConcordance(spark, sf, Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
