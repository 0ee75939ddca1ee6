package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PagedJsonSpec extends SparkSpec {

  test("flatten(render) is lossless: every event comes back exactly once") {
    import spark.implicits._
    val out = PagedJson.pagedRoundTrip(spark, sf)
    val ids = out.select("event_id").as[Long].collect().toSeq
    assert(ids.distinct.length === ids.length)
    assert(ids.length.toLong === Tables.events(spark, sf).count())
  }

  test("cursor chain: next_token points to page_id+1; final page has null token") {
    val pages = PagedJson.renderPages(spark, sf).collect()
    val maxPage = pages.map(_.getAs[Long]("page_id")).max
    pages.foreach { p =>
      val pid = p.getAs[Long]("page_id")
      val tok = p.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("next_token")
      if (pid === maxPage) assert(tok === null)
      else assert(tok === (pid + 1).toString)
    }
  }

  test("first_in_page is the [0]-element field access of the sorted page array") {
    val out = PagedJson.pagedRoundTrip(spark, sf).collect()
    out.groupBy(_.getAs[Long]("page_id")).foreach { case (_, rs) =>
      val firsts = rs.map(_.getAs[Long]("first_in_page")).distinct
      assert(firsts.length === 1)
      assert(firsts.head === rs.map(_.getAs[Long]("event_id")).min)
    }
  }
}
