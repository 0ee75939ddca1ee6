package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {

  test("fuzzyLinkParts: every variant recovers its own origin at distance ≤ 1") {
    import spark.implicits._
    val out = RecordLinkage.fuzzyLinkParts(spark, sf).collect()
    assert(out.nonEmpty)
    // self-links: variant_id = name_id + 500000 must appear, dist ≤ 1
    // (dropping one char is ≤ 1 edit; len 2 names degenerate to 0)
    val self = out.filter(r =>
      r.getAs[Long]("variant_id") === r.getAs[Long]("name_id") + 500000L)
    val nNames = Tables.part(spark, sf).select($"p_name").distinct().count()
    assert(self.length.toLong === nNames)
    self.foreach(r => assert(r.getAs[Long]("dist") <= 1L))
    // verification is sound: no reported pair exceeds the threshold
    out.foreach(r => assert(r.getAs[Long]("dist") <= 2L))
  }

  test("fuzzyLinkParts: blocking never pairs across different first words") {
    val out = RecordLinkage.fuzzyLinkParts(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[String]("p_name").split(" ").head ===
        r.getAs[String]("vname").split(" ").head)
    }
  }
}
