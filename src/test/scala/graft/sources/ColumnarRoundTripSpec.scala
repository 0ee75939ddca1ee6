package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnarRoundTripSpec extends SparkSpec {

  test("orcRoundTrip: aggregates equal the direct parquet computation — lossless cycle") {
    import spark.implicits._
    val viaOrc = ColumnarRoundTrip.orcRoundTrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = graft.Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(graft.operators.Relational.u4($"o_totalprice")
          .cast("decimal(38,0)")).cast("double") / 1e4).as("s"))
      .orderBy($"o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(viaOrc.toSeq === direct.toSeq)
  }

  test("partitionedScan: the lang filter prunes at the DIRECTORY level") {
    import spark.implicits._
    val pruned = ColumnarRoundTrip.partitionedRead(spark, sf)
      .filter($"lang" === "en")
    val plan = pruned.queryExecution.executedPlan
      .toString
    // partition pruning shows as a PartitionFilters entry on the scan;
    // the lang predicate must NOT appear as a data (pushed) filter
    val formatted = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PartitionFilters"), formatted.take(2000))
    val pf = formatted.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), formatted.take(2000))
    // and the scan reads ONLY the matching partition's rows
    val en = graft.Tables.documents(spark, sf).filter($"lang" === "en").count()
    assert(pruned.count() === en)
    assert(plan.nonEmpty)
  }

  test("partitionedScan query: per-source stats equal the unpartitioned computation") {
    import spark.implicits._
    val got = ColumnarRoundTrip.partitionedScan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = graft.Tables.documents(spark, sf)
      .filter($"lang" === "en")
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("s"))
      .orderBy($"source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("schemaEvolutionScan: old-snapshot rows null-fill the evolved column exactly") {
    import spark.implicits._
    val rows = ColumnarRoundTrip.schemaEvolutionScan(spark, sf).collect()
    val perLang = graft.Tables.documents(spark, sf)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(($"doc_id" % 2).cast("long")).as("odd"),
        sum($"n_chars").as("sc")).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("odd"), r.getAs[Long]("sc"))).toMap
    assert(rows.length === perLang.size)
    rows.foreach { r =>
      val (n, odd, sc) = perLang(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_rows") === n) // nothing lost across snapshots
      // quality is non-null on exactly the v2 (odd-id) rows
      assert(r.getAs[Long]("n_with_quality") === odd)
      assert(r.getAs[Long]("sum_chars") === sc)
      val mq = r.getAs[Double]("mean_quality")
      assert(mq > 0.0 && mq <= 1.0)
    }
  }
}
