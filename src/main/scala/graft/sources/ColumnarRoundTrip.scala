package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Columnar-format interchange beyond parquet: ORC roundtrip and a
  * PARTITIONED parquet layout with directory-pruned scan-back — the two
  * storage-layer behaviors a 100 TB lake lives and dies by. Neither
  * format is readable by the DuckDB oracle; the oracle instead computes
  * the same aggregate from the ORIGINAL table, so a hash match proves
  * the write→read cycle was LOSSLESS (the q46 CSV-roundtrip contract,
  * applied to columnar formats).
  */
object ColumnarRoundTrip {

  /** ORC write + scan-back (zlib, Spark's built-in orc source), reduced
    * to a per-priority aggregate. Money quantizes to exact integer
    * 1e4-units BEFORE the write (the q14 pattern — a decimal cast of a
    * double rounds its half boundaries differently per engine), survives
    * the roundtrip as plain longs, and the final sum is cast to double
    * only for display. Scale: both the write and the read are
    * full-parallel columnar IO; the aggregate is partial-first. */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = TmpNonce.scratchDir("graft-orc", dir).toString
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        graft.operators.Relational.u4($"o_totalprice").as("price_u"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        (sum($"price_u".cast("decimal(38,0)")).cast("double") / 1e4)
          .as("sum_price"))
      .orderBy($"o_orderpriority")
  }

  /** Hive-style partitioned parquet layout (`.../lang=en/...`) plus a
    * scan-back filtered to one partition. The filter must prune at the
    * DIRECTORY level — `PartitionFilters` in the scan, zero non-matching
    * files opened — which is the mechanism that lets a 100 TB table
    * serve a single-partition query at single-partition cost
    * (spec-asserted on the physical plan). */
  def partitionedScan(spark: SparkSession, dir: String,
                      lang: String = "en"): DataFrame = {
    import spark.implicits._
    partitionedRead(spark, dir)
      .filter($"lang" === lang)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"source")
  }

  /** The partitioned write + raw read-back, shared by the query and the
    * pruning plan assertion. */
  def partitionedRead(spark: SparkSession, dir: String): DataFrame = {
    val out = TmpNonce.scratchDir("graft-part", dir).toString
    Tables.documents(spark, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    spark.read.parquet(out)
  }

  /** SCHEMA-EVOLUTION scan — the lakehouse drift case every long-lived
    * table hits: an old snapshot written WITHOUT a column (here the even
    * doc_ids, pre-quality-score era) and a new snapshot WITH it (odd
    * ids, carrying the q26 composite score), read together via parquet
    * `mergeSchema` so the old rows surface the new column as NULL.
    * Reduced to a per-language report of row counts, how much of the
    * table has the new column, and the mean score over the rows that do
    * (quantized to 1e4 units before the sum, the q145 discipline). The
    * oracle recomputes from the ORIGINAL table with a parity CASE — the
    * hash match proves the two-schema write→merge→read cycle is lossless
    * AND null-fills exactly the old rows.
    *
    * Scale: both snapshots write/read full-parallel; `mergeSchema` costs
    * one footer read per file at planning time (on a real lake the
    * merged schema comes from the table catalog instead); the aggregate
    * is partial-first keyed on lang. */
  def schemaEvolutionScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val base = TmpNonce.scratchDir("graft-evo", dir).toString
    val docs = Tables.documents(spark, dir)
      .withColumn("tk", graft.functions.TextFunctions.tokens($"text"))
      .withColumn("quality", TextAnalysis.qualityExpr(
        size($"tk").cast("long"),
        graft.functions.TextFunctions.stopwordCount(
          $"tk", TextAnalysis.stopwords).cast("long")))
    docs.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"lang", $"n_chars")
      .write.mode("overwrite").parquet(s"$base/v1")
    docs.filter($"doc_id" % 2 =!= 0)
      .select($"doc_id", $"lang", $"n_chars", $"quality")
      .write.mode("overwrite").parquet(s"$base/v2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$base/v1", s"$base/v2")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_rows"),
        count($"quality").as("n_with_quality"),
        sum($"n_chars").as("sum_chars"),
        sum(floor($"quality" * 1e4 + lit(0.5)).cast("long")).as("q4"))
      .select($"lang", $"n_rows", $"n_with_quality", $"sum_chars",
        (graft.operators.Quant.r4($"q4".cast("double") /
          $"n_with_quality".cast("double") / 1e4) + lit(0.0))
          .as("mean_quality"))
      .orderBy($"lang")
  }
}
