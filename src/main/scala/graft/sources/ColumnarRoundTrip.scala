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
    * to a per-priority aggregate. Decimal money columns survive as
    * exact decimals; the final sum is cast to double only for display.
    * Scale: both the write and the read are full-parallel columnar IO;
    * the aggregate is partial-first. */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = TmpNonce.scratchDir("graft-orc", dir).toString
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        $"o_totalprice".cast("decimal(18,4)").as("price"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"price").cast("double").as("sum_price"))
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
}
