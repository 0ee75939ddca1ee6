package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file source (check `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`). At cluster scale these
  * directories would be partitioned datasets; the loader stays the same.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")

  /** events.ts has shipped as either parquet TIMESTAMP(NANOS) or
    * TIMESTAMP(MICROS) across driver testdata generations, so the loader
    * branches on the type the scan actually produces:
    *   - NANOS: Spark's vectorized reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]), so read nanos as LONG (legacy conf) and
    *     truncate to microseconds with integer `div` (the ns epoch ≈ 1.7e18
    *     exceeds double's 2^53 mantissa — float division would corrupt it).
    *   - MICROS: arrives as TIMESTAMP_NTZ (no tz flag in the file); cast to
    *     session-zoned TIMESTAMP — the session is pinned to UTC everywhere
    *     (Verify/Bench/tests), so the instant and its formatting are
    *     identical to the nanos path's `timestamp_micros` output.
    * The DuckDB oracle side truncates with date_trunc('microseconds', ts)
    * wherever sub-µs ordering could matter (a no-op on micros data). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
