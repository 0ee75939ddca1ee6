package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** K1/S2: CSV sink WITH HEADER + scan-back (`reddit_subm_extraction.py:
  * 74–76` appends to `submissions.csv` writing the header on first
  * create; `tweet_download.py:56–59` reads reference CSVs). Spark-first
  * both ways: the built-in csv source handles quoting/escapes/nulls; the
  * header line is the schema-on-read contract.
  */
object CsvRoundTrip {

  /** Null vs empty-string round-trip contract, set SYMMETRICALLY on write
    * and read: NULL serializes as the `\N` sentinel (never a bare empty
    * field), and a quoted `""` deserializes back to the empty string.
    * Spark's defaults are asymmetric here — the writer emits empty string
    * as `""` but the reader's default `nullValue` of "" folds it back to
    * NULL — so without these options an empty `event_type` would silently
    * come back as NULL while the oracle reads the original `''` from
    * parquet. */
  private val NullSentinel = "\\N"

  /** Header-CSV writer with the symmetric null/empty contract. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", true)
      .option("nullValue", NullSentinel).option("emptyValue", "\"\"")
      .csv(path)

  /** Header-CSV reader, inverse of [[writeCsv]]: `\N` → NULL, `""` → empty
    * string. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true)
      .option("nullValue", NullSentinel).option("emptyValue", "")
      .csv(path)

  /** Declared query: project `events`, write CSV with `header=true`, read
    * it back with `header=true` and NO explicit schema — the column NAMES
    * in the result come from the header line itself (absent the header
    * they would be `_c0…` and the projection below would fail), which is
    * what makes this a real K1 round trip rather than a skipped line. */
  def csvHeaderRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = TmpNonce.scratchDir("graft-csv", dir).toString
    writeCsv(
      Tables.events(spark, dir)
        .select($"event_id", $"user_id", $"event_type",
          round($"value", 2).as("value")), // round-ok: half-up 2dp before text serialization; oracle mirrors floor(x*1e2+0.5)
      out)
    readCsv(spark, out)
      .select(
        $"event_id".cast("long").as("event_id"),
        $"user_id".cast("long").as("user_id"),
        $"event_type",
        $"value".cast("double").as("value"))
      .orderBy($"event_id")
  }
}
