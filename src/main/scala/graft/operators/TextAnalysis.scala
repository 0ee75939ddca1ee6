package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extensions, SURVEY.md §2.9 / BASELINE.json): language-ID heuristic,
  * quality scoring, token counting, term frequency, fingerprinting.
  * All pure column expressions over `documents` — fully codegen'd,
  * embarrassingly parallel, no shuffle except the final aggregates.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Language-ID n-gram/stopword heuristic: score a handful of marker
    * terms per language and take the argmax (deterministic tie order).
    * A real fastText-style model would ship as a broadcast table of n-gram
    * weights — the plan shape (per-row scoring, no shuffle) is identical. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    val en = stopwordCount(toks, Seq("the", "a", "of"))
    val tech = stopwordCount(toks, Seq("spark", "query", "vector"))
    val data = stopwordCount(toks, Seq("table", "row", "column"))
    Tables.documents(spark, dir)
      .select(
        $"doc_id", $"lang",
        when(size(toks) === 0, "unknown")
          .when(en >= tech && en >= data, "en_like")
          .when(tech >= data, "tech_like")
          .otherwise("data_like").as("predicted"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: length, token, punctuation and stopword statistics
    * plus a composite score — the standard cheap pre-filter before
    * expensive dedup/model stages in a data pipeline. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_punct", punctCount($"text").cast("long"))
      .withColumn("n_stop", stopwordCount(toks, stopwords).cast("long"))
      .select(
        $"doc_id",
        $"n_tokens",
        $"n_punct",
        $"n_stop",
        round(
          when($"n_tokens" === 0, 0.0)
            .otherwise(
              least(lit(1.0), $"n_tokens".cast("double") / 100.0) * 0.6 +
              ($"n_stop".cast("double") / greatest($"n_tokens", lit(1)).cast("double")) * 0.4),
          4).as("quality"))
      .orderBy($"doc_id")
  }

  /** Token counting per doc: whitespace tokens and a BPE-ish regex token
    * count (word pieces + punctuation as separate tokens). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        size(tokens($"text")).cast("long").as("ws_tokens"),
        size(array_remove(
          regexp_extract_all($"text", lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)),
          "")).cast("long").as("bpe_ish_tokens"))
      .orderBy($"doc_id")
  }

  /** Corpus term frequency: explode tokens → count → top-k. The groupBy is
    * the one shuffle; partial aggregation collapses the per-partition token
    * stream before the exchange, so at 100 TB the shuffle carries only
    * (vocab × partitions) rows. */
  def termFrequency(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token")
      .limit(k)
  }

  /** Document fingerprinting: stable content hash (md5 of normalized text)
    * + 32-bit rolling-style short hash; grouped per language to show the
    * dedup-rate signal a pipeline would monitor. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        $"lang",
        fingerprint($"text").as("fp"),
        md5Hash32(fingerprint($"text")).as("fp32"))
      .orderBy($"doc_id")
  }

  /** A fixed multilingual tail appended to every doc so the unicode pass
    * has real accents/ligatures to work on (the synthetic corpus is
    * ASCII); the SAME Scala string is interpolated into the oracle SQL,
    * so both engines normalize identical bytes. Unicode escapes, not
    * literals — immune to source/transport encoding. */
  val unicodeTail: String =
    " Caf\u00e9 \ufb01nale \u00c5ngstr\u00f6m se\u00f1or \u00fcber"

  /** Unicode cleanup (web-corpus ingestion pass): NFC canonicalization —
    * without it, byte-level dedup misses visually-identical strings with
    * different combining-sequence encodings — and accent folding for
    * search/matching keys. Native codegen'd expressions; outputs are
    * md5+length digests so the oracle compare is byte-exact. */
  def unicodeClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        concat(coalesce($"text", lit("")), lit(unicodeTail)).as("raw"))
      .select($"doc_id",
        length(graft.functions.native.nfcNormalize($"raw")).cast("long").as("nfc_len"),
        md5(graft.functions.native.nfcNormalize($"raw")).as("nfc_md5"),
        length(graft.functions.native.stripAccents($"raw")).cast("long").as("folded_len"),
        md5(graft.functions.native.stripAccents($"raw")).as("folded_md5"))
      .orderBy($"doc_id")
  }
}
