package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data-pipeline operators
  * (dedup, quality, language-ID, fingerprinting). Everything here is a pure
  * Catalyst expression — codegen'd, no UDFs — so the whole text layer stays
  * inside WholeStageCodegen at scale.
  */
object TextFunctions {

  /** Whitespace tokenization with empty-token removal (both Spark `split`
    * and the oracle's `string_split_regex` emit boundary empties).
    * `array_remove` rather than `filter(…, t => t =!= "")`: identical
    * result, but it is a codegen'd collection op while the lambda form is
    * interpreted per token. Null-safe: a null document tokenizes to `[]`,
    * never to a null array — downstream `size(...)` must count 0 tokens,
    * not Spark's size(null) = -1 (the oracle's `len` on an empty list
    * agrees; on a NULL it would not). */
  def tokens(text: Column): Column =
    array_remove(split(lower(coalesce(text, lit(""))), "\\s+"), "")

  /** Word n-gram shingles: array of space-joined n-token windows; <n
    * tokens gives []. Delegates to the native [[WordShinglesExpr]] — the
    * combinator form (`transform(sequence(0, m-n), i -> concat_ws(" ",
    * slice(toks, i+1, n)))`) is byte-equivalent but pays (m-n+1)
    * interpreted lambda evals per row. */
  def wordShingles(toks: Column, n: Int): Column =
    native.wordShingles(toks, n)

  /** Deterministic 32-bit token hash shared with the DuckDB oracle:
    * first 8 hex chars of md5, parsed base-16. (xxhash64 would be faster
    * but is Spark-specific; md5 exists identically in both engines.) */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Document fingerprint (SURVEY.md north-star): md5 over
    * whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  /** Stopword hits among tokens. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
}
