package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.CorpusOps

/** STREAMING CONTAMINATION GATE (q304) — the q299 audit turned into an
  * admission control: documents arriving on a stream are DROPPED when
  * they share any [[CorpusOps.contamGramN]]-gram with the benchmark
  * set, so evaluation items can never leak into a training corpus that
  * is ingested continuously. The benchmark gram set is STATIC and
  * small (the q299 lifted items); the gate is a stream-static
  * broadcast anti-join — per micro-batch the stream side only scans
  * its own rows, no state store at all (the gate is stateless by
  * design: the benchmark is a fixed reference, not accumulating
  * history — contrast [[BloomGate]], whose reference set grows).
  *
  * The DECLARED query is the batch replay over the whole corpus
  * (hash-oracled); `gate` is the shared transform, usable verbatim
  * under `readStream` — `ContamGateSpec` asserts stream ≡ batch
  * verdict-for-verdict across micro-batch boundaries.
  *
  * Scale shape: benchmark grams broadcast (thousands of rows); the
  * corpus/stream side is one token explode + one broadcast join +
  * one doc-keyed count — linear, embarrassingly parallel, and at
  * 100 TB the only cost is the scan. */
/** Stream-side input row for the contamination gate. */
case class ContamDoc(source: String, doc_id: Long, text: String)

object ContamGate {

  /** The static benchmark gram set: every 5-gram window of the q299
    * LIFTED items (the slices actually present in training text). */
  def benchmarkGrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("tk"))
      .filter($"doc_id" % CorpusOps.contamStride === 0 &&
        size($"tk") >= CorpusOps.contamSliceFrom + CorpusOps.contamSliceLen)
      .select(slice($"tk", CorpusOps.contamSliceFrom,
        CorpusOps.contamSliceLen).as("itk"))
      .select(explode(wordShingles($"itk", CorpusOps.contamGramN)).as("gram"))
      .distinct()
  }

  /** The gate transform: per incoming doc, count benchmark-gram hits
    * (over gram OCCURRENCES) and admit iff zero. The benchmark rides as
    * ONE broadcast map row and the verdict is a per-row higher-order
    * filter — completely STATELESS, so the same transform runs under
    * `writeStream` in append mode with no state store and no shuffle. */
  def gate(docs: DataFrame, benchGrams: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val bmap = benchGrams.agg(map_from_entries(
      collect_list(struct($"gram", lit(1L)))).as("bm"))
    docs
      .crossJoin(broadcast(bmap))
      .select($"source", $"doc_id", tokens($"text").as("tk"), $"bm")
      .select($"source", $"doc_id", size($"tk").cast("long").as("n_toks"),
        size(filter(wordShingles($"tk", CorpusOps.contamGramN),
          g => element_at($"bm", g).isNotNull)).cast("long")
          .as("n_hit_grams"))
      .withColumn("admitted", $"n_hit_grams" === 0L)
  }

  /** Declared q304: the whole-corpus batch replay of the gate. */
  def contamGateBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bench = benchmarkGrams(spark, dir)
    gate(Tables.documents(spark, dir).select($"source", $"doc_id", $"text"),
        bench)
      .orderBy($"doc_id")
  }
}
