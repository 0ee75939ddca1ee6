package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.Tables
import graft.functions.TextFunctions.{fingerprint, tokens}

/** A document on the ingestion stream: dedup key = source, content =
  * fingerprint, arrival order = doc_id, plus the quality feature the
  * filter stage reads. */
case class PipeDoc(source: String, doc_id: Long, fp: String, n_tokens: Long)

/** A document that survived the full curation pipeline. */
case class CuratedDoc(doc_id: Long, source: String, fp: String, n_tokens: Long)

/** STREAMING INGESTION SLICE (q166) — the per-operator streaming kit
  * composed into the one pipeline a live training-data feed runs, the
  * stream twin of the q76 batch capstone:
  *
  *   source (PageFeed DSv2 cursor feed, or any `Dataset[PipeDoc]`)
  *     → Bloom dedup GATE (q94's per-source `GroupState` sketch —
  *       bounded bytes per key regardless of stream length)
  *     → QUALITY filter (exact integer token-count bounds — the q26
  *       length gate in its stream-safe integer form)
  *     → `foreachBatch` PARQUET APPEND with a checkpoint (K2/K3: the
  *       reference's append-CSV + cursor files as one fault-tolerant
  *       sink; the resume point is the checkpoint, not a token file).
  *
  * The declared q166 query is the EXACT RELATIONAL REPLAY of the whole
  * pipeline (q94's replay theorem extended by the filter stage): a
  * Bloom position is set for document d iff some earlier document
  * hashes to it, so the sequential gate needs no sequential state to
  * replay — and the quality filter is stateless row arithmetic. Stream
  * and replay agree row for row when micro-batches arrive in doc_id
  * order, INCLUDING across a stop/restart from the checkpoint
  * (spec-asserted: the recovered `GroupState` words continue the fold
  * exactly where the stopped query left it).
  *
  * Scale shape: the stream shuffles each micro-batch once on `source`
  * and holds O(sources × m/32) state; the sink appends partitions in
  * parallel. The replay is q94's — one groupBy(source, pos) min over
  * O(corpus × k) small integer keys, one join back, one per-doc reduce —
  * plus a broadcast-free per-row filter. */
object CuratePipeline {

  /** Quality bounds (half-open, exact integers), shared with the oracle
    * and spec; chosen inside the generated token-count range so BOTH
    * verdicts occur at every SF. */
  val minTokens = 16L
  val maxTokens = 80L

  private val words = (BloomGate.mBits / 32).toInt

  /** The ingestion corpus: documents + id-shifted re-arrivals (the q94
    * convention) with the quality feature attached. */
  def pipeDocs(spark: SparkSession, dir: String): Dataset[PipeDoc] = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"source", $"doc_id", fingerprint($"text").as("fp"),
        size(tokens($"text")).cast("long").as("n_tokens"))
    base.unionByName(base.withColumn("doc_id", $"doc_id" + 100000L))
      .as[PipeDoc]
  }

  /** Gate + filter over a (batch or streaming) `Dataset[PipeDoc]`: one
    * Bloom fold per source ([[BloomGate.runFold]] — the SAME fold the
    * per-operator q94 stream runs), then the stateless quality cut. */
  def curateStream(docs: Dataset[PipeDoc],
                   m: Long = BloomGate.mBits,
                   k: Int = BloomGate.kHashes): Dataset[CuratedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Vector[Int], CuratedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[PipeDoc], state: GroupState[Vector[Int]]) =>
          val seq = it.toSeq
          val (verdicts, w) = BloomGate.runFold(
            seq.map(d => StreamDoc(d.source, d.doc_id, d.fp)),
            state.getOption.getOrElse(Vector.fill(words)(0)), m, k)
          state.update(w)
          val emitted =
            verdicts.collect { case v if v.emitted => v.doc_id }.toSet
          seq.sortBy(_.doc_id).iterator
            .filter(d => emitted(d.doc_id) &&
              d.n_tokens >= minTokens && d.n_tokens < maxTokens)
            .map(d => CuratedDoc(d.doc_id, d.source, d.fp, d.n_tokens))
      }
  }

  /** K2/K3 sink: checkpointed parquet append — restart resumes from the
    * committed micro-batch, so each batch lands exactly once. */
  def parquetAppendSink(ds: Dataset[CuratedDoc], outPath: String,
                        checkpointPath: String): StreamingQuery =
    ds.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch {
        (batch: Dataset[CuratedDoc], _: Long) =>
          batch.write.mode("append").parquet(outPath)
      }
      .start()

  /** Declared q166: the exact relational replay of gate + filter — the
    * curated table the streaming pipeline materializes, computed as one
    * batch plan (q94's replay joined back to the quality feature). */
  def curateReplayBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BloomGate.bloomReplayBatch(spark, dir)
      .filter($"emitted")
      .join(pipeDocs(spark, dir), Seq("doc_id", "source"))
      .filter($"n_tokens" >= minTokens && $"n_tokens" < maxTokens)
      .select($"doc_id", $"source", $"fp", $"n_tokens")
      .orderBy($"doc_id")
  }
}
