package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.Tables
import graft.operators.TextAnalysis
import graft.functions.TextFunctions.{fingerprint, tokens, wordShingles}

/** A document on the FULL curation stream: the q166 quality features
  * plus the q173 MinHash signature (`sig` empty for docs under the
  * shingle minimum — those pass the near-dup gate vacuously). */
case class FullDoc(source: String, doc_id: Long, fp: String,
                   n_tokens: Long, q_u4: Long, sig: Seq[Long])

/** One gate's vote on one document. `gate` ∈ {exact, band}; the exact
  * row (always exactly one per doc) carries the doc's feature columns
  * for the batch-local combine; band rows carry only the vote. */
case class GateVote(doc_id: Long, source: String, fp: String,
                    n_tokens: Long, q_u4: Long, gate: String,
                    blocked: Boolean)

/** THE FULL STREAMING CURATION GATE (q248) — round 9 shipped the three
  * stages separately (q166: Bloom exact gate + per-source quality
  * floors; q173: the banded MinHash near-dup gate); production curation
  * runs them as ONE pipeline, and this module composes them into one
  * streaming query:
  *
  *   source stream
  *     → EXACT gate   (q94 per-source Bloom `GroupState` fold)
  *     → NEAR-DUP gate (q173 per-(band, slice) `GroupState` fold)
  *     → QUALITY cut  (q26 token bounds + q168 per-source p25 floors,
  *                     stateless against the broadcast history table)
  *     → checkpointed parquet append.
  *
  * The two stateful stages key DIFFERENTLY (source vs band slice), so
  * they run as parallel append-mode `flatMapGroupsWithState` branches
  * over the same stream, unioned; the cross-gate combine is BATCH-LOCAL
  * (every vote for a doc lands in the doc's own micro-batch) and runs
  * inside `foreachBatch` — the only multi-stateful shape Structured
  * Streaming supports for arbitrary custom state, and the right one: no
  * stage ever waits on another's watermark.
  *
  * Both folds stay SEEN-based (every arrival registers in Bloom bits
  * and band history whether or not it is admitted), which is what keeps
  * the composition relationally replayable with NO recursion: each
  * gate's verdict depends only on arrival order, so the composed
  * verdict is simply the conjunction
  *
  *   curated(d) ⟺ bloom_emitted(d) ∧ (no sig ∨ no prior near-dup)
  *              ∧ minTokens ≤ n_tokens < maxTokens ∧ q_u4 ≥ floor(src).
  *
  * The declared q248 query IS that conjunction over the replays
  * ([[replayBatch]] = q94's first-setter replay ⋈ q173's rank-capped
  * band replay ⋈ the q168 floor table), and stream ≡ replay row for row
  * in doc_id-ordered micro-batches, including across a RocksDB
  * checkpoint restart (spec-asserted).
  *
  * The near-dup stage has REAL work beyond the exact gate: the corpus
  * adds "edited re-crawls" ([[editedDocs]] — every 7th document
  * re-arrives with an appended edit token, the q92 v2-edit convention).
  * Their fingerprints differ, so the Bloom gate passes them; whether
  * the near-dup gate suppresses one depends on its signature agreeing
  * with the original's at ≥ 8/16 coordinates — deterministic in both
  * engines, and genuinely split both ways at every SF (short docs shift
  * many shingles, long docs few), so the composed gate's oracle
  * exercises suppression-by-near-dup-only, admission, and both quality
  * verdicts.
  *
  * Scale shape: each micro-batch shuffles once per stateful branch
  * (source key; band keys at `bands` rows/doc); state is O(sources ×
  * m/32) Bloom words + O(real collision groups × cap × perms) band
  * longs; the floor table is O(sources) broadcast; the combine touches
  * only the batch's own rows. The replay's shuffles are the q94 and
  * q173 audited shapes plus one doc_id join. */
object FullCurate {

  /** Edit-re-crawl fixture constants (the q92 convention, offset clear
    * of dupCorpus/digest/setsim-seed id ranges). Every `editStride`-th
    * doc re-arrives edited; alternating edits are LIGHT (one appended
    * token — the signature barely moves, est ≈ 1, suppressed) or HEAVY
    * (only the first ⌈n/3⌉ tokens survive plus a marker — true Jaccard
    * ≈ 1/3, est < 1/2 for nearly all signatures, admitted), so the
    * near-dup stage's oracle exercises BOTH verdicts at every SF. */
  val editStride = 7L
  val editOffset = 500000L
  val editSuffix = " v2-edit"
  val rewriteSuffix = " v2-rewrite"

  import CuratePipeline.{minTokens, maxTokens}
  import NearDupGate.{perms, bands, rows}

  /** The composed pipeline's corpus: base docs, exact re-arrivals
    * (+100000, the q94/q166 convention), and edited re-crawls
    * (+500000). */
  def fullCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"source", $"doc_id", $"text")
    val tk = tokens($"text")
    val keep = floor((size(tk) + 2) / 3).cast("int")
    base
      .unionByName(base.withColumn("doc_id", $"doc_id" + 100000L))
      .unionByName(base.filter($"doc_id" % editStride === 0)
        // edit kind from the BASE id, THEN shift (two steps — an aliased
        // doc_id in the same select would win lateral-column-alias
        // resolution inside the when())
        .select($"source", $"doc_id",
          when($"doc_id" % (2 * editStride) === 0,
            concat(concat_ws(" ", slice(tk, lit(1), keep)), lit(rewriteSuffix)))
            .otherwise(concat($"text", lit(editSuffix))).as("text"))
        .withColumn("doc_id", $"doc_id" + editOffset))
  }

  /** Feature + signature extraction over the composed corpus — one
    * tokenize pass per row; `sig` null-safe to empty for sub-shingle
    * docs so the Dataset encoder never sees a null Seq. */
  def fullDocs(spark: SparkSession, dir: String): Dataset[FullDoc] = {
    import spark.implicits._
    val toks = tokens($"text")
    fullCorpus(spark, dir)
      .select($"source", $"doc_id", fingerprint($"text").as("fp"),
        size(toks).cast("long").as("n_tokens"),
        CuratePipeline.qU4(toks).as("q_u4"),
        coalesce(
          graft.functions.native.md5MinHashSig(
            array_distinct(wordShingles(toks, 3)), perms),
          typedLit(Seq.empty[Long])).as("sig"))
      .as[FullDoc]
  }

  private val bloomWords = (BloomGate.mBits / 32).toInt

  /** The one streaming transform: two stateful gate branches over the
    * same input, unioned into per-doc votes. Run [[combineBatch]] on
    * each micro-batch of the result (all of a doc's votes are
    * batch-local). */
  def gateStream(docs: Dataset[FullDoc]): Dataset[GateVote] = {
    import docs.sparkSession.implicits._
    val exact = docs.groupByKey(_.source)
      .flatMapGroupsWithState[Vector[Int], GateVote](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[FullDoc], state: GroupState[Vector[Int]]) =>
          val seq = it.toSeq
          val byId = seq.map(d => d.doc_id -> d).toMap
          val (verdicts, w) = BloomGate.runFold(
            seq.map(d => StreamDoc(d.source, d.doc_id, d.fp)),
            state.getOption.getOrElse(Vector.fill(bloomWords)(0)))
          state.update(w)
          verdicts.iterator.map { v =>
            val d = byId(v.doc_id)
            GateVote(d.doc_id, d.source, d.fp, d.n_tokens, d.q_u4,
              "exact", !v.emitted)
          }
      }
    val band = docs.filter(_.sig.nonEmpty)
      .flatMap(d => (0 until bands).map(b =>
        BandRow(b, d.sig.slice(b * rows, b * rows + rows), d.doc_id, d.sig)))
      .groupByKey(r => (r.band, r.bk))
      .flatMapGroupsWithState[GateGroupState, GateVote](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Seq[Long]), it: Iterator[BandRow],
         state: GroupState[GateGroupState]) =>
          val (out, entries) = NearDupGate.runFold(
            it.map(r => SigDoc(r.doc_id, r.sig)).toSeq,
            state.getOption.map(_.entries).getOrElse(Seq.empty), key._1)
          state.update(GateGroupState(entries))
          out.iterator.map(v =>
            GateVote(v.doc_id, "", "", 0L, 0L, "band", v.colliders.nonEmpty))
      }
    exact.unionByName(band)
  }

  /** Batch-local cross-gate combine + stateless quality cut: admitted
    * iff NO gate voted blocked, then token bounds and the per-source
    * floor (broadcast O(sources) table; an unknown source admits at
    * floor 0 — the q166 rule). */
  def combineBatch(votes: DataFrame, floors: DataFrame): DataFrame = {
    val spark = votes.sparkSession
    import spark.implicits._
    val blocked = votes.groupBy($"doc_id")
      .agg(max(when($"blocked", 1).otherwise(0)).as("any_blocked"))
    votes.filter($"gate" === "exact")
      .select($"doc_id", $"source", $"fp", $"n_tokens", $"q_u4")
      .join(blocked, "doc_id")
      .filter($"any_blocked" === 0)
      .join(broadcast(floors), Seq("source"), "left")
      .filter($"n_tokens" >= minTokens && $"n_tokens" < maxTokens &&
        $"q_u4" >= coalesce($"thr_u4", lit(0L)))
      .select($"doc_id", $"source", $"fp", $"n_tokens", $"q_u4")
  }

  /** The end-to-end streaming pipeline: gates → combine → checkpointed
    * parquet append (K2/K3 — restart resumes from the committed
    * micro-batch). `sinkPartitions` optionally coalesces the combine
    * output before the append — a micro-batch's curated slice is tiny
    * relative to the shuffle width, and one file per batch beats
    * shuffle-partition-many empty-ish files through the Hadoop commit
    * protocol (measured in `StreamBench`; None preserves the plan
    * width for corpus-sized batches). */
  def curatedStream(docs: Dataset[FullDoc], floors: DataFrame,
                    outPath: String, checkpointPath: String,
                    sinkPartitions: Option[Int] = None): StreamingQuery =
    gateStream(docs).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[GateVote], _: Long) =>
        val out = combineBatch(batch.toDF(), floors)
        sinkPartitions.fold(out)(out.coalesce)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** The full per-document verdict vector behind q248/q249: every doc of
    * the composed corpus with each stage's independent verdict (package-
    * visible: [[MultiModalCurate]] extends it with the media/semantic
    * verdicts). */
  private[streaming] def decisionVector(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fd = graft.CacheGuard.barrier(fullDocs(spark, dir).toDF())
    val bloom = BloomGate.bloomReplayOver(
      fd.select($"source", $"doc_id", $"fp"))
      .select($"doc_id", $"emitted")
    val ndup = NearDupGate.replayOver(
        fd.filter(size($"sig") > 0).select($"doc_id", $"sig"))
      .select($"doc_id", $"admitted".as("nd_admitted"))
    val floors = TextAnalysis.sourceQualityFloor(spark, dir)
      .select($"source", $"thr_u4")
    fd.join(bloom, "doc_id")
      .join(ndup, Seq("doc_id"), "left")
      .join(broadcast(floors), Seq("source"), "left")
      .select($"doc_id", $"source", $"fp", $"n_tokens", $"q_u4",
        $"emitted",
        coalesce($"nd_admitted", lit(true)).as("nd_ok"),
        ($"n_tokens" >= minTokens && $"n_tokens" < maxTokens).as("len_ok"),
        ($"q_u4" >= coalesce($"thr_u4", lit(0L))).as("floor_ok"))
  }

  /** Declared q248: the exact relational replay of the composed gate —
    * one batch plan conjoining the q94 Bloom replay, the q173 band
    * replay (both over the composed corpus), and the q168 floor table. */
  def replayBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decisionVector(spark, dir)
      .filter($"emitted" && $"nd_ok" && $"len_ok" && $"floor_ok")
      .select($"doc_id", $"source", $"fp", $"n_tokens", $"q_u4")
      .orderBy($"doc_id")
  }

  /** CURATION DECISION LOG (q249) — the ops artifact the composed gate
    * owes its operators: one row per arriving document with the verdict
    * of EVERY stage (exact gate, near-dup gate, length bounds, quality
    * floor), the final outcome, and a single primary `dropped_by` label
    * under the pipeline's stage order (exact → near-dup → length →
    * floor — the order the stream applies them, so the label names the
    * stage that would have cut the doc first). q248 publishes the
    * curated corpus; this publishes WHY each of the other documents is
    * absent — the artifact a curation regression ("why did volume drop
    * 30% on Tuesday") is debugged from, and the per-stage drop counts a
    * release report quotes.
    *
    * Scale shape: identical to q248 (the verdicts are the same three
    * replays joined on doc_id); the label is per-row CASE arithmetic.
    * The log is corpus-sized by design — at 100 TB it lands partitioned
    * next to the curated output, not in a driver report. */
  def decisionLog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decisionVector(spark, dir)
      .select($"doc_id", $"source", $"n_tokens", $"q_u4",
        $"emitted", $"nd_ok", $"len_ok", $"floor_ok",
        ($"emitted" && $"nd_ok" && $"len_ok" && $"floor_ok").as("curated"),
        when(!$"emitted", "exact")
          .when(!$"nd_ok", "neardup")
          .when(!$"len_ok", "length")
          .when(!$"floor_ok", "floor")
          .otherwise("none").as("dropped_by"))
      .orderBy($"doc_id")
  }

  /** PHASE FUNNEL (q265) — the q250 funnel cut by ARRIVAL PHASE instead
    * of source: base documents, exact re-arrivals, and edited re-crawls
    * each have a DESIGNED fate profile (bases die only on quality;
    * re-arrivals die at the exact gate, every one; edits split at the
    * near-dup gate by edit weight), and this rollup is the assertion of
    * that profile as a query — the "is the gate behaving" dashboard row
    * that a per-source or global rate cannot express. Phase is pure id
    * arithmetic (the fixture regions), so the rollup costs one
    * O(phases) aggregate over the shared verdict vector. */
  def phaseFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decisionVector(spark, dir)
      .withColumn("phase",
        when($"doc_id" >= editOffset, "edited_recrawl")
          .when($"doc_id" >= 100000L, "exact_rearrival")
          .otherwise("base"))
      .groupBy($"phase")
      .agg(count(lit(1)).as("n_arrived"),
        sum(when(!$"emitted", 1L).otherwise(0L)).as("n_exact_dropped"),
        sum(when($"emitted" && !$"nd_ok", 1L).otherwise(0L))
          .as("n_neardup_dropped"),
        sum(when($"emitted" && $"nd_ok" && !$"len_ok", 1L).otherwise(0L))
          .as("n_length_dropped"),
        sum(when($"emitted" && $"nd_ok" && $"len_ok" && !$"floor_ok", 1L)
          .otherwise(0L)).as("n_floor_dropped"),
        sum(when($"emitted" && $"nd_ok" && $"len_ok" && $"floor_ok", 1L)
          .otherwise(0L)).as("n_curated"))
      .select($"phase", $"n_arrived", $"n_exact_dropped",
        $"n_neardup_dropped", $"n_length_dropped", $"n_floor_dropped",
        $"n_curated",
        expr("n_curated * 10000 div n_arrived").as("yield_u4"))
      .orderBy($"phase")
  }

  /** CURATION FUNNEL (q250) — the release-report rollup of the q249
    * decision log: per source, arrivals and the count each stage cut
    * (under the pipeline's stage order, so the columns sum with
    * `n_curated` back to `n_arrived` — a funnel, not four overlapping
    * rates), plus the curated yield in exact 1e-4 units. The per-source
    * view is the point: a source whose volume is eaten by the exact
    * gate is re-crawling itself; one eaten by the floor is a quality
    * regression — the two incidents look identical in a global rate.
    *
    * Scale shape: one groupBy(source) over the corpus-sized decision
    * vector — O(sources) output rows, partial-aggregable counters; at
    * 100 TB this is the cheap summary pass over the log q249 lands. */
  def funnelReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decisionVector(spark, dir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_arrived"),
        sum(when(!$"emitted", 1L).otherwise(0L)).as("n_exact_dropped"),
        sum(when($"emitted" && !$"nd_ok", 1L).otherwise(0L))
          .as("n_neardup_dropped"),
        sum(when($"emitted" && $"nd_ok" && !$"len_ok", 1L).otherwise(0L))
          .as("n_length_dropped"),
        sum(when($"emitted" && $"nd_ok" && $"len_ok" && !$"floor_ok", 1L)
          .otherwise(0L)).as("n_floor_dropped"),
        sum(when($"emitted" && $"nd_ok" && $"len_ok" && $"floor_ok", 1L)
          .otherwise(0L)).as("n_curated"))
      .select($"source", $"n_arrived", $"n_exact_dropped",
        $"n_neardup_dropped", $"n_length_dropped", $"n_floor_dropped",
        $"n_curated",
        expr("n_curated * 10000 div n_arrived").as("yield_u4"))
      .orderBy($"source")
  }
}
