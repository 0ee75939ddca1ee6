package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.VectorFunctions.{dot, norm, signLshBucket}
import graft.Tables
import graft.operators.Quant

/** A vector on the semantic admission stream: `bucket` is the 16-plane
  * sign-LSH key ([[graft.functions.VectorExprs.lshCompute]], computed
  * relationally BEFORE the stateful stage so the stream and the replay
  * band with the identical expression), arrival order = vec_id. */
case class VecDoc(vec_id: Long, embedding: Seq[Float], bucket: Long)

/** A bucket's registered history: the first [[SemanticGate.groupCap]]
  * vectors, in vec_id order, that landed in this sign-LSH bucket. */
case class SemGateState(entries: Seq[VecDoc])

/** Per-vector verdict from one bucket group: registered earlier vectors
  * at quantized cosine ≥ τ. */
case class SemVerdict(vec_id: Long, bucket: Long, colliders: Seq[Long])

/** STREAMING SEMANTIC (embedding-cosine) GATE (q308) — the fourth
  * representation level of the admission-control kit: the text gates act
  * on exact hashes (q94), lexical MinHash (q173) and n-gram sets (q299),
  * the media gate on perceptual hashes (q305/q307) — none of them sees a
  * PARAPHRASE (same meaning, disjoint surface forms). The reference's
  * only dedup is the exact keep-first of
  * `parser_media_articles.py:83-84`; this is that admission rule at the
  * semantic level. This gate admits
  * an arriving vector iff no previously-seen vector in its sign-LSH
  * bucket sits at cosine ≥ τ — SemDeDup (q82) turned into admission
  * control, the way q173 is batch LSH dedup turned online.
  *
  * Mechanics: one 16-plane sign-LSH bucket per vector (single-probe: an
  * EXACT duplicate has identical signs, so its recall is guaranteed;
  * near-duplicate recall is the single-band collision probability — the
  * same documented trade as the q54 pair blocking, and the multi-probe
  * upgrade path is exactly q302's rotated second decomposition). Each
  * bucket's `GroupState` holds the registered history (first
  * [[groupCap]] arrivals, vec_id order) — SEEN-based registration, so
  * admission depends only on arrival order and the gate replays
  * relationally with no recursion (the q173 argument). Verification is
  * the r4-QUANTIZED cosine ≥ τ in BOTH the fold and the replay
  * ([[cosR4]] replicates the `VecDotExpr` left-fold arithmetic
  * bit-for-bit), so stream ≡ replay is exact, not approximate.
  *
  * The declared q308 IS the replay: bucket → rank ≤ cap → candidate
  * join (registered × later arrivals, one bucket each — no distinct
  * needed) → quantized-cosine verify → per-vector rollup.
  *
  * Scale shape: the stream shuffles each micro-batch once on the bucket
  * key (ONE row per vector); state is O(buckets × cap × dim) floats.
  * The replay's rank window partitions by bucket — cluster-sized, never
  * the corpus — and the candidate join is ≤ cap · corpus. */
object SemanticGate {

  val bits = 16
  val groupCap = 64

  /** Quantized-cosine admission threshold (τ = 0.95, the
    * embeddingNearDupPairs default). */
  val tau = 0.95

  /** The gate's corpus: embeddings doubled with an id-shifted exact copy
    * (the q54 convention — random vectors have no natural near-dups at
    * gate SFs, so every base vector's copy arrives after it and must be
    * suppressed at cosine 1.0). */
  def vecDocs(spark: SparkSession, dir: String): Dataset[VecDoc] = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
    base.unionByName(base.withColumn("vec_id", $"vec_id" + 100000L))
      .select($"vec_id", $"embedding",
        signLshBucket($"embedding", bits).as("bucket"))
      .as[VecDoc]
  }

  /** r4-quantized cosine with the exact `VecDotExpr`/`norm` arithmetic
    * (left fold in element order, float→double per element, norms as
    * sqrt of the self-dot, floor(x·1e4 + 0.5)/1e4) — shared by the
    * stream fold so it is bit-identical to the declared replay's
    * `Quant.r4(dot/(norm·norm))`. */
  def cosR4(a: Seq[Float], b: Seq[Float]): Double = {
    require(a.length == b.length,
      s"vector length mismatch: ${a.length} vs ${b.length}")
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dab += x * y; i += 1
    }
    i = 0
    while (i < a.length) { val x = a(i).toDouble; daa += x * x; i += 1 }
    i = 0
    while (i < b.length) { val y = b(i).toDouble; dbb += y * y; i += 1 }
    math.floor(dab / (math.sqrt(daa) * math.sqrt(dbb)) * 1e4 + 0.5) / 1e4
  }

  /** One bucket's fold step (stream + spec-shared): check each arrival
    * against the registered history, then register up to the cap. */
  def runFold(docs: Seq[VecDoc], state: Seq[VecDoc], bucket: Long,
              cap: Int = groupCap): (Seq[SemVerdict], Seq[VecDoc]) = {
    var entries = state
    val out = Seq.newBuilder[SemVerdict]
    docs.sortBy(_.vec_id).foreach { d =>
      val colliders = entries.collect {
        case e if cosR4(e.embedding, d.embedding) >= tau => e.vec_id
      }
      out += SemVerdict(d.vec_id, bucket, colliders)
      if (entries.size < cap) entries = entries :+ d
    }
    (out.result(), entries)
  }

  /** Stage 1 (stateful): fold each bucket group. One row per vector, so
    * the per-batch combine is a plain rollup ([[admittedOfBatch]]). */
  def gateStream(docs: Dataset[VecDoc]): Dataset[SemVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[SemGateState, SemVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, it: Iterator[VecDoc],
         state: GroupState[SemGateState]) =>
          val (out, entries) = runFold(it.toSeq,
            state.getOption.map(_.entries).getOrElse(Seq.empty), bucket)
          state.update(SemGateState(entries))
          out.iterator
      }
  }

  /** Per-batch combine: admitted iff no collider (single bucket per
    * vector — the rollup is 1:1, kept for interface parity with the
    * multi-arm gates and for foreachBatch use). */
  def admittedOfBatch(verdicts: DataFrame): DataFrame = {
    val spark = verdicts.sparkSession
    import spark.implicits._
    verdicts
      .select($"vec_id", explode_outer($"colliders").as("collider"))
      .groupBy($"vec_id")
      .agg(
        countDistinct($"collider").as("n_prior_semdups"),
        coalesce(min($"collider"), lit(-1L)).as("first_collider"))
      .select($"vec_id",
        ($"n_prior_semdups" === 0).as("admitted"),
        $"n_prior_semdups", $"first_collider")
  }

  /** Declared q308: the EXACT relational replay — per vector, the
    * admission verdict, the number of earlier in-bucket semantic
    * duplicates, and the earliest one. */
  def replayBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // norms once per vector BEFORE the join (the q54 discipline); the
    // bucketed relation feeds the rank side and the probe side — barrier
    val b = graft.CacheGuard.barrier(vecDocs(spark, dir).toDF()
      .withColumn("nrm", norm($"embedding")))
    val registered = b
      .withColumn("rk", row_number().over(
        Window.partitionBy($"bucket").orderBy($"vec_id")))
      .filter($"rk" <= groupCap)
    val hits = registered.as("x").join(b.as("y"),
        $"x.bucket" === $"y.bucket" && $"x.vec_id" < $"y.vec_id")
      .filter(Quant.r4(dot($"x.embedding", $"y.embedding") /
        ($"x.nrm" * $"y.nrm")) >= tau)
      .groupBy($"y.vec_id".as("b"))
      .agg(count(lit(1)).as("n_prior_semdups"),
        min($"x.vec_id").as("first_collider"))
    b.join(hits, b("vec_id") === hits("b"), "left")
      .select(b("vec_id"),
        $"n_prior_semdups".isNull.as("admitted"),
        coalesce($"n_prior_semdups", lit(0L)).as("n_prior_semdups"),
        coalesce($"first_collider", lit(-1L)).as("first_collider"))
      .orderBy($"vec_id")
  }
}
