package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Deduplication suite for training-data pipelines (north-star, SURVEY.md
  * §2.9): exact hash dedup, exact n-gram Jaccard with LSH-style blocking,
  * MinHash+LSH banding, and SimHash fingerprints.
  *
  * Scale design: every near-dup variant is CANDIDATE-GENERATION (a cheap
  * blocking key, one shuffle) followed by pair VERIFICATION restricted to
  * in-block pairs. Nothing here ever builds the O(n²) cross join; block
  * sizes are explicitly capped so a degenerate key (e.g. empty documents)
  * cannot produce a quadratic blowup on a skewed cluster partition.
  */
object DedupOps {

  /** The driver's `documents` table contains no duplicates at any SF, so
    * dedup operators run over documents ∪ documents-with-shifted-ids: every
    * text then has exactly two copies and the operators have real work to
    * do. The same union is reproduced in the DuckDB oracle. */
  val dupOffset = 100000L

  def dupCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    docs.unionByName(docs.withColumn("doc_id", $"doc_id" + dupOffset))
  }

  /** Exact dedup via content hash (the `drop_duplicates` D1/D2 semantics,
    * `parser_media_articles.py:83–84,98`, made deterministic): group by
    * fingerprint, keep min doc_id, report copy count. One shuffle on the
    * hash — at 100 TB this is the standard first dedup pass. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dupCorpus(spark, dir)
      .withColumn("fp", fingerprint($"text"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .filter($"n_copies" > 1)
      .select($"keep_doc_id", $"fp", $"n_copies")
      .orderBy($"keep_doc_id")
  }

  /** Shared shingle relation: (doc_id, shingle) distinct, for docs with at
    * least `n` tokens. */
  private def shingleRel(spark: SparkSession, dir: String, n: Int): DataFrame = {
    import spark.implicits._
    dupCorpus(spark, dir)
      .select($"doc_id", wordShingles(tokens($"text"), n).as("shingles"))
      .filter(size($"shingles") > 0)
      .select($"doc_id", explode($"shingles").as("sh"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup with single-minhash blocking.
    * Block key = min(md5(shingle)) per doc (a 1-permutation MinHash —
    * identical docs necessarily collide; near-identical docs collide with
    * probability ≈ their Jaccard). Blocks larger than `maxBlock` are
    * dropped (degenerate common-shingle blocks), then exact Jaccard is
    * computed only for in-block pairs via a shingle intersection count.
    * Fully SQL-expressible → DuckDB-oracled. */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
                        n: Int = 3, threshold: Double = 0.6,
                        maxBlock: Int = 20): DataFrame = {
    import spark.implicits._
    val sh = shingleRel(spark, dir, n).cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val blockKey = sh.groupBy($"doc_id").agg(min(md5($"sh")).as("bk"))
    val blocks = blockKey
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"bk")))
      .filter($"bsz" <= maxBlock)
    val cand = blocks.as("x").join(blocks.as("y"),
        $"x.bk" === $"y.bk" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"))
    val inter = cand
      .join(sh.as("sa"), $"a" === $"sa.doc_id")
      .join(sh.as("sb"), $"b" === $"sb.doc_id" && $"sa.sh" === $"sb.sh")
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("za"), $"a" === $"za.doc_id")
      .join(sizes.as("zb"), $"b" === $"zb.doc_id")
      .withColumn("jaccard",
        round($"n_inter".cast("double") /
          ($"za.n_sh" + $"zb.n_sh" - $"n_inter").cast("double"), 4))
      .filter($"jaccard" >= threshold)
      .select($"a", $"b", $"n_inter", $"jaccard")
      .orderBy($"a", $"b")
  }

  /** MinHash + LSH banding near-dup: `perms` md5-derived permutations →
    * signature; `bands` bands of `rows` values; candidate pairs share a
    * band; verified with estimated Jaccard = fraction of matching minhash
    * coordinates ≥ threshold. Driver-side loops none; everything is
    * explode + groupBy (2 shuffles) + a self-join on band keys. */
  def minHashLshPairs(spark: SparkSession, dir: String,
                      shingleN: Int = 3, perms: Int = 32,
                      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val rows = perms / bands
    val sh = shingleRel(spark, dir, shingleN)
    // minhash signature: for each perm i, min over shingles of h(i, sh)
    val sig = sh
      .select($"doc_id", explode(sequence(lit(0), lit(perms - 1))).as("perm"),
        md5Hash32(concat($"perm".cast("string"), lit("|"), $"sh")).as("h"))
      .groupBy($"doc_id", $"perm")
      .agg(min($"h").as("mh"))
    // band key: md5 over the ordered minhash values of the band
    val banded = sig
      .withColumn("band", ($"perm" / rows).cast("int"))
      .groupBy($"doc_id", $"band")
      .agg(md5(concat_ws(",", sort_array(collect_list(
        format_string("%03d:%d", $"perm", $"mh"))))).as("band_key"))
    val cand = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.band_key" === $"y.band_key" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .distinct()
    // verify: estimated jaccard = matching coordinate fraction
    val est = cand
      .join(sig.as("pa"), $"a" === $"pa.doc_id")
      .join(sig.as("pb"), $"b" === $"pb.doc_id" && $"pa.perm" === $"pb.perm")
      .groupBy($"a", $"b")
      .agg((sum(when($"pa.mh" === $"pb.mh", 1).otherwise(0)).cast("double") /
        lit(perms.toDouble)).as("est_jaccard"))
      .filter($"est_jaccard" >= threshold)
    est.select($"a", $"b", round($"est_jaccard", 4).as("est_jaccard"))
      .orderBy($"a", $"b")
  }

  /** SimHash 32-bit fingerprint per document: for each bit, sign of the
    * sum over tokens of ±1 by the token hash's bit. Near-dup docs land at
    * small Hamming distance. Expression/explode only — oracle-able since
    * the token hash is the shared md5-based 32-bit hash. */
  def simHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .withColumn("h", md5Hash32($"tok"))
    docs
      .select($"doc_id", $"h",
        explode(sequence(lit(0), lit(31))).as("bit"))
      // functions.shiftright only takes a literal shift; the SQL form
      // accepts a column, so the per-bit shift goes through expr().
      .groupBy($"doc_id", $"bit")
      .agg(sum(when(expr("shiftright(h, bit)").bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as("s"))
      .groupBy($"doc_id")
      .agg(sum(when($"s" > 0, expr("shiftleft(1L, bit)")).otherwise(0L))
        .as("simhash"))
      .orderBy($"doc_id")
  }
}
