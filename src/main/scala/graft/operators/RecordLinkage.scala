package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy record linkage: match DIRTY incoming strings against a clean
  * entity dictionary without the O(n²) all-pairs scan — the
  * blocking-then-verification shape every entity-resolution pipeline
  * uses (and the string cousin of the MinHash/LSH near-dup family:
  * cheap candidate generation, exact verification inside the block).
  */
object RecordLinkage {

  /** Declared query: link corrupted part names back to the distinct-name
    * dictionary. The dirty side drops each name's penultimate character
    * (a deterministic typo that leaves the first word — the block key —
    * intact); candidates are (same first word, |length diff| ≤ 2); a
    * candidate links when `levenshtein ≤ 2`. Both engines implement the
    * same textbook edit distance, so the pair set hash-matches exactly.
    *
    * Scale shape: the only join is block-keyed — candidates are
    * Σ_b |dict_b|·|dirty_b|, never |dict|·|dirty|; the length band prunes
    * inside the block before the O(len²) levenshtein runs, and the
    * verification is per-row codegen'd. Skewed blocks (one brand name
    * dominating) get `Guards.capHotKeys` in front at corpus scale; a
    * small dictionary side should be `broadcast()` so the dirty stream
    * never shuffles — with 8 blocks here Spark's AQE picks the broadcast
    * by itself. */
  def fuzzyLinkParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, dir)
      .groupBy($"p_name")
      .agg(min($"p_partkey").as("name_id"))
    val dict = names.select($"name_id", $"p_name",
      split($"p_name", " ").getItem(0).as("block"),
      length($"p_name").as("len"))
    val dirty = names.select(
      ($"name_id" + 500000L).as("variant_id"),
      expr("concat(substring(p_name, 1, length(p_name)-2), " +
        "substring(p_name, length(p_name), 1))").as("vname"))
      .select($"variant_id", $"vname",
        split($"vname", " ").getItem(0).as("vblock"),
        length($"vname").as("vlen"))
    dict.join(dirty,
        $"block" === $"vblock" && abs($"len" - $"vlen") <= 2)
      .withColumn("dist", levenshtein($"p_name", $"vname"))
      .filter($"dist" <= 2)
      .select($"name_id", $"p_name", $"variant_id", $"vname",
        $"dist".cast("long").as("dist"))
      .orderBy($"name_id", $"variant_id")
  }

  /** All exact-match keys for edit-distance-≤1 blocking: the string
    * itself plus every single-character deletion (FastSS / SymSpell
    * deletion neighborhood, Bocek et al. 2007). Two strings at edit
    * distance ≤ 1 ALWAYS share a key — substitution: both delete the
    * differing position; insertion/deletion: the longer side's deletion
    * equals the shorter string; equality: the identity key — so the
    * key join is a LOSSLESS candidate generator for distance-1 lookup. */
  private def delKeys(c: String): org.apache.spark.sql.Column =
    expr(s"array_union(array($c), transform(sequence(0, length($c) - 1), " +
      s"i -> concat(substr($c, 1, i), substr($c, i + 2, length($c)))))")

  /** Declared query: typo-variant token linking — the spelling-variant
    * resolution a keyword monitor needs (the reference greps fixed
    * keyword lists; one character of user typo defeats a literal match,
    * q05's hyphen-variant regexes being the hand-built special case).
    * Ground-truth typos derive deterministically from the vocabulary
    * (each token ≥ 4 chars loses the character at md5-chosen position),
    * then link back against the FULL vocabulary through the deletion-
    * neighborhood key join, verified with native `levenshtein ≤ 1`.
    *
    * Scale shape: both key relations are linear in (token TYPES ×
    * token length) — the corpus token stream collapses to its type
    * dictionary first, so the join never sees occurrences; the
    * quadratic all-pairs form lives only in the DuckDB oracle (the
    * q114 discipline). Hot keys (short strings share deletions) are
    * bounded by the alphabet at length ≤ 2 and excluded by the ≥ 4
    * typo-source floor. */
  def typoLink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.{tokens, md5Hash32}
    val vocab = graft.CacheGuard.barrier(
      Tables.documents(spark, dir)
        .select(explode(tokens($"text")).as("t")).distinct())
    val typos = vocab.filter(length($"t") >= 4)
      .select($"t", (md5Hash32($"t") % length($"t")).cast("int").as("p"))
      .select(concat($"t".substr(lit(1), $"p"),
        $"t".substr($"p" + 2, length($"t"))).as("typo"))
      .distinct()
    val vkeys = vocab.select($"t", explode(delKeys("t")).as("k"))
    val tkeys = typos.select($"typo", explode(delKeys("typo")).as("k"))
    tkeys.join(vkeys, "k")
      .select($"typo", $"t".as("matched")).distinct()
      .withColumn("dist", levenshtein($"typo", $"matched").cast("long"))
      .filter($"dist" <= 1)
      .orderBy($"typo", $"matched")
  }
}
