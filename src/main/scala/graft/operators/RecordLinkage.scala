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
}
