package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scaled-DICTIONARY probe (round-14 verdict ask #7): the q298/q299
  * decade rows measure corpus growth at a FIXED dictionary (200-piece
  * seed, one benchmark gram set), so their ratios mostly show fixed
  * overhead. This main holds the corpus fixed and scales the
  * dictionary instead — seed vocab + prune schedule ×10 for the
  * unigram encoder, bench modulus 97 → 11 (≈9× bench docs, ≈9× gram
  * set) for the contamination gate — so the claimed O(vocabulary) EM
  * and O(gram-set) broadcast terms are the ONLY thing that can bend.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1b SPARK_GRAFT_CPUS=32 \
  *          java -cp ... graft.DictProbe
  * Prints one JSON line {"q298_dict_1x": sec, ...} (reps=2, min, same
  * clear-cache discipline as Bench — [[Bench.measure]] is reused).
  */
object DictProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import operators.TextAnalysis.{uniSeedMulti, uniPruneSchedule}
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q298_dict_1x" -> ((s, d) =>
        operators.TextAnalysis.unigramEncodeFertilityWith(
          s, d, uniSeedMulti, uniPruneSchedule)),
      "q298_dict_10x" -> ((s, d) =>
        operators.TextAnalysis.unigramEncodeFertilityWith(
          s, d, uniSeedMulti * 10, uniPruneSchedule.map(_ * 10))),
      "q299_grams_1x" -> ((s, d) =>
        streaming.ContamGate.contamGateBatchWith(s, d,
          operators.CorpusOps.benchMod)),
      "q299_grams_10x" -> ((s, d) =>
        streaming.ContamGate.contamGateBatchWith(s, d, 11L)))

    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val res = Bench.measure(spark, sfDir, qs, reps)
    // a failed measurement emits JSON null (never a -1.0 sentinel that a
    // downstream ratio would silently treat as a number — r14 ADVICE) and
    // the process exits nonzero so the probe harness can't record it
    val anyFailed = res.exists(_.okSecs.isEmpty)
    val line = res.sortBy(_.name).map { m =>
      val sec =
        if (m.okSecs.nonEmpty)
          (math.round(m.okSecs.min * 1000) / 1000.0).toString // round-ok: display rounding of probe wall-clock, not a data value
        else "null"
      s""""${m.name}":$sec"""
    }.mkString("{", ",", s""","sf":"$sfDir","reps":$reps}""")
    // stdout stays parseable: everything above logs to stderr
    println(line)
    spark.stop()
    if (anyFailed) sys.exit(1)
  }
}
