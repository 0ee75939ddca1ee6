package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

// Sub-step profiler for the MinHash-LSH dedup path (q19). Kept as a dev
// tool: `sbt "runMain graft.Prof"` prints per-stage wall time at sf0.1.
// History: the combinator-expression signature stage measured 146 s here
// (interpreted HOF lambdas); the native MinHashSignature + WordShinglesExpr
// expressions brought corpus→signature to ~3 s.
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val corpus = operators.DedupOps.dupCorpus(spark, dir)
    time("corpus count")(corpus.count())
    val arrs = corpus
      .select($"doc_id", array_distinct(wordShingles(tokens($"text"), 3)).as("arr"))
      .filter(size($"arr") > 0)
    time("shingle arrays")(arrs.count())
    val perms = 32
    val sig = arrs.select($"doc_id",
      graft.functions.native.minHashSig($"arr", perms).as("sig")).cache()
    time("signatures")(sig.count())
    val banded = sig.select($"doc_id", $"sig",
        posexplode(transform(sequence(lit(0), lit(7)),
          b => xxhash64(slice($"sig", b * 4 + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    time("banded")(banded.count())
    val cand = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.band_key" === $"y.band_key" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"), $"x.sig".as("sa"), $"y.sig".as("sb"))
    time("cand join raw")(cand.count())
    val dd = cand.dropDuplicates("a", "b")
    time("cand dedup")(dd.count())
    time("full q19")(operators.DedupOps.minHashLshPairs(spark, dir).count())
    spark.stop()
  }
}
