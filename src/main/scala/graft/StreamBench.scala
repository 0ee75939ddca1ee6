package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{FullCurate, FullDoc}

/** Streaming throughput bench for the composed curation gate (q248):
  * feeds the composed corpus through [[FullCurate.curatedStream]] in
  * doc_id-ordered micro-batches via a MemoryStream and reports
  * sustained docs/sec — the capacity-planning number the batch bench
  * cannot give (state-store round trips, per-batch planning, and the
  * two stateful exchanges are the streaming-only costs).
  *
  * Protocol: the feature extraction (tokenize/fingerprint/minhash) is
  * done BEFORE the clock starts (it is q248's batch-side cost, already
  * benched); the measured window covers gate state folds + combine +
  * parquet append across `batches` micro-batches. One warm-up batch
  * (5% of the corpus) runs before the clock to absorb stream-graph
  * planning/codegen. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamBench [batches]"
  * Prints one JSON line {"metric":"stream_docs_per_sec",...}. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = FullCurate.fullDocs(spark, sfDir).collect().sortBy(_.doc_id)  // collect-ok: bench-driver fixture feed, not a query
    val floors = graft.operators.TextAnalysis
      .sourceQualityFloor(spark, sfDir).select($"source", $"thr_u4")
    floors.count() // materialize the floor table off the clock
    val outDir = java.nio.file.Files.createTempDirectory("graft-sb-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sb-ckpt").toString
    val mem = MemoryStream[FullDoc]
    val q = FullCurate.curatedStream(mem.toDS(), floors, outDir, ckpt)

    val (warm, rest) = docs.splitAt(math.max(1, docs.length / 20))
    mem.addData(warm.toIndexedSeq: _*)
    q.processAllAvailable() // warm-up batch, off the clock

    val per = math.max(1, rest.length / batches)
    // grouped(per) can emit batches+1 micro-batches when length is not
    // divisible — report the ACTUAL count, not the requested one, so the
    // derived per-batch constant (sec / batches) is honest
    val groups = rest.grouped(per).toSeq
    val t0 = System.nanoTime()
    groups.foreach { b =>
      mem.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val curated = spark.read.parquet(outDir).count()
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    println(s"""{"metric":"stream_docs_per_sec","value":${(rest.length / sec).round},"docs":${rest.length},"sec":${BigDecimal(sec).setScale(2, BigDecimal.RoundingMode.HALF_UP)},"batches":${groups.size},"batch_size":$per,"sec_per_batch":${BigDecimal(sec / groups.size).setScale(3, BigDecimal.RoundingMode.HALF_UP)},"curated_total":$curated,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
