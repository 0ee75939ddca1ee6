package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** One-question bench (round-11, verdict ask #7): does q38's manual
  * salted join still earn its keep against Spark 4 AQE's runtime
  * skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`), or
  * should it simplify away?
  *
  * Protocol: the q38 shape (events ⋈ customer on the 150-hot-key
  * user_id, segment rollup) on SPARK_GRAFT_SF_DIR, with broadcast
  * DISABLED (`autoBroadcastJoinThreshold=-1`) — at bench SFs the dim
  * side is broadcastable and ALL variants collapse to the same
  * broadcast plan, which is itself a finding: the salt only matters
  * when the dim outgrows broadcast. Variants: plain sort-merge join
  * with AQE skew handling off / on (thresholds lowered so the splitter
  * can see bench-scale partitions; defaults are tuned for 256 MB
  * cluster partitions) / the manual salt. Each runs `reps` times; we
  * report min wall sec and per-variant shuffle read+write bytes from a
  * task-metrics listener. Output: one JSON line + the BASELINE.md
  * paragraph is written from it. */
object SkewBench {

  private final class ShuffleMeter extends SparkListener {
    val read = new LongAdder; val write = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.add(m.shuffleReadMetrics.totalBytesRead)
        write.add(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snap(): (Long, Long) = (read.sum(), write.sum())
  }

  private def plainShape(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .join(Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment"),
        $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        (sum(operators.Relational.u4($"value").cast("decimal(38,0)"))
          .cast("double") / 1e4).as("sum_value"))
      .orderBy($"c_mktsegment")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // force the shuffle-join scenario salting exists for
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    // bench-scale AQE skew thresholds: a "skewed" partition is ≥ 4 MB
    // and ≥ 2x the median (defaults: 256 MB / 5x — sized for cluster
    // partitions, invisible at bench SFs)
    def aqeSkew(on: Boolean): Unit = {
      conf("spark.sql.adaptive.skewJoin.enabled", on.toString)
      conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      conf("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    }

    def measure(name: String, mk: () => DataFrame): (String, Double, Long, Long, String) = {
      var best = Double.MaxValue; var rb = 0L; var wb = 0L; var join = ""
      (1 to reps).foreach { _ =>
        spark.catalog.clearCache()
        val (r0, w0) = meter.snap()
        val t0 = System.nanoTime()
        val df = mk()
        df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously (listenerBus is
        // spark-private); a short settle keeps the byte deltas honest
        Thread.sleep(300)
        val (r1, w1) = meter.snap()
        // the FINAL (post-AQE) plan: which join strategy actually ran,
        // and whether the skew splitter fired (`isSkew=true` markers)
        val plan = df.queryExecution.executedPlan.toString
        val strat = Seq("SortMergeJoin", "BroadcastHashJoin",
          "ShuffledHashJoin").find(plan.contains).getOrElse("?")
        val skewed = if (plan.contains("isSkew=true") ||
          plan.contains("skewed=true")) "+skew-split" else ""
        join = strat + skewed
        if (sec < best) { best = sec; rb = r1 - r0; wb = w1 - w0 }
      }
      (name, best, rb, wb, join)
    }

    // warm-up (JIT/codegen) off the books
    plainShape(spark, sfDir).count()

    aqeSkew(on = false)
    val plain = measure("plain_smj_no_skew_handling",
      () => plainShape(spark, sfDir))
    aqeSkew(on = true)
    val aqe = measure("plain_smj_aqe_skew_join",
      () => plainShape(spark, sfDir))
    aqeSkew(on = false)
    val salted = measure("manual_salt_8",
      () => operators.SkewJoin.skewedRevenueBySegment(spark, sfDir))

    def j(r: (String, Double, Long, Long, String)) =
      s""""${r._1}":{"sec":${BigDecimal(r._2).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)},"shuffle_read_kb":${r._3 >> 10},"shuffle_write_kb":${r._4 >> 10},"join":"${r._5}"}"""
    println(s"""{"metric":"skew_join_ab","sf":"$sfDir","reps":$reps,${j(plain)},${j(aqe)},${j(salted)}}""")
    System.out.flush()
    spark.stop()
  }
}
