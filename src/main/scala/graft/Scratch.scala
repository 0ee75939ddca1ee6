package graft

import org.apache.spark.sql.SparkSession

/** Dev-only bimodality probe (round 17): q178 at sf1/sf1b lands in a
  * ~25 s regime or a ~280 s regime run-to-run with identical data and
  * code — task_ms differs 14×, so the PLAN (not the host) changes.
  * Runs one query N times in-process, prints wall + the final adaptive
  * plan's join inventory per rep, dumps full plans to /tmp for diffing.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q178_containment_keepers")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1b")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_BCAST").foreach(v =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    spark.sparkContext.setLogLevel("ERROR")
    val agg = new java.util.concurrent.atomic.AtomicLongArray(6)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          agg.addAndGet(0, m.executorRunTime)
          agg.addAndGet(1, m.shuffleWriteMetrics.bytesWritten)
          agg.addAndGet(2, m.shuffleWriteMetrics.writeTime / 1000000L)
          agg.addAndGet(3, m.shuffleReadMetrics.totalBytesRead)
          agg.addAndGet(4, m.executorCpuTime / 1000000L)
          agg.addAndGet(5, m.jvmGCTime)
        }
      }
    })
    for (rep <- 1 to reps) {
      val base = (0 until 6).map(agg.get).toArray
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val d = (0 until 6).map(i => agg.get(i) - base(i))
      println(f"[metrics] rep$rep task_s=${d(0) / 1000}%d swrite_mb=${d(1) >> 20}%d " +
        f"swrite_s=${d(2) / 1000}%d sread_mb=${d(3) >> 20}%d cpu_s=${d(4) / 1000}%d gc_s=${d(5) / 1000}%d")
      val comp = java.lang.management.ManagementFactory.getCompilationMXBean
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      val cc = pools.stream.filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
      val ccStr = new java.util.ArrayList[String]()
      cc.forEach(p => ccStr.add(s"${p.getName.replace("CodeHeap ", "")}=${p.getUsage.getUsed >> 20}/${p.getUsage.getMax >> 20}mb"))
      println(s"[jvm] rep$rep jit_total_s=${comp.getTotalCompilationTime / 1000} codecache ${String.join(" ", ccStr)}")
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator
        .map(_.trim.replaceAll("^[:+\\- ]*", ""))
        .filter(l => l.startsWith("Broadcast") || l.contains("SortMergeJoin")
          || l.contains("ShuffledHashJoin") || l.contains("NestedLoop"))
        .map(_.split("[ (]").take(2).mkString(" "))
        .toSeq.groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
      println(f"[scratch] rep$rep%d $secs%8.1f s rows=$n joins=${joins.mkString(", ")}")
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"/tmp/scratch_plan_rep$rep.txt"), plan)
      CacheGuard.release()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
