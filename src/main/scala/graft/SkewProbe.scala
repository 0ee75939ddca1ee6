package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement main (like [[Prof]]): manual salting vs AQE skew-join
  * on the q38 join, run at a probe SF. Three physical strategies over two
  * key distributions:
  *
  *   - `plain`  — the unsalted shuffle join, AQE defaults (skew handling
  *     armed but thresholds at the 256 MB default — the "do nothing"
  *     baseline);
  *   - `aqe`    — unsalted, AQE skew-join FORCED via lowered
  *     `skewedPartitionThresholdInBytes`/`skewedPartitionFactor` (what a
  *     100 TB job sees when a reducer partition genuinely exceeds the
  *     threshold);
  *   - `salted` — the explicit q38 8-way salt.
  *
  * Distributions: `natural` = events.user_id as generated (mild:
  * ~15k keys, ≤2× mean); `hot` = 1/3 of all rows collapsed onto ONE key
  * (the pathological tail a real log table grows). Broadcast is disabled
  * so the dim side actually shuffles — at 100 TB the dim doesn't fit in
  * an executor, which is the only regime where any of this matters.
  *
  * `sbt "runMain graft.SkewProbe [sfDir]"` prints min-of-3 wall seconds
  * per (distribution, strategy); findings recorded in SCALE.md. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // the dim must SHUFFLE for skew to matter at all
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def events(hot: Boolean): DataFrame = {
      val ev = Tables.events(spark, dir).select($"user_id", $"value")
      if (!hot) ev
      else ev.withColumn("user_id",
        // collapse a third of the stream onto one real key: the
        // heavy-tailed log-table shape AQE's skew split targets
        when(xxhash64($"value") % 3 === 0, lit(342L)).otherwise($"user_id"))
    }
    val dim = Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment")

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(operators.Relational.u4($"value").cast("decimal(38,0)")).as("s"))

    def plain(hot: Boolean) =
      agg(events(hot).join(dim, $"user_id" === $"c_custkey"))
    def salted(hot: Boolean) =
      agg(operators.SkewJoin.saltedJoin(events(hot), "user_id", dim,
        "c_custkey", salts = 8))

    def time(name: String, forceSkew: Boolean)(df: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      if (forceSkew) {
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      } else {
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      }
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skewprobe] $name%-18s min=${secs.min}%6.2f s  " +
        f"reps=${secs.map(s => f"$s%.2f").mkString("[", ",", "]")}")
    }

    for (hot <- Seq(false, true)) {
      val tag = if (hot) "hot" else "natural"
      time(s"$tag/plain", forceSkew = false)(plain(hot))
      time(s"$tag/aqe-skew", forceSkew = true)(plain(hot))
      time(s"$tag/salted", forceSkew = false)(salted(hot))
    }
    spark.stop()
  }
}
