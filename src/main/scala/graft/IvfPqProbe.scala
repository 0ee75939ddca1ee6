package graft

import org.apache.spark.sql.SparkSession

/** Dev decomposition probe for the q179 IVF-PQ composition (r16: the
  * sf10 decade row measured 24× on 10× data — super-linear CPU, not
  * I/O). Times each n-scale sub-step of [[operators.AnnSearch.ivfPqTopK]]
  * separately so the growth attributes to a stage, not a guess:
  * coarse assignment, PQ codebook training, corpus encode, full query.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.IvfPqProbe"
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String, f: () => Long): Unit = {
      val t0 = System.nanoTime(); val n = f()
      println(f"[ivfpq] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    operators.AnnSearch.ivfPqProbeSteps(spark, dir, time)
    spark.stop()
  }
}
