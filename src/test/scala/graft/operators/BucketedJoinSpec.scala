package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing = the co-located fact-fact join technique (SCALE.md): both
  * sides written bucketed by the join key means the join needs NO exchange
  * at read time — at 100 TB this turns the one remaining big shuffle
  * (lineitem⋈orders) into a scan-local join. Spec-only (the declared
  * queries read the driver's unbucketed parquet); this pins that the
  * technique actually works on this Spark build. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed saveAsTable on both sides -> join plans with zero shuffle exchanges") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // force the fact-fact (non-broadcast) path the technique exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      // and it still computes the right thing
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() === expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
