package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    val fact = Tables.events(spark, sf).select($"event_id", $"user_id", $"value")
    val dim = Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
    val salted = SkewJoin.saltedJoin(fact, "user_id", dim, "c_custkey", 8)
      .select($"event_id", $"c_mktsegment")
    val plain = fact.join(dim, $"user_id" === $"c_custkey")
      .select($"event_id", $"c_mktsegment")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }

  test("with broadcast disabled, the shuffle distributes on (key, salt)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SkewJoin.saltedJoin(
        Tables.events(spark, sf), "user_id",
        Tables.customer(spark, sf), "c_custkey", 8)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__fsalt"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
