package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Failure-transparency contract of the bench harness: a broken query is
  * visible as `ok:false` with its error, never a silently-recorded timing,
  * and does not abort the queries after it. */
class BenchSpec extends SparkSpec {

  private def good(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d)

  private def bad(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/no_such_table.parquet")

  test("a deliberately-broken query yields ok:false with the error; others still run") {
    val json = Bench.run(spark, sf, Map(
      "a_ok" -> (good _),
      "b_broken" -> (bad _),
      "c_ok_after_failure" -> (good _)))
    assert(json.contains(""""b_broken":{"sec":"""))
    assert(json.contains(""""ok":false"""))
    assert(json.contains(""""n_failed":1"""))
    // queries after the failure still ran and are healthy
    assert(json.contains(""""c_ok_after_failure":{"sec":"""))
    assert(json.split(""""ok":true""").length - 1 === 2)
    // the error text is present and JSON-escaped into one line
    assert(json.contains(""""err":""") && !json.contains("\n"))
  }

  test("the result line is parseable shape: one object with total + per-query maps") {
    val json = Bench.run(spark, sf, Map("a_ok" -> (good _)))
    assert(json.startsWith("""{"metric":"total","value":"""))
    assert(json.contains(""""queries":{"a_ok":"""))
    assert(json.contains(""""health":{"a_ok":{"sec":"""))
    assert(json.contains(""""secs":[""")) // per-rep spread is visible
    assert(json.endsWith(s""""sf":"$sf"}"""))
  }
}
