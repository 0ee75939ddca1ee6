package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def one(text: String, col: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(col.as("r")).head().get(0)
  }

  test("tokens: lowercases, splits on runs of whitespace, drops empties") {
    assert(one("  Hello   WORLD\n\tx ", tokens(col("text")))
      === Seq("hello", "world", "x"))
  }

  test("tokens: empty and whitespace-only input give empty array") {
    assert(one("", tokens(col("text"))) === Seq())
    assert(one("   \n ", tokens(col("text"))) === Seq())
  }

  test("wordShingles: n-token sliding windows joined by space") {
    import spark.implicits._
    val r = Seq("a b c d").toDF("text")
      .select(wordShingles(tokens(col("text")), 3).as("sh")).head().getSeq[String](0)
    assert(r === Seq("a b c", "b c d"))
  }

  test("wordShingles: fewer than n tokens gives empty array, not negative range") {
    import spark.implicits._
    val r = Seq("a b").toDF("text")
      .select(wordShingles(tokens(col("text")), 3).as("sh")).head().getSeq[String](0)
    assert(r === Seq())
  }

  test("md5Hash32 matches first-8-hex-chars-of-md5 semantics") {
    // md5("abc") = 900150983cd24fb0..., first 8 hex = 0x90015098
    assert(one("abc", md5Hash32(col("text"))) === java.lang.Long.parseLong("90015098", 16))
  }

  test("fingerprint is invariant under case and whitespace runs") {
    val a = one("Hello   World", fingerprint(col("text")))
    val b = one("  hello world ", fingerprint(col("text")))
    val c = one("hello worlds", fingerprint(col("text")))
    assert(a === b)
    assert(a !== c)
  }

  test("punctCount counts punctuation characters only") {
    assert(one("a,b.c!", punctCount(col("text"))) === 3)
    assert(one("abc", punctCount(col("text"))) === 0)
  }

  test("stopwordCount counts token hits including repeats") {
    import spark.implicits._
    val r = Seq("the cat and the dog").toDF("text")
      .select(stopwordCount(tokens(col("text")), Seq("the", "and")).as("n"))
      .head().getInt(0)
    assert(r === 3)
  }
}
