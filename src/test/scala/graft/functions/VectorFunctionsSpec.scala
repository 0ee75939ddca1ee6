package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {

  private def pairDf(a: Seq[Double], b: Seq[Double]) = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
  }

  test("dot: index-ordered product sum") {
    val r = pairDf(Seq(1, 2, 3), Seq(4, 5, 6)).select(dot(col("a"), col("b")))
      .head().getDouble(0)
    assert(r === 32.0)
  }

  test("norm: euclidean length") {
    val r = pairDf(Seq(3, 4), Seq(0, 0)).select(norm(col("a"))).head().getDouble(0)
    assert(r === 5.0)
  }

  test("cosine: identical vectors ≈ 1, orthogonal = 0") {
    val same = pairDf(Seq(1, 2, 2), Seq(1, 2, 2))
      .select(cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(same - 1.0) < 1e-12)
    val orth = pairDf(Seq(1, 0), Seq(0, 1))
      .select(cosine(col("a"), col("b"))).head().getDouble(0)
    assert(orth === 0.0)
  }

  test("cosine works on float arrays (the embeddings column type)") {
    import spark.implicits._
    val r = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .select(cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-6)
  }

  test("signLshBucket: deterministic, in range, equal for equal vectors") {
    import spark.implicits._
    val v = Seq(0.3, -1.2, 0.8, 2.0, -0.5)
    val df = Seq((v, v.map(_ * 2.0))).toDF("a", "scaled")
    val Array(b1, b2, b3) = df.select(
      signLshBucket(col("a"), 8), signLshBucket(col("a"), 8),
      signLshBucket(col("scaled"), 8)).head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(b1 === b2)
    // positive scaling preserves every projection's sign → same bucket
    assert(b1 === b3)
    assert(b1 >= 0L && b1 < (1L << 8))
  }

  test("signLshBucket: negated vector lands in the complementary bucket region") {
    import spark.implicits._
    val v = Seq(0.3, -1.2, 0.8, 2.0, -0.5)
    val df = Seq((v, v.map(-_))).toDF("a", "neg")
    val r = df.select(signLshBucket(col("a"), 4), signLshBucket(col("neg"), 4)).head()
    // sign flips on every plane with a nonzero projection → different bucket
    assert(r.getLong(0) !== r.getLong(1))
  }
}
