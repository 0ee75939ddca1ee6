package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave for the property check. */
  private def morton(x: Long, y: Long, bits: Int = 8): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue: hand value and property vs reference implementation") {
    import spark.implicits._
    assert(morton(5L, 3L) === 27L)
    val rng = new scala.util.Random(42)
    val pts = Seq.fill(200)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") === morton(r.getAs[Long]("x"), r.getAs[Long]("y")))
    }
  }

  test("zorderAudit: every z-block is an 8x8 tile and row mass is conserved") {
    val rows = Layout.zorderAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // zkey >> 6 fixes all but 3 x-bits and 3 y-bits: an 8x8 rectangle
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 7L)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 7L)
      assert(r.getAs[Long]("span") <= 64L)
    }
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === Tables.events(spark, sf).count())
  }

  test("compactionPlan: bins replay the greedy prefix-sum walk per source") {
    val rows = Layout.compactionPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, files) =>
      // collect() preserves the orderBy(source, lang) output order
      var cum = 0L
      files.foreach { f =>
        assert(f.getAs[Long]("bin") ===
          math.floorDiv(cum, Layout.compactionTarget))
        cum += f.getAs[Long]("bytes")
      }
      // bins are contiguous non-decreasing from 0
      val bins = files.map(_.getAs[Long]("bin"))
      assert(bins.head === 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a })
    }
    // inventory covers the whole corpus
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
  }

  test("compactionPlan: the prefix sum windows PER SOURCE — no global-order collapse") {
    val plan = Layout.compactionPlan(spark, sf)
      .queryExecution.executedPlan.toString
    // a partitioned window plans hashpartitioning on source, never a
    // single-partition rangepartitioning before the window
    assert(plan.contains("hashpartitioning(source"), plan.take(1500))
  }
}
