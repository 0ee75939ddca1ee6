package graft.sources

import graft.SparkSpec
import graft.sources.pagefeed.{PageFeed, PageFeedProvider}
import org.apache.spark.sql.functions._

class PageFeedSpec extends SparkSpec {

  private val fmt = classOf[PageFeedProvider].getName

  private def feedDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pagefeed").toString

  test("batch read: all pages present, schema + page_id column") {
    val dir = feedDir()
    PageFeed.writePage(dir, 0L, Seq((1L, 10L, "click", 1.5), (2L, 11L, "view", 2.0)), hasNext = true)
    PageFeed.writePage(dir, 1L, Seq((3L, 10L, "click", 3.0)), hasNext = false)
    val df = spark.read.format(fmt).option("path", dir).load()
    assert(df.columns.toSeq ===
      Seq("event_id", "user_id", "event_type", "value", "page_id"))
    assert(df.count() === 3L)
    assert(df.filter(col("page_id") === 1L).count() === 1L)
  }

  test("cursor chain: a gap stops the available-page count (next_token semantics)") {
    val dir = feedDir()
    PageFeed.writePage(dir, 0L, Seq((1L, 1L, "a", 1.0)), hasNext = true)
    PageFeed.writePage(dir, 2L, Seq((9L, 9L, "z", 9.0)), hasNext = false) // page 1 missing
    assert(PageFeed.pagesAvailable(dir) === 1L)
  }

  test("micro-batch stream: cursor offset advances per page; checkpoint resumes, no reprocessing") {
    val dir = feedDir()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pf-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-pf-out").toString
    PageFeed.writePage(dir, 0L, Seq((1L, 10L, "click", 1.0)), hasNext = true)

    // parquet sink: fault-tolerant, so the restarted query recovers the
    // cursor from the checkpoint (memory sink can't recover)
    def startQuery() = spark.readStream.format(fmt).option("path", dir).load()
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ckpt).start()

    def written() = spark.read.parquet(out).select("event_id").collect()
      .map(_.getLong(0)).toSeq.sorted

    val q1 = startQuery()
    q1.processAllAvailable()
    assert(written() === Seq(1L))

    PageFeed.writePage(dir, 1L, Seq((2L, 11L, "view", 2.0)), hasNext = false)
    q1.processAllAvailable()
    assert(written() === Seq(1L, 2L))
    q1.stop()

    // restart from the checkpointed cursor: pages 0–1 must NOT re-emit
    val q2 = startQuery()
    q2.processAllAvailable()
    assert(written() === Seq(1L, 2L))
    PageFeed.writePage(dir, 2L, Seq((3L, 12L, "click", 3.0)), hasNext = false)
    q2.processAllAvailable()
    q2.stop()
    assert(written() === Seq(1L, 2L, 3L)) // exactly once each
  }
}
