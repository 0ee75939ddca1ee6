package graft.sources

import graft.SparkSpec
import graft.sources.pagefeed.{FileFetcher, PageFeed, PageFeedProvider, PageFetcher}
import org.apache.spark.sql.functions._

/** Fault-injecting fetcher: pages listed in `failuresLeft` throw that many
  * times before succeeding (local-mode tests share one JVM, so companion
  * state is visible to reader instances). No-arg constructible — the class
  * name travels through the DSv2 option. */
object FlakyFetcher {
  val failuresLeft = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Integer]()
  val attempts = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Integer]()
  def reset(failures: Map[Long, Int]): Unit = {
    failuresLeft.clear(); attempts.clear()
    failures.foreach { case (p, n) => failuresLeft.put(p, n) }
  }
}
class FlakyFetcher extends PageFetcher {
  private val inner = new FileFetcher
  override def fetch(path: String, page: Long): Option[Array[Byte]] = {
    FlakyFetcher.attempts.merge(page, 1, (a, b) => a + b)
    val left = FlakyFetcher.failuresLeft.getOrDefault(page, 0)
    if (left > 0) {
      FlakyFetcher.failuresLeft.put(page, left - 1)
      throw new java.io.IOException(s"transient fetch failure, page $page")
    }
    inner.fetch(path, page)
  }
}

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

  test("pluggable fetcher: transient fetch failures are retried, result complete") {
    val dir = feedDir()
    PageFeed.writePage(dir, 0L, Seq((1L, 10L, "click", 1.0)), hasNext = true)
    PageFeed.writePage(dir, 1L, Seq((2L, 11L, "view", 2.0)), hasNext = false)
    FlakyFetcher.reset(Map(1L -> 1)) // page 1 fails once, then recovers
    val df = spark.read.format(fmt).option("path", dir)
      .option(PageFeed.fetcherOpt, classOf[FlakyFetcher].getName)
      .option(PageFeed.attemptsOpt, "3").load()
    assert(df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // page 1 was fetched more than once (cursor walk + reader, with ≥1 retry)
    assert(FlakyFetcher.attempts.get(1L) >= 2)
  }

  test("pluggable fetcher: a fault outliving the retry budget is an error, not silence") {
    val dir = feedDir()
    PageFeed.writePage(dir, 0L, Seq((1L, 10L, "click", 1.0)), hasNext = false)
    FlakyFetcher.reset(Map(0L -> 100)) // page 0 fails far beyond the budget
    val df = spark.read.format(fmt).option("path", dir)
      .option(PageFeed.fetcherOpt, classOf[FlakyFetcher].getName)
      .option(PageFeed.attemptsOpt, "2").load()
    val e = intercept[Exception](df.count())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).map(String.valueOf(_).toLowerCase).exists(_.contains("transient fetch failure")))
  }

  test("stream with flaky fetcher: failed micro-batch resumes from the checkpointed cursor once the endpoint recovers") {
    val dir = feedDir()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pf-flaky-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-pf-flaky-out").toString
    PageFeed.writePage(dir, 0L, Seq((1L, 10L, "click", 1.0)), hasNext = true)
    PageFeed.writePage(dir, 1L, Seq((2L, 11L, "view", 2.0)), hasNext = false)

    def startQuery() = spark.readStream.format(fmt).option("path", dir)
      .option(PageFeed.fetcherOpt, classOf[FlakyFetcher].getName)
      .option(PageFeed.attemptsOpt, "2").load()
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ckpt).start()

    def written() = spark.read.parquet(out).select("event_id").collect()
      .map(_.getLong(0)).toSeq.sorted

    // endpoint is down hard for page 1: the stream fails mid-feed
    FlakyFetcher.reset(Map(1L -> 100))
    val q1 = startQuery()
    intercept[Exception](q1.processAllAvailable())
    q1.stop()

    // endpoint recovers: restart resumes from the checkpoint and the feed
    // completes exactly-once (page 0 not re-emitted twice)
    FlakyFetcher.reset(Map.empty)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    assert(written() === Seq(1L, 2L))
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

    // hasNext=true keeps the cursor chain open — a page whose next_token
    // is null ENDS the feed (reference stop condition), and later pages
    // would be unreachable
    PageFeed.writePage(dir, 1L, Seq((2L, 11L, "view", 2.0)), hasNext = true)
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

  test("politeness pacing: cursor-walk fetches spaced >= pageDelayMs, asserted without sleeping") {
    val dir = feedDir()
    (0L until 4L).foreach(p =>
      PageFeed.writePage(dir, p, Seq((p, p, "e", 1.0)), hasNext = p < 3))
    // virtual clock: nowMs advances 7 ms per fetch-side read (simulating
    // fetch+parse time), sleepMs jumps time forward and records the call
    val fetchTimes = scala.collection.mutable.ArrayBuffer[Long]()
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val clock = new PageFeed.Clock {
      var t = 1000L
      override def nowMs(): Long = { t += 7; t }
      override def sleepMs(ms: Long): Unit = { sleeps += ms; t += ms }
    }
    val recording = new PageFetcher {
      private val inner = new FileFetcher
      override def fetch(path: String, page: Long): Option[Array[Byte]] = {
        fetchTimes += clock.t // the instant the origin is hit
        inner.fetch(path, page)
      }
    }
    val pages = PageFeed.cursorWalk(dir, recording, pageDelayMs = 3000L, clock = clock)
    assert(pages === 4L)
    // every consecutive origin hit is >= the politeness delay apart
    // (reference contract: time.sleep(3) between pages)
    fetchTimes.zip(fetchTimes.drop(1)).foreach { case (a, b) =>
      assert(b - a >= 3000L, s"pages fetched ${b - a} ms apart")
    }
    assert(sleeps.size === 3) // one pause per page transition, none before page 0
    sleeps.foreach(s => assert(s <= 3000L)) // parse time is credited, not double-charged
  }

  test("pacing off by default: no sleeps scheduled on the plain walk") {
    val dir = feedDir()
    PageFeed.writePage(dir, 0L, Seq((1L, 1L, "a", 1.0)), hasNext = false)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val clock = new PageFeed.Clock {
      override def nowMs(): Long = 0L
      override def sleepMs(ms: Long): Unit = sleeps += ms
    }
    assert(PageFeed.cursorWalk(dir, new FileFetcher, clock = clock) === 1L)
    assert(sleeps.isEmpty)
  }

  test("maxPagesPerTrigger: one trigger drains a bounded increment; the next resumes the backlog") {
    val dir = feedDir()
    (0L until 5L).foreach(p =>
      PageFeed.writePage(dir, p, Seq((p, p, "e", 1.0)), hasNext = p < 4))
    // direct walk cap
    assert(PageFeed.cursorWalk(dir, new FileFetcher, maxPages = 2L) === 2L)
    // through the stream: each micro-batch consumes <= 2 pages
    val out = java.nio.file.Files.createTempDirectory("graft-pf-out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-pf-ck").toString
    val q = spark.readStream.format(fmt)
      .option("path", dir)
      .option(PageFeed.maxPagesPerTriggerOpt, "2")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() === 5L)
    // the run needed >= 3 micro-batches (2+2+1), not one giant batch
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
  }
}
