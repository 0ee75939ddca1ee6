package graft.sources.pagefeed

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-v2 source for a cursor-paginated page feed — the engine-level
  * realization of the reference's Twitter v2 fetch loop
  * (`tweet_download.py:62–103`): pages arrive as numbered JSON documents
  * (`{"data": [...], "meta": {"next_token": ...}}`), and the consumer's
  * resume point is the page cursor.
  *
  * As a STREAM, the cursor IS the Structured Streaming offset: each
  * micro-batch reads pages `(start, end]`, and the checkpoint replaces the
  * reference's hand-rolled next_token file (`:96–100`) — stop and restart
  * resumes exactly where the cursor left off, no reprocessing. As a BATCH
  * it reads all pages present. A live HTTP feed would implement the same
  * contract with the fetcher inside the partition reader; here pages are
  * directory files so the source is deterministic and testable.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.pagefeed.PageFeedProvider")
  *     .option("path", dir).load()
  * }}}
  */
object PageFeed {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("page_id", LongType)))

  /** Option keys: fetcher implementation class, per-fetch retry budget,
    * base retry backoff (ms, exponential 2^n; 0 = immediate retry —
    * set it for live origins so a rate-limited endpoint is not hammered
    * through the whole budget in milliseconds), inter-page politeness
    * delay (the reference's `time.sleep(3)` between Twitter pages,
    * `tweet_download.py:100` — ms here, applied between successive
    * cursor-walk fetches), and a per-trigger page cap (bounds one
    * micro-batch so a long backlog drains in rate-limited increments
    * instead of one giant batch). */
  val fetcherOpt = "fetcher"
  val attemptsOpt = "fetchAttempts"
  val backoffOpt = "fetchBackoffMs"
  val pageDelayOpt = "pageDelayMs"
  val maxPagesPerTriggerOpt = "maxPagesPerTrigger"
  val defaultAttempts = 3
  val defaultBackoffMs = 0L
  val defaultPageDelayMs = 0L
  val defaultMaxPagesPerTrigger = Long.MaxValue

  /** Injectable time seam so pacing is spec-assertable without real
    * sleeps: production uses [[SystemClock]]; tests inject a virtual
    * clock and assert fetch timestamps are spaced ≥ the delay. */
  trait Clock extends Serializable {
    def nowMs(): Long
    def sleepMs(ms: Long): Unit
  }
  object SystemClock extends Clock {
    override def nowMs(): Long = System.currentTimeMillis()
    override def sleepMs(ms: Long): Unit = Thread.sleep(ms)
  }

  def instantiateFetcher(className: String): PageFetcher =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[PageFetcher]

  /** Instantiate + configure: the DSv2 option map rides to every
    * driver/executor instantiation site so option-driven fetchers (e.g.
    * [[HttpPageFetcher]]'s bearer token) see their settings everywhere
    * a fetch can happen. */
  def makeFetcher(className: String, options: Map[String, String]): PageFetcher = {
    val f = instantiateFetcher(className)
    f.configure(options)
    f
  }

  /** A 429 whose `Retry-After` header was parsed — thrown by
    * [[HttpPageFetcher]], given header-driven pacing (not budget-burning
    * blind backoff) by [[fetchWithRetry]]. `retryAfterMs = None` means
    * the origin sent no usable header; the normal backoff path applies. */
  case class RateLimited(page: Long, retryAfterMs: Option[Long])
    extends java.io.IOException(
      s"HTTP 429 fetching page $page (Retry-After: " +
        s"${retryAfterMs.map(ms => s"${ms}ms").getOrElse("absent")})")

  /** Ceiling on one honored `Retry-After` wait — a hostile or broken
    * origin must not park a task for hours on one header. */
  val maxRetryAfterWaitMs = 600000L

  /** Honored `Retry-After` waits per fetch before 429s fall back to the
    * attempt-counted path — bounds the worst case (an origin that 429s
    * forever) without burning the transient-fault budget on pacing. */
  val maxRateLimitWaits = 10

  /** `fetch` with bounded retry and exponential backoff (base × 2^n, like
    * `BinarySink.RetryPolicy`) — transient fetch faults are absorbed here
    * (both on the driver's cursor walk and inside partition readers)
    * instead of failing the task/query.
    *
    * [[RateLimited]] with a parsed `Retry-After` is pacing, not a fault:
    * the wait is the header's (clamped to [[maxRetryAfterWaitMs]]) and
    * does NOT consume the retry budget — up to [[maxRateLimitWaits]]
    * times, after which (or without the header) 429 retries count like
    * any other transient failure. */
  def fetchWithRetry(fetcher: PageFetcher, path: String, page: Long,
                     maxAttempts: Int,
                     backoffMs: Long = defaultBackoffMs,
                     clock: Clock = SystemClock): Option[Array[Byte]] = {
    var attempt = 0
    var rateLimitWaits = 0
    var out: Option[Array[Byte]] = None
    var done = false
    while (!done) {
      try { out = fetcher.fetch(path, page); done = true }
      catch {
        case RateLimited(_, Some(waitMs))
            if rateLimitWaits < maxRateLimitWaits =>
          rateLimitWaits += 1
          clock.sleepMs(math.min(waitMs, maxRetryAfterWaitMs))
        case e: Exception =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          if (backoffMs > 0L) clock.sleepMs(backoffMs * (1L << (attempt - 1)))
      }
    }
    out
  }

  /** Walk the cursor chain through the fetcher from `startPage`, returning
    * the total number of consumable pages — the reference's fetch-loop
    * stop conditions (`tweet_download.py:82–103`) verbatim: stop when a
    * page is absent (fetch → None), when its `data` is empty, or when
    * `meta.next_token` is missing/null. The page that ends the chain IS
    * consumed. `startPage` is the stored-cursor resume (the reference's
    * next_token file): pages before it are already consumed and are NOT
    * re-fetched — a streaming source calls this once per trigger, and
    * re-walking an n-page feed from 0 every trigger would be O(n) GETs per
    * trigger against a live origin. */
  def cursorWalk(path: String, fetcher: PageFetcher,
                 maxAttempts: Int = defaultAttempts,
                 startPage: Long = 0L,
                 backoffMs: Long = defaultBackoffMs,
                 pageDelayMs: Long = defaultPageDelayMs,
                 maxPages: Long = Long.MaxValue,
                 clock: Clock = SystemClock): Long = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var page = startPage
    var go = true
    // politeness pacing: each fetch after the first waits until at least
    // pageDelayMs has passed since the PREVIOUS fetch started — the
    // reference's inter-page sleep, but accounting for time already spent
    // parsing so a slow page is not double-charged
    var lastFetchAt = Long.MinValue
    while (go && page - startPage < maxPages) {
      if (pageDelayMs > 0L && lastFetchAt != Long.MinValue) {
        val wait = lastFetchAt + pageDelayMs - clock.nowMs()
        if (wait > 0L) clock.sleepMs(wait)
      }
      lastFetchAt = clock.nowMs()
      fetchWithRetry(fetcher, path, page, maxAttempts, backoffMs, clock) match {
        case None => go = false
        case Some(bytes) =>
          val doc = mapper.readTree(bytes)
          val data = doc.get("data")
          val next = Option(doc.get("meta")).map(_.get("next_token")).orNull
          page += 1
          if (data == null || data.size() == 0 || next == null || next.isNull)
            go = false
      }
    }
    page
  }

  /** Available-page count with the default file-backed fetcher. */
  def pagesAvailable(dir: String): Long = cursorWalk(dir, new FileFetcher)

  def pageFile(dir: String, page: Long): java.io.File =
    new java.io.File(dir, f"page-$page%05d.json")

  /** Test/demo helper: render one page document in the reference's shape. */
  def writePage(dir: String, page: Long, rows: Seq[(Long, Long, String, Double)],
                hasNext: Boolean): Unit = {
    new java.io.File(dir).mkdirs()
    val data = rows.map { case (e, u, t, v) =>
      s"""{"event_id":$e,"user_id":$u,"event_type":"$t","value":$v}"""
    }.mkString("[", ",", "]")
    val next = if (hasNext) s""""${page + 1}"""" else "null"
    val doc = s"""{"data":$data,"meta":{"next_token":$next}}"""
    java.nio.file.Files.writeString(pageFile(dir, page).toPath, doc)
  }
}

/** Injectable `page → bytes` seam — the analog of `BinarySink`'s
  * injectable IO. The production feed implements `fetch` as an HTTP GET
  * (the reference's `requests.get` loop, `tweet_download.py:25–30`);
  * tests inject fault behavior. Implementations need a no-arg constructor:
  * the class NAME is what travels in the DSv2 options and serialized
  * partitions, and each driver/executor instantiates its own. */
trait PageFetcher extends Serializable {
  /** Bytes of page `page`, or None when the page does not (yet) exist —
    * the terminal stop condition. Transient faults may throw; callers
    * retry up to `fetchAttempts` times ([[PageFeed.fetchWithRetry]]). */
  def fetch(path: String, page: Long): Option[Array[Byte]]

  /** Configuration hook: the source's full DSv2 option map, delivered
    * after no-arg instantiation on every driver/executor that builds a
    * fetcher. Default no-op — [[FileFetcher]] needs nothing; the HTTP
    * fetcher reads its auth/timeout options here (credentials travel as
    * reader OPTIONS, never baked into class names or environment). */
  def configure(options: Map[String, String]): Unit = ()
}

/** Default fetcher: pages are numbered files in a local directory. */
class FileFetcher extends PageFetcher {
  override def fetch(path: String, page: Long): Option[Array[Byte]] = {
    val f = PageFeed.pageFile(path, page)
    if (f.exists()) Some(java.nio.file.Files.readAllBytes(f.toPath)) else None
  }
}

class PageFeedProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PageFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PageFeedTable(properties.get("path"),
      Option(properties.get(PageFeed.fetcherOpt))
        .getOrElse(classOf[FileFetcher].getName),
      Option(properties.get(PageFeed.attemptsOpt))
        .map(_.toInt).getOrElse(PageFeed.defaultAttempts),
      Option(properties.get(PageFeed.backoffOpt))
        .map(_.toLong).getOrElse(PageFeed.defaultBackoffMs),
      Option(properties.get(PageFeed.pageDelayOpt))
        .map(_.toLong).getOrElse(PageFeed.defaultPageDelayMs),
      Option(properties.get(PageFeed.maxPagesPerTriggerOpt))
        .map(_.toLong).getOrElse(PageFeed.defaultMaxPagesPerTrigger),
      properties.asScala.toMap)
}

class PageFeedTable(path: String, fetcherClass: String, attempts: Int,
                    backoffMs: Long, pageDelayMs: Long, maxPagesPerTrigger: Long,
                    fetcherOptions: Map[String, String])
    extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"pagefeed($path)"
  override def schema(): StructType = PageFeed.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new PageFeedScan(path, fetcherClass, attempts, backoffMs,
          pageDelayMs, maxPagesPerTrigger, fetcherOptions)
    }
}

class PageFeedScan(path: String, fetcherClass: String, attempts: Int,
                   backoffMs: Long, pageDelayMs: Long, maxPagesPerTrigger: Long,
                   fetcherOptions: Map[String, String])
    extends Scan {
  override def readSchema(): StructType = PageFeed.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val pages = PageFeed.cursorWalk(path,
        PageFeed.makeFetcher(fetcherClass, fetcherOptions), attempts, 0L,
        backoffMs, pageDelayMs)
      (0L until pages)
        .map(PagePartition(path, _, fetcherClass, attempts, backoffMs,
          fetcherOptions): InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PageFeedMicroBatchStream(path, fetcherClass, attempts, backoffMs,
      pageDelayMs, maxPagesPerTrigger, fetcherOptions)
}

/** Offset = number of pages fully consumed (the cursor). */
case class PageOffset(pages: Long) extends Offset {
  override def json(): String = pages.toString
}

class PageFeedMicroBatchStream(path: String, fetcherClass: String, attempts: Int,
                               backoffMs: Long,
                               pageDelayMs: Long = PageFeed.defaultPageDelayMs,
                               maxPagesPerTrigger: Long = PageFeed.defaultMaxPagesPerTrigger,
                               fetcherOptions: Map[String, String] = Map.empty)
    extends MicroBatchStream {
  // resume point for the incremental cursor walk: pages at or beyond this
  // offset are the only ones probed per trigger — a re-walk from 0 every
  // trigger would be O(feed length) fetches per trigger on a live origin.
  // Restart recovery initializes it through deserializeOffset (the
  // checkpointed cursor), mirroring the reference's stored next_token.
  @volatile private var walkFrom = 0L
  override def initialOffset(): Offset = PageOffset(0L)
  override def latestOffset(): Offset = {
    // maxPagesPerTrigger bounds this walk, so one trigger consumes a
    // rate-limited increment of a long backlog rather than all of it
    walkFrom = math.max(walkFrom, PageFeed.cursorWalk(path,
      PageFeed.makeFetcher(fetcherClass, fetcherOptions), attempts, walkFrom,
      backoffMs, pageDelayMs, maxPagesPerTrigger))
    PageOffset(walkFrom)
  }
  override def deserializeOffset(json: String): Offset = {
    val pages = json.trim.toLong
    walkFrom = math.max(walkFrom, pages)
    PageOffset(pages)
  }
  override def commit(end: Offset): Unit = () // the feed itself is durable
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].pages
    val e = end.asInstanceOf[PageOffset].pages
    (s until e).map(PagePartition(path, _, fetcherClass, attempts, backoffMs,
        fetcherOptions): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
}

case class PagePartition(path: String, page: Long,
                         fetcherClass: String, attempts: Int,
                         backoffMs: Long,
                         fetcherOptions: Map[String, String] = Map.empty)
    extends InputPartition

object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      // the fetch goes through the injected fetcher with bounded retry —
      // a page that vanished between planning and read yields 0 rows
      // rather than a task failure
      private val data = PageFeed.fetchWithRetry(
          PageFeed.makeFetcher(p.fetcherClass, p.fetcherOptions), p.path, p.page,
          p.attempts, p.backoffMs)
        .map(bytes => mapper.readTree(bytes).get("data")).orNull
      private var i = -1
      override def next(): Boolean = { i += 1; data != null && i < data.size() }
      override def get(): InternalRow = {
        val r = data.get(i)
        InternalRow(
          r.get("event_id").asLong(),
          r.get("user_id").asLong(),
          UTF8String.fromString(r.get("event_type").asText()),
          r.get("value").asDouble(),
          p.page)
      }
      override def close(): Unit = ()
    }
  }
}
