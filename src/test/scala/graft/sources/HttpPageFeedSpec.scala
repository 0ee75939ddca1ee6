package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sources.pagefeed.{HttpPageFetcher, PageFeed, PageFeedProvider}

/** The r15 verdict's #5: the reference's source IS the network
  * (`tweet_download.py:25–30` bearer-token GET with bounded retry), so the
  * DSv2 source must run over real sockets, not only the file fetcher.
  * These specs stand up an in-process loopback HTTP server (JDK
  * `com.sun.net.httpserver`, no new dependencies) and drive the SAME
  * cursor-walk / retry / stop-condition machinery through it — including
  * end-to-end batch and checkpointed streaming reads. */
class HttpPageFeedSpec extends SparkSpec {

  private val fmt = classOf[PageFeedProvider].getName

  /** One test server: pages are an in-memory map page→body; `fail5xx`
    * makes the next N requests for a page return 500 (transient-fault
    * injection); every request's Authorization header is recorded. */
  private class FeedServer {
    val pages = new ConcurrentHashMap[Long, String]()
    val fail5xx = new ConcurrentHashMap[Long, AtomicInteger]()
    // page → (remaining 429s, Retry-After header value or null for none)
    val rateLimit = new ConcurrentHashMap[Long, (AtomicInteger, String)]()
    val authHeaders = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val hits = new AtomicInteger(0)
    val redirectedHits = new AtomicInteger(0)

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // a 302 away from the feed: the fetcher must NOT follow (bearer-token
    // capture vector) — landing here means the redirect was followed
    server.createContext("/elsewhere/", (x: HttpExchange) => {
      redirectedHits.incrementAndGet()
      x.sendResponseHeaders(200, -1); x.close()
    })
    server.createContext("/redirect/", (x: HttpExchange) => {
      x.getResponseHeaders.set("Location",
        s"http://127.0.0.1:${server.getAddress.getPort}/elsewhere/")
      x.sendResponseHeaders(302, -1); x.close()
    })
    server.createContext("/feed/", (x: HttpExchange) => {
      hits.incrementAndGet()
      authHeaders.add(x.getRequestHeaders.getFirst("Authorization"))
      val name = x.getRequestURI.getPath.stripPrefix("/feed/")
      val page = "page-(\\d+)\\.json".r.findFirstMatchIn(name)
        .map(_.group(1).toLong).getOrElse(-1L)
      val limiter = rateLimit.get(page)
      val failer = fail5xx.get(page)
      if (limiter != null && limiter._1.getAndDecrement() > 0) {
        if (limiter._2 != null) x.getResponseHeaders.set("Retry-After", limiter._2)
        x.sendResponseHeaders(429, -1); x.close()
      } else if (failer != null && failer.getAndDecrement() > 0) {
        x.sendResponseHeaders(500, -1); x.close()
      } else Option(pages.get(page)) match {
        case Some(body) =>
          val bytes = body.getBytes(StandardCharsets.UTF_8)
          x.sendResponseHeaders(200, bytes.length)
          x.getResponseBody.write(bytes)
          x.close()
        case None =>
          x.sendResponseHeaders(404, -1); x.close()
      }
    })
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}/feed"
    def stop(): Unit = server.stop(0)

    def put(page: Long, rows: Seq[(Long, Long, String, Double)],
            hasNext: Boolean): Unit = {
      val data = rows.map { case (e, u, t, v) =>
        s"""{"event_id":$e,"user_id":$u,"event_type":"$t","value":$v}"""
      }.mkString("[", ",", "]")
      val next = if (hasNext) s""""${page + 1}"""" else "null"
      pages.put(page, s"""{"data":$data,"meta":{"next_token":$next}}""")
    }
  }

  private def withServer(f: FeedServer => Unit): Unit = {
    val s = new FeedServer
    try f(s) finally s.stop()
  }

  test("HttpPageFetcher: 200 -> bytes, 404 -> None (stop), 500 -> throw (retryable)") {
    withServer { s =>
      s.put(0L, Seq((1L, 1L, "a", 1.0)), hasNext = false)
      val fetcher = new HttpPageFetcher
      fetcher.configure(Map.empty)
      val got = fetcher.fetch(s.base, 0L)
      assert(got.isDefined && new String(got.get, StandardCharsets.UTF_8)
        .contains("\"event_id\":1"))
      assert(fetcher.fetch(s.base, 7L) === None) // 404 → absent, not error
      s.fail5xx.put(0L, new AtomicInteger(1))
      intercept[java.io.IOException](fetcher.fetch(s.base, 0L))
    }
  }

  test("429 + Retry-After paces via the header and never burns the retry budget") {
    withServer { s =>
      s.put(0L, Seq((1L, 1L, "a", 1.0)), hasNext = false)
      s.rateLimit.put(0L, (new AtomicInteger(3), "2")) // three 429s @ 2 s
      val fetcher = new HttpPageFetcher
      fetcher.configure(Map.empty)
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val clock = new PageFeed.Clock {
        override def nowMs(): Long = 0L
        override def sleepMs(ms: Long): Unit = sleeps += ms
      }
      // maxAttempts = 1: ANY budget-consuming retry would throw — the
      // fetch can only succeed if the 429s ride the header path
      val got = PageFeed.fetchWithRetry(fetcher, s.base, 0L,
        maxAttempts = 1, backoffMs = 0L, clock = clock)
      assert(got.isDefined)
      assert(sleeps.toSeq === Seq(2000L, 2000L, 2000L))
    }
  }

  test("429 without Retry-After falls back to the attempt-counted backoff path") {
    withServer { s =>
      s.put(0L, Seq((1L, 1L, "a", 1.0)), hasNext = false)
      s.rateLimit.put(0L, (new AtomicInteger(2), null)) // two bare 429s
      val fetcher = new HttpPageFetcher
      fetcher.configure(Map.empty)
      val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
      val clock = new PageFeed.Clock {
        override def nowMs(): Long = 0L
        override def sleepMs(ms: Long): Unit = sleeps += ms
      }
      intercept[PageFeed.RateLimited](PageFeed.fetchWithRetry(
        fetcher, s.base, 0L, maxAttempts = 2, backoffMs = 100L, clock = clock))
      assert(sleeps.toSeq === Seq(100L)) // one exponential wait, then throw
    }
  }

  test("Retry-After parses delta-seconds and HTTP-date; clamps negatives to 0") {
    val f = new HttpPageFetcher
    assert(f.parseRetryAfterMs("30") === Some(30000L))
    assert(f.parseRetryAfterMs(" 5 ") === Some(5000L))
    assert(f.parseRetryAfterMs("") === None)
    assert(f.parseRetryAfterMs("soon") === None)
    val future = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC).plusSeconds(60)
      .format(java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
    val parsed = f.parseRetryAfterMs(future)
    assert(parsed.exists(ms => ms > 50000L && ms <= 60000L))
    val past = "Wed, 21 Oct 2015 07:28:00 GMT"
    assert(f.parseRetryAfterMs(past) === Some(0L)) // elapsed date → retry now
  }

  test("redirects are not followed: a 302 is a retryable error, the target never sees the token") {
    withServer { s =>
      val fetcher = new HttpPageFetcher
      fetcher.configure(Map("bearerToken" -> "secret-tok"))
      val base = s.base.replace("/feed", "/redirect")
      intercept[java.io.IOException](fetcher.fetch(base, 0L))
      assert(s.redirectedHits.get() === 0) // token never crossed the 302
    }
  }

  test("HttpPageFetcher: bearer token rides as Authorization header; absent when unset") {
    withServer { s =>
      s.put(0L, Seq((1L, 1L, "a", 1.0)), hasNext = false)
      val withTok = new HttpPageFetcher
      withTok.configure(Map("bearerToken" -> "tok-123"))
      withTok.fetch(s.base, 0L)
      assert(s.authHeaders.get(0) === "Bearer tok-123")
      val noTok = new HttpPageFetcher
      noTok.configure(Map.empty)
      noTok.fetch(s.base, 0L)
      assert(s.authHeaders.get(1) == null) // no header sent without a token
    }
  }

  test("HttpPageFetcher: {page} placeholder substitutes; default is file-style naming") {
    val f = new HttpPageFetcher
    assert(f.pageUrl("http://h/feed?page={page}", 7L) === "http://h/feed?page=7")
    assert(f.pageUrl("http://h/feed/", 7L) === "http://h/feed/page-00007.json")
    assert(f.pageUrl("http://h/feed", 12345L) === "http://h/feed/page-12345.json")
  }

  test("batch read over real sockets: cursor walk + per-page partitions, auth on every request") {
    withServer { s =>
      s.put(0L, Seq((1L, 10L, "click", 1.5), (2L, 11L, "view", 2.0)), hasNext = true)
      s.put(1L, Seq((3L, 12L, "click", 3.0)), hasNext = false)
      val df = spark.read.format(fmt)
        .option("path", s.base)
        .option(PageFeed.fetcherOpt, classOf[HttpPageFetcher].getName)
        .option("bearerToken", "sock-tok")
        .load()
      assert(df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(1L, 2L, 3L))
      // every request — the planning walk's AND the partition readers' —
      // carried the bearer header (options reached executor-side fetchers)
      assert(s.hits.get() >= 3)
      s.authHeaders.forEach(h => assert(h === "Bearer sock-tok"))
    }
  }

  test("stop conditions over sockets: missing next_token ends the feed before a live later page") {
    withServer { s =>
      s.put(0L, Seq((1L, 1L, "a", 1.0)), hasNext = false) // next_token null
      s.put(1L, Seq((9L, 9L, "z", 9.0)), hasNext = false) // unreachable
      val df = spark.read.format(fmt)
        .option("path", s.base)
        .option(PageFeed.fetcherOpt, classOf[HttpPageFetcher].getName)
        .load()
      assert(df.select("event_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    }
  }

  test("stop conditions over sockets: empty data page is consumed and ends the feed") {
    withServer { s =>
      s.put(0L, Seq((1L, 1L, "a", 1.0)), hasNext = true)
      s.put(1L, Seq.empty, hasNext = true) // empty data → stop AFTER consuming
      s.put(2L, Seq((9L, 9L, "z", 9.0)), hasNext = false)
      val df = spark.read.format(fmt)
        .option("path", s.base)
        .option(PageFeed.fetcherOpt, classOf[HttpPageFetcher].getName)
        .load()
      assert(df.select("event_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    }
  }

  test("transient 500s over sockets are absorbed by the bounded retry budget") {
    withServer { s =>
      s.put(0L, Seq((1L, 10L, "click", 1.0)), hasNext = true)
      s.put(1L, Seq((2L, 11L, "view", 2.0)), hasNext = false)
      s.fail5xx.put(1L, new AtomicInteger(2)) // page 1: two 500s, then 200
      val df = spark.read.format(fmt)
        .option("path", s.base)
        .option(PageFeed.fetcherOpt, classOf[HttpPageFetcher].getName)
        .option(PageFeed.attemptsOpt, "4")
        .load()
      assert(df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(1L, 2L))
    }
  }

  test("a 500 outliving the retry budget fails the read loudly") {
    withServer { s =>
      s.put(0L, Seq((1L, 10L, "click", 1.0)), hasNext = false)
      s.fail5xx.put(0L, new AtomicInteger(1000))
      val df = spark.read.format(fmt)
        .option("path", s.base)
        .option(PageFeed.fetcherOpt, classOf[HttpPageFetcher].getName)
        .option(PageFeed.attemptsOpt, "2")
        .load()
      val e = intercept[Exception](df.count())
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(e).map(String.valueOf(_)).exists(_.contains("HTTP 500")))
    }
  }

  test("checkpointed stream over real sockets: restart resumes the cursor, no reprocessing") {
    withServer { s =>
      val ckpt = java.nio.file.Files.createTempDirectory("graft-http-ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("graft-http-out").toString
      s.put(0L, Seq((1L, 10L, "click", 1.0)), hasNext = true)

      def startQuery() = spark.readStream.format(fmt)
        .option("path", s.base)
        .option(PageFeed.fetcherOpt, classOf[HttpPageFetcher].getName)
        .option("bearerToken", "stream-tok")
        .load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ckpt).start()

      def written() = spark.read.parquet(out).select("event_id").collect()
        .map(_.getLong(0)).toSeq.sorted

      val q1 = startQuery()
      q1.processAllAvailable()
      assert(written() === Seq(1L))
      q1.stop()

      s.put(1L, Seq((2L, 11L, "view", 2.0)), hasNext = false)
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()
      assert(written() === Seq(1L, 2L)) // exactly once each, across restart
      s.authHeaders.forEach(h => assert(h === "Bearer stream-tok"))
    }
  }
}
