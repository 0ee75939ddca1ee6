package graft.sources.pagefeed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP transport for the page feed — the last reference capability with
  * no runtime implementation (r15 verdict #5): the reference's fetch IS
  * the network, a bearer-token GET with bounded retry
  * (`tweet_download.py:25–30` `connect_to_endpoint`: requests.get with
  * `Authorization: Bearer <token>`, raise on non-200) and the cursor walk
  * around it. This class is ONLY the transport; retry/backoff, politeness
  * pacing, cursor-walk stop conditions, and checkpointing all stay in
  * [[PageFeed]] — the same policies already spec'd against [[FileFetcher]]
  * now run over real sockets.
  *
  * URL layout: `path` is the feed's base URL. A literal `{page}`
  * placeholder anywhere in it is substituted with the page number
  * (`https://host/feed?page={page}`); without a placeholder the page is
  * addressed file-style as `<base>/page-<%05d>.json` — the same naming
  * [[FileFetcher]] uses, so a static export of a feed and its live origin
  * are interchangeable.
  *
  * Status mapping follows the reference's loop semantics:
  *   - 200 → page bytes
  *   - 404 / 410 / 204 → None (page absent — the terminal stop condition)
  *   - 429 → throw [[PageFeed.RateLimited]] carrying the parsed
  *     `Retry-After` header; [[PageFeed.fetchWithRetry]] honors the
  *     header-given wait WITHOUT consuming the retry budget — the
  *     reference's real-world counterpart (`tweet_download.py:25–30` +
  *     the 3 s sleep at `:100`) is exactly the API where honoring
  *     `Retry-After` decides whether a full-archive crawl completes
  *   - anything else (3xx, 5xx) → throw, absorbed by
  *     [[PageFeed.fetchWithRetry]]'s bounded exponential backoff.
  *     Redirects are NOT followed (`Redirect.NEVER`): the JDK HttpClient
  *     re-sends user headers on redirect, so a malicious or compromised
  *     feed origin could 302 the request cross-host and capture the
  *     `Authorization: Bearer` token (requests, the reference's client,
  *     strips auth on cross-host redirects for the same reason). A feed
  *     that moves gets its URL updated in the reader options.
  *
  * Options (configured via the DSv2 reader options — credentials travel
  * as options, never class names or environment):
  *   - `bearerToken`  — sent as `Authorization: Bearer <token>` when set
  *   - `httpTimeoutMs` — per-request + connect timeout (default 10000)
  *
  * Thread-safety: one fetcher per planning walk / partition reader (see
  * [[PageFeed.makeFetcher]]); the underlying [[HttpClient]] is itself
  * thread-safe. @transient so the client never rides task serialization —
  * each executor builds its own. The client is (re)built inside
  * `configure()` so a reconfigured `httpTimeoutMs` always takes effect
  * (a lazy-val client captured the FIRST fetch's timeout forever).
  */
class HttpPageFetcher extends PageFetcher {

  private var bearerToken: Option[String] = None
  private var timeoutMs: Long = 10000L

  @transient private var client: HttpClient = _

  private def buildClient(): HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .followRedirects(HttpClient.Redirect.NEVER)
    .build()

  override def configure(options: Map[String, String]): Unit = {
    bearerToken = options.get("bearerToken").filter(_.nonEmpty)
    timeoutMs = options.get("httpTimeoutMs").map(_.toLong).getOrElse(10000L)
    client = buildClient()
  }

  // makeFetcher always configures before the first fetch; the null check
  // only covers a hand-constructed fetcher that skipped configure()
  private def httpClient: HttpClient = {
    if (client == null) client = buildClient()
    client
  }

  def pageUrl(path: String, page: Long): String =
    if (path.contains("{page}")) path.replace("{page}", page.toString)
    else f"${path.stripSuffix("/")}%s/page-$page%05d.json"

  /** `Retry-After` per RFC 9110 §10.2.3: either delta-seconds or an
    * HTTP-date; absent/unparsable → None (normal backoff path). */
  private[sources] def parseRetryAfterMs(v: String): Option[Long] =
    Option(v).map(_.trim).filter(_.nonEmpty).flatMap { s =>
      s.toLongOption.map(_ * 1000L).orElse(
        scala.util.Try {
          val at = java.time.ZonedDateTime
            .parse(s, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
          math.max(0L, java.time.Duration
            .between(java.time.ZonedDateTime.now(at.getZone), at).toMillis)
        }.toOption)
    }.map(ms => math.max(0L, ms))

  override def fetch(path: String, page: Long): Option[Array[Byte]] = {
    val b = HttpRequest.newBuilder(URI.create(pageUrl(path, page)))
      .GET()
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Accept", "application/json")
    bearerToken.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = httpClient.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 | 410 | 204 => None // page absent — cursor-walk stop
      case 429 =>
        throw PageFeed.RateLimited(page,
          Option(resp.headers().firstValue("Retry-After").orElse(null))
            .flatMap(parseRetryAfterMs))
      case sc => throw new java.io.IOException(
        s"HTTP $sc fetching page $page") // transient: bounded retry upstream
    }
  }
}
