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
  *   - anything else (429 rate limit, 5xx) → throw, absorbed by
  *     [[PageFeed.fetchWithRetry]]'s bounded exponential backoff
  *
  * Options (configured via the DSv2 reader options — credentials travel
  * as options, never class names or environment):
  *   - `bearerToken`  — sent as `Authorization: Bearer <token>` when set
  *   - `httpTimeoutMs` — per-request + connect timeout (default 10000)
  *
  * Thread-safety: one fetcher per planning walk / partition reader (see
  * [[PageFeed.makeFetcher]]); the underlying [[HttpClient]] is itself
  * thread-safe. @transient lazy so the client never rides task
  * serialization — each executor builds its own.
  */
class HttpPageFetcher extends PageFetcher {

  private var bearerToken: Option[String] = None
  private var timeoutMs: Long = 10000L

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def configure(options: Map[String, String]): Unit = {
    bearerToken = options.get("bearerToken").filter(_.nonEmpty)
    timeoutMs = options.get("httpTimeoutMs").map(_.toLong).getOrElse(10000L)
  }

  def pageUrl(path: String, page: Long): String =
    if (path.contains("{page}")) path.replace("{page}", page.toString)
    else f"${path.stripSuffix("/")}%s/page-$page%05d.json"

  override def fetch(path: String, page: Long): Option[Array[Byte]] = {
    val b = HttpRequest.newBuilder(URI.create(pageUrl(path, page)))
      .GET()
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Accept", "application/json")
    bearerToken.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 | 410 | 204 => None // page absent — cursor-walk stop
      case sc => throw new java.io.IOException(
        s"HTTP $sc fetching page $page") // transient: bounded retry upstream
    }
  }
}
