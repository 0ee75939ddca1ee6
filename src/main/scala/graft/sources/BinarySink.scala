package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** K4/K5: binary file-per-row sink with retry/backoff and an error side
  * output (`download_image`, `reddit_image_scraper.py:29–52,63–69`).
  *
  * The reference downloads each image with 3 retries, exponential backoff
  * 2^attempt seconds, and collects failures into a side list. Spark-first,
  * the sink is `mapPartitions`: each task writes its partition's payloads
  * and emits one result row per payload (path, ok, attempts, error) — the
  * error side output (K5, the reference's pickle of failures) is then just
  * `results.filter(!ok)`, a DataFrame instead of a driver-side list, so it
  * scales past driver memory and survives task retries idempotently
  * (writes are deterministic paths, overwrite-on-retry).
  *
  * The IO action is injectable so the retry policy is unit-testable with
  * deterministic fault injection (and so "download" vs "write local file"
  * vs "put object store" are the same operator).
  */
object BinarySink {

  /** Retry + politeness policy (`MAX_RETRIES=3`, exp backoff 2^n s,
    * `reddit_image_scraper.py:17,33–52`; jittered inter-request sleep
    * `SLEEP_RANGE=(1,6)` per image `reddit_image_scraper.py:18,41` and
    * 3 s/page `tweet_download.py:100`). `sleeper` is injectable so tests
    * assert the sleep schedule without sleeping. Politeness is OFF by
    * default — local/object-store sinks don't need it; a scraping io
    * enables it to stay under the origin's rate limit. */
  final case class RetryPolicy(
      maxAttempts: Int = 3,
      baseBackoffMs: Long = 1000L,
      politenessMinMs: Long = 0L,
      politenessMaxMs: Long = 0L,
      sleeper: Long => Unit = Thread.sleep) extends Serializable {
    /** Backoff before attempt k (0-based retry index): base * 2^k. */
    def backoffMs(k: Int): Long = baseBackoffMs * (1L << k)

    def politenessEnabled: Boolean = politenessMaxMs > 0L

    /** Jittered inter-request delay in [min, max] — the reference's
      * `random.randint(*SLEEP_RANGE)`. Deterministic given the rng, which
      * writeWithRetry seeds per partition. */
    def politenessMs(rng: java.util.Random): Long =
      if (!politenessEnabled) 0L
      else if (politenessMaxMs <= politenessMinMs) politenessMinMs
      else politenessMinMs +
        rng.longs(1, 0, politenessMaxMs - politenessMinMs + 1).findFirst().getAsLong
  }

  /** The reference's scraping cadence: sleep 1–6 s between requests. */
  val referencePoliteness: (Long, Long) = (1000L, 6000L)

  final case class WriteResult(
      name: String, n_bytes: Long, ok: Boolean, attempts: Int, error: String)

  /** Run `io` for each (name, payload) with the retry policy; one result
    * row per input. Pure function of the inputs + io behavior. */
  def writeWithRetry(
      items: Dataset[(String, Array[Byte])],
      io: (String, Array[Byte]) => Unit,
      policy: RetryPolicy): Dataset[WriteResult] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition rng: each task jitters independently (a fleet of
      // tasks must not sleep in lockstep against one origin), but the
      // schedule is deterministic per partition for testability
      val rng = new java.util.Random(
        org.apache.spark.TaskContext.getPartitionId().toLong)
      it.map { case (name, payload) =>
        if (policy.politenessEnabled) policy.sleeper(policy.politenessMs(rng))
        var attempt = 0
        var done = false
        var err: String = null
        while (!done && attempt < policy.maxAttempts) {
          try { io(name, payload); done = true; err = null }
          catch {
            case e: Exception =>
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}"
              if (attempt < policy.maxAttempts - 1)
                policy.sleeper(policy.backoffMs(attempt))
          }
          attempt += 1
        }
        WriteResult(name, payload.length.toLong, done, attempt,
          if (done) "" else err)
      }
    }
  }

  /** Local-filesystem io action (the test/bench default). */
  def localFileIo(outDir: String): (String, Array[Byte]) => Unit = {
    (name, payload) =>
      val f = new java.io.File(outDir, name)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, payload)
  }

  /** The reference's image-extension allowlist
    * (`reddit_image_scraper.py:11`). */
  val validImageExtensions: Seq[String] = Seq("jpg", "jpeg", "png", "gif")

  private def endsWithImageExt(url: org.apache.spark.sql.Column) = {
    val lu = lower(url)
    // reference-exact: `url.lower().endswith(tuple(VALID_EXTENSIONS))` —
    // bare-suffix match, NO dot required ("photojpg" counts), kept
    // verbatim so behavior matches the system being replaced
    validImageExtensions.map(e => lu.endsWith(lit(e))).reduce(_ || _)
  }

  /** The reference's fetch-URL rewrite for extension-less image URLs
    * (`reddit_image_scraper.py:30`): a URL not ending in a known image
    * extension gets `.jpg` appended before fetching — the imgur-style
    * page URL vs direct-image URL convention. Pure codegen'd column
    * expression, no UDF. */
  def imageFetchUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(endsWithImageExt(url), url).otherwise(concat(url, lit(".jpg")))

  /** The reference's URL admission predicate
    * (`reddit_image_scraper.py:27–28`): known image extension, or any
    * imgur.com URL (those are the extension-less ones the rewrite above
    * repairs). The imgur check is on the RAW url, as in the reference. */
  def isImageUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    endsWithImageExt(url) || url.contains("imgur.com")

  /** Declared query: write every document's payload as a file, report the
    * per-file result rows (all ok, 1 attempt — deterministic, so the
    * oracle can reproduce them from `documents` alone). Each row also
    * carries a synthetic imgur-style source `url` (even ids direct-image
    * `.png`, odd ids extension-less page URLs) and the [[imageFetchUrl]]
    * rewrite's `fetch_url`, so the reference's `.jpg` repair
    * (`reddit_image_scraper.py:30`) is oracle-checked on both branches. */
  def binarySinkReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = TmpNonce.scratchDir("graft-binsink", dir).toString
    val items = Tables.documents(spark, dir)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) =>
        (s"doc_$id.bin", Option(text).getOrElse("").getBytes("UTF-8")) }
    val docId = regexp_extract($"name", "doc_(\\d+)\\.bin", 1).cast("long")
    writeWithRetry(items, localFileIo(out), RetryPolicy())
      .toDF()
      .withColumn("url", concat(lit("https://i.imgur.com/d"),
        docId.cast("string"),
        when(docId % 2 === 0, lit(".png")).otherwise(lit(""))))
      .select($"name", $"url", imageFetchUrl($"url").as("fetch_url"),
        $"n_bytes", $"ok", $"attempts".cast("long").as("attempts"))
      .orderBy($"name")
  }
}
