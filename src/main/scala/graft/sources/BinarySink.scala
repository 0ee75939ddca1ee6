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

  /** Declared query: write every document's payload as a file, report the
    * per-file result rows (all ok, 1 attempt — deterministic, so the
    * oracle can reproduce them from `documents` alone). */
  def binarySinkReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = TmpNonce.scratchDir("graft-binsink", dir).toString
    val items = Tables.documents(spark, dir)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) =>
        (s"doc_$id.bin", Option(text).getOrElse("").getBytes("UTF-8")) }
    writeWithRetry(items, localFileIo(out), RetryPolicy())
      .toDF()
      .select($"name", $"n_bytes", $"ok", $"attempts".cast("long").as("attempts"))
      .orderBy($"name")
  }
}
