package graft.sources

import graft.SparkSpec

/** Fault-injecting io actions must live at file scope (serialized into
  * tasks); failure state is per-JVM static, which is fine in local mode. */
object FlakyIo {
  val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  /** Fails the first `failTimes` attempts per name. */
  def failing(failTimes: Int): (String, Array[Byte]) => Unit = {
    (name, _) =>
      val n = calls.merge(name, 1, (a, b) => a + b)
      if (n <= failTimes) throw new java.io.IOException(s"injected #$n")
  }
}

/** Records every sleep request instead of sleeping (per-JVM static, fine in
  * local mode). */
object SleepRecorder {
  val sleeps = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  val record: Long => Unit = ms => { sleeps.add(ms); () }
}

class BinarySinkSpec extends SparkSpec {
  import BinarySink._

  private val noSleep = RetryPolicy(maxAttempts = 3, sleeper = _ => ())

  test("retry policy: exponential backoff 2^n (reference's 2**attempt)") {
    val p = RetryPolicy(baseBackoffMs = 1000)
    assert(p.backoffMs(0) === 1000L)
    assert(p.backoffMs(1) === 2000L)
    assert(p.backoffMs(2) === 4000L)
  }

  test("transient failures are retried to success; attempts recorded") {
    import spark.implicits._
    FlakyIo.calls.clear()
    val items = spark.createDataset(Seq(("a.bin", "aa".getBytes("UTF-8"))))
    val res = writeWithRetry(items, FlakyIo.failing(2), noSleep).collect()
    assert(res.length === 1)
    assert(res(0).ok && res(0).attempts === 3)
  }

  test("permanent failure lands in the error side output with the cause") {
    import spark.implicits._
    FlakyIo.calls.clear()
    val items = spark.createDataset(Seq(
      ("good.bin", "g".getBytes("UTF-8")),
      ("bad.bin", "b".getBytes("UTF-8"))))
    val res = writeWithRetry(
      items.filter(_._1 == "bad.bin"), FlakyIo.failing(99), noSleep).collect()
    assert(res.length === 1)
    assert(!res(0).ok && res(0).attempts === 3)
    assert(res(0).error.contains("injected"))
  }

  test("politeness throttle: one jittered inter-request sleep per item in [min,max], asserted without sleeping") {
    import spark.implicits._
    FlakyIo.calls.clear()
    SleepRecorder.sleeps.clear()
    val polite = RetryPolicy(maxAttempts = 1,
      politenessMinMs = 1000L, politenessMaxMs = 6000L,
      sleeper = SleepRecorder.record)
    val items = spark.createDataset(
      (0 until 20).map(i => (s"p$i.bin", Array[Byte](1)))).repartition(2)
    val res = writeWithRetry(items, FlakyIo.failing(0), polite).collect()
    assert(res.forall(_.ok))
    val slept = {
      import scala.jdk.CollectionConverters._
      SleepRecorder.sleeps.asScala.map(_.longValue).toSeq
    }
    assert(slept.length === 20)               // exactly one throttle per request
    assert(slept.forall(ms => ms >= 1000L && ms <= 6000L)) // reference SLEEP_RANGE=(1,6)
    assert(slept.distinct.length > 1)         // jittered, not a fixed cadence
  }

  test("politeness off by default: successful writes schedule no sleeps") {
    import spark.implicits._
    FlakyIo.calls.clear()
    SleepRecorder.sleeps.clear()
    val policy = RetryPolicy(sleeper = SleepRecorder.record)
    val items = spark.createDataset(Seq(("q.bin", Array[Byte](1))))
    val res = writeWithRetry(items, FlakyIo.failing(0), policy).collect()
    assert(res.forall(_.ok) && SleepRecorder.sleeps.isEmpty)
  }

  test("localFileIo writes real files; report matches payload sizes") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-binsink").toString
    val items = spark.createDataset(Seq(
      ("x/1.bin", Array[Byte](1, 2, 3)), ("y/2.bin", Array[Byte](9))))
    val res = writeWithRetry(items, localFileIo(out), noSleep).collect()
    assert(res.forall(r => r.ok && r.attempts === 1))
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "x/1.bin")).toSeq === Seq[Byte](1, 2, 3))
    assert(new java.io.File(out, "y/2.bin").length() === 1L)
  }

  test(".jpg rewrite: extension-less URLs repaired, known extensions kept (reference-exact, no dot required)") {
    import spark.implicits._
    val urls = Seq(
      "https://i.imgur.com/abc123",        // page URL → repaired
      "https://i.imgur.com/abc.PNG",       // case-insensitive keep
      "https://host/x.jpeg",               // keep
      "https://host/photojpg",             // bare suffix counts (reference parity)
      "https://host/clip.gif",             // keep
      "https://host/page.html")            // repaired
    val got = urls.toDF("url")
      .select(BinarySink.imageFetchUrl($"url")).as[String].collect().toSeq
    assert(got === Seq(
      "https://i.imgur.com/abc123.jpg",
      "https://i.imgur.com/abc.PNG",
      "https://host/x.jpeg",
      "https://host/photojpg",
      "https://host/clip.gif",
      "https://host/page.html.jpg"))
  }

  test("isImageUrl: extension allowlist or imgur.com containment, imgur check on the raw url") {
    import spark.implicits._
    val rows = Seq(
      ("https://i.imgur.com/abc123", true),   // imgur, no extension
      ("https://host/x.png", true),
      ("https://host/page.html", false),
      ("https://IMGUR.com/z", false))          // raw containment: case matters
    val got = rows.toDF("url", "want")
      .select(BinarySink.isImageUrl($"url"), $"want")
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (is, want) => assert(is === want) }
  }
}
