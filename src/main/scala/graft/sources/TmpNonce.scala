package graft.sources

/** Per-JVM nonce for scratch directories. Stable within one harness run
  * (repeated bench/verify invocations of a query reuse one dir instead of
  * leaking a new one per call), unique across concurrent JVMs (two Verify
  * runs on the same SF dir cannot race each other's files).
  *
  * Every nonce'd dir is registered for recursive deletion at JVM exit —
  * without the hook each bench/verify JVM would leak a corpus-sized set
  * of scratch dirs into the tmp filesystem, unbounded across rounds. */
object TmpNonce {
  lazy val value: String =
    java.lang.Long.toHexString(
      java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime) +
      "-" + java.lang.management.ManagementFactory.getRuntimeMXBean.getPid

  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach { p =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
        catch { case _: Exception => () } // exit-time best effort
      }))

  /** A nonce'd scratch dir under java.io.tmpdir, deleted at JVM exit. */
  def scratchDir(prefix: String, discriminator: String): java.io.File = {
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"$prefix-$value-${discriminator.replaceAll("[^a-zA-Z0-9]", "_")}")
    hookInstalled
    registered.add(f.getAbsolutePath)
    f
  }
}
