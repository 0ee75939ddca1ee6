package graft.sources

/** Per-JVM nonce for scratch directories. Stable within one harness run
  * (repeated bench/verify invocations of a query reuse one dir instead of
  * leaking a new one per call), unique across concurrent JVMs (two Verify
  * runs on the same SF dir cannot race each other's files). */
object TmpNonce {
  lazy val value: String =
    java.lang.Long.toHexString(
      java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime) +
      "-" + java.lang.management.ManagementFactory.getRuntimeMXBean.getPid
}
