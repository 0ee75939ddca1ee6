package org.apache.spark

/** Bridge to two `private[spark]` seams the bench health probe needs
  * (same pattern as [[org.apache.spark.sql.GraftColumnBridge]] — lives in
  * the `org.apache.spark` package solely to re-export, no logic):
  *
  *   - `SparkContext.listenerBus.waitUntilEmpty()` — the listener bus is
  *     ASYNC, so per-rep counter windows must drain it before reading a
  *     snapshot, or a rep's tail events bleed into the next rep's window;
  *   - `CodeGenerator.compileTime` — cumulative Janino compile nanos, the
  *     driver-side cost the task-metrics decomposition can't see (the
  *     codegen cache holds `spark.sql.codegen.cache.maxEntries`=100
  *     entries, so a long suite recompiles what a quiet run reuses).
  */
object GraftBusBridge {
  /** Block until every queued listener event is delivered. */
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Cumulative whole-stage/expression codegen compile time, millis. */
  def codegenCompileMs(): Long =
    org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .compileTime / 1000000L
}
