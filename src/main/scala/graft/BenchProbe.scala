package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.GraftBusBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerTaskEnd}

/** Cumulative per-process gauges behind the bench health file's per-rep
  * attribution fields. Round 7's protocol had a PROVEN false negative:
  * q114 read 5× its quiet time in-suite with `gc_ms` and `pressure` both
  * clean, so the excess lived somewhere those two fields cannot see. The
  * probe decomposes a rep's wall time into the remaining suspects:
  *
  *   - `task_ms`  — sum of executor task run time. Wall ≈ task_ms/cores
  *     when the cluster does the work; wall ≫ task_ms/cores means the
  *     time went to the DRIVER (planning, codegen, scheduling) or to
  *     stalls the tasks never saw.
  *   - `compile_ms` — Janino codegen compile time (driver-side,
  *     serialized). The codegen cache holds 100 entries; after a hundred
  *     suite queries it thrashes, and a barrier-heavy plan recompiles
  *     every generated class a quiet run gets from cache.
  *   - `fetch_ms` / `swrite_ms` — shuffle fetch-wait and write time:
  *     local-disk contention from accumulated shuffle files shows here.
  *   - `spill_mb` — execution-memory spill (memory+disk bytes spilled);
  *     storage-side spill is the separate `pressure` flag.
  *   - `evict` — RDD cache blocks fully REMOVED during the measured
  *     window (LRU eviction, or an operator's documented inline drop —
  *     constant per query, so a suite-vs-quiet DIFF still attributes).
  *   - `bcast_rm` — broadcast blocks removed during the window: the
  *     ContextCleaner-activity signal (a GC-triggered cleanup storm
  *     inside a rep stalls the scheduler on the cleanup lock).
  *   - `recompute` — cache-barrier blocks RE-materialized during the
  *     window: a block stored again after having been removed. This is
  *     exactly the evict-then-silently-recompute path that round 8's
  *     q126 burned 18 s of real `cpu_ms` on while gc/spill/steal/
  *     compile all read clean — the in-process CPU-inflation mechanism
  *     none of the other gauges can attribute. Detected as a per-block
  *     state machine over block-status updates (stored → removed →
  *     stored again = one recompute); a memory→disk demotion keeps the
  *     block valid and does NOT count.
  *   - `jit_ms` — HotSpot JIT total compilation time (CompilationMXBean)
  *     spent during the window. Late-suite deopt/recompile storms are
  *     the OTHER way a rep burns real CPU that Janino `compile_ms`
  *     (driver codegen only) cannot see.
  *
  * All gauges are cumulative atomics sampled before/after each rep, with
  * the listener bus DRAINED at both edges ([[GraftBusBridge]]) so the
  * window is exact. Task-end events cost one map lookup each — noise-
  * level next to the tasks themselves. */
final class BenchProbe extends SparkListener {
  private val taskMs = new AtomicLong
  private val cpuMs = new AtomicLong
  private val gcTaskMs = new AtomicLong
  private val fetchMs = new AtomicLong
  private val swriteMs = new AtomicLong
  private val spillBytes = new AtomicLong
  private val evicted = new AtomicLong
  private val bcastRm = new AtomicLong
  private val recomputes = new AtomicLong
  // blockId name -> currently stored? Entries accumulate for the process
  // lifetime (one per distinct cached block ever seen; a full 171-query
  // suite creates a few tens of thousands — bounded, since released
  // barriers get fresh RDD ids and their old entries go quiet).
  private val blockStored =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      taskMs.addAndGet(m.executorRunTime)
      cpuMs.addAndGet(m.executorCpuTime / 1000000L)
      gcTaskMs.addAndGet(m.jvmGCTime)
      fetchMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
      swriteMs.addAndGet(m.shuffleWriteMetrics.writeTime / 1000000L)
      spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit = {
    val i = e.blockUpdatedInfo
    // an invalid storage level on an update = the block was removed
    if (!i.storageLevel.isValid) {
      if (i.blockId.isRDD) {
        evicted.incrementAndGet()
        blockStored.put(i.blockId.name, java.lang.Boolean.FALSE)
      } else if (i.blockId.isBroadcast) bcastRm.incrementAndGet()
    } else if (i.blockId.isRDD) {
      // valid update: first store (absent), demotion/update of a live
      // block (TRUE — not a recompute), or a re-store after removal
      // (FALSE — the task just re-ran the barrier's subtree)
      val prev = blockStored.put(i.blockId.name, java.lang.Boolean.TRUE)
      if (prev != null && !prev.booleanValue()) recomputes.incrementAndGet()
    }
  }

  /** Cumulative HotSpot JIT compilation milliseconds (all compiler
    * threads). Monotone when supported; 0 on JVMs without the gauge. */
  private def jitMillis(): Long = {
    val b = java.lang.management.ManagementFactory.getCompilationMXBean
    if (b != null && b.isCompilationTimeMonitoringSupported)
      b.getTotalCompilationTime
    else 0L
  }

  /** Drain the bus, then read every gauge. `SPARK_GRAFT_NO_DRAIN=1`
    * skips the drain — the A/B knob that isolated round 7's q114
    * in-suite inflation: with rep edges NOT synced to the async listener
    * bus, accumulated status/cleanup event backlog from earlier queries
    * bleeds processing into later measured windows. */
  def snap(sc: SparkContext): BenchProbe.Snap = {
    if (!sys.env.get("SPARK_GRAFT_NO_DRAIN").contains("1"))
      GraftBusBridge.flushListenerBus(sc)
    BenchProbe.Snap(taskMs.get, cpuMs.get, gcTaskMs.get, fetchMs.get,
      swriteMs.get, spillBytes.get, evicted.get, bcastRm.get,
      GraftBusBridge.codegenCompileMs(), recomputes.get, jitMillis())
  }
}

object BenchProbe {
  /** One cumulative reading; subtract two to get a window. `taskMs` is
    * task WALL time and `cpuMs` task CPU time: a run≫cpu gap inside the
    * tasks is involuntary wait — CPU steal from outside the JVM or
    * scheduler overload — the external-pressure case no JVM-internal
    * counter (gc, spill, compile) can explain, and the adjudicated cause
    * of round 7's q114 suite-row inflation (unreproducible afterwards on
    * a quiet machine under any harness protocol). */
  final case class Snap(taskMs: Long, cpuMs: Long, gcTaskMs: Long,
                        fetchMs: Long, swriteMs: Long, spillBytes: Long,
                        evicted: Long, bcastRm: Long, compileMs: Long,
                        recompute: Long = 0L, jitMs: Long = 0L) {
    def -(prev: Snap): Snap = Snap(
      taskMs - prev.taskMs, cpuMs - prev.cpuMs, gcTaskMs - prev.gcTaskMs,
      fetchMs - prev.fetchMs, swriteMs - prev.swriteMs,
      spillBytes - prev.spillBytes, evicted - prev.evicted,
      bcastRm - prev.bcastRm, compileMs - prev.compileMs,
      recompute - prev.recompute, jitMs - prev.jitMs)
  }
}
