package org.apache.spark

import org.apache.spark.scheduler.SparkListenerBlockUpdated
import org.apache.spark.storage.{BlockManagerId, BlockUpdatedInfo, RDDBlockId, StorageLevel}

/** Test-only factory for synthetic block-status events: `BlockManagerId`
  * and `BlockUpdatedInfo` are `private[spark]` in their Scala signatures,
  * so driving `BenchProbe`'s recompute state machine from a spec needs
  * this bridge (same pattern as [[GraftBusBridge]]). */
object GraftTestEvents {
  private val bm = BlockManagerId("driver", "localhost", 7777)

  /** A block-status update for RDD block (rddId, split) at `level`;
    * level names match `StorageLevel` constants. */
  def rddBlockUpdate(rddId: Int, split: Int, level: String): SparkListenerBlockUpdated = {
    val lvl = level match {
      case "NONE"            => StorageLevel.NONE
      case "DISK_ONLY"       => StorageLevel.DISK_ONLY
      case "MEMORY_ONLY"     => StorageLevel.MEMORY_ONLY
      case "MEMORY_AND_DISK" => StorageLevel.MEMORY_AND_DISK
      case other             => sys.error(s"unmapped test level: $other")
    }
    SparkListenerBlockUpdated(BlockUpdatedInfo(bm, RDDBlockId(rddId, split), lvl, 1L, 0L))
  }
}
