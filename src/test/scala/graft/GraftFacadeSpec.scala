package graft

import org.scalatest.funsuite.AnyFunSuite

/** The facade is a pure grouping layer: aliases must point at the real
  * operator objects (no copies, no drift) and the query index must be
  * the declared surface itself. */
class GraftFacadeSpec extends AnyFunSuite {
  test("facade aliases are identity references to the operator objects") {
    assert(Graft.dedup eq operators.DedupOps)
    assert(Graft.ann eq operators.AnnSearch)
    assert(Graft.graph eq operators.Components)
    assert(Graft.curation.pipeline eq streaming.CuratePipeline)
    assert(Graft.fn.native eq functions.native)
    assert(Graft.ingest.zstNdjson eq sources.ZstNdjson)
  }
  test("query index is exactly the declared surface") {
    assert(Graft.queryNames === SparkEntry.queries.keys.toSeq.sorted)
    assert(Graft.query("q18_exact_dedup") eq SparkEntry.queries("q18_exact_dedup"))
    intercept[NoSuchElementException](Graft.query("q999_nope"))
  }
}
