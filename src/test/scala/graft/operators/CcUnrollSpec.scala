package graft.operators

import graft.SparkSpec

/** Pins the fixed-K bound behind the round-11 oracle change (verdict ask
  * #3): every former `WITH RECURSIVE reach` connected-components oracle
  * is now `SparkEntry.lpRounds` unrolled min-label rounds WITH pointer
  * jumping — lbl'(v) = min(lbl(v), min_{u∈N(v)} lbl(u), lbl(lbl(v))).
  * The unrolled form equals the recursive fixpoint iff the graph
  * converges within K rounds, so this spec replays the exact recurrence
  * on the REAL oracle graphs at the gate SFs and asserts
  * rounds-to-fixpoint ≤ lpRounds − 1 (margin 1). A diameter regression
  * in a future corpus/fixture fails here before it can silently truncate
  * a cluster in the oracle; the sf1 differential is the end-to-end
  * proof on probe data. */
class CcUnrollSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  /** Rounds until the min-label-with-jumping recurrence stops changing.
    * Mirrors `SparkEntry.minLabelCtes` exactly (same seed: every node
    * its own label; undirected edges given one way). */
  def roundsToFixpoint(nodes: Seq[Long], edges: Seq[(Long, Long)]): Int = {
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    var lbl = nodes.map(n => n -> n).toMap
    var rounds = 0
    var changed = true
    while (changed) {
      val next = lbl.map { case (v, l) =>
        val nb = adj.getOrElse(v, Nil).map(lbl)
        v -> (nb :+ l :+ lbl(l)).min
      }
      changed = next != lbl
      if (changed) rounds += 1
      lbl = next
    }
    rounds
  }

  test("the recurrence itself: a diameter-4 chain converges in 3 rounds, a clique in 1") {
    assert(roundsToFixpoint(0L to 4L, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))) === 3)
    val clique = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(roundsToFixpoint(0L to 5L, clique) === 1)
    // and a LONG chain genuinely needs more rounds than the bound — the
    // guard is falsifiable (diameter 40 exceeds what K−1 rounds reach)
    val long = (0L until 40L).map(i => (i, i + 1))
    assert(roundsToFixpoint(0L to 40L, long) > graft.SparkEntry.lpRounds - 1)
  }

  private def keeperGraph(dir: String): (Seq[Long], Seq[(Long, Long)]) = {
    val prs = DedupOps.minHashLshPairsOracled(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    (prs.flatMap(p => Seq(p._1, p._2)).distinct, prs)
  }

  test("q67-chain keeper graph (est_jaccard >= 0.5) converges within lpRounds - 1 at sf0.001 and sf0.01") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val (nodes, edges) = keeperGraph(dir)
      assert(nodes.nonEmpty && edges.nonEmpty, s"empty pair graph at $dir")
      val r = roundsToFixpoint(nodes, edges)
      assert(r <= graft.SparkEntry.lpRounds - 1,
        s"$dir: keeper graph needs $r rounds — raise lpRounds")
    }
  }

  test("q240's tau=0.2 base-id graph converges within lpRounds - 1") {
    import spark.implicits._
    val prs = DedupOps.minHashLshPairsOracled(spark, sf, threshold = 0.2)
      .select(least($"a" % 100000L, $"b" % 100000L).as("a"),
        greatest($"a" % 100000L, $"b" % 100000L).as("b"))
      .filter($"a" =!= $"b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = prs.flatMap(p => Seq(p._1, p._2)).distinct
    val r = roundsToFixpoint(nodes, prs)
    assert(prs.nonEmpty && r <= graft.SparkEntry.lpRounds - 1,
      s"q240 graph needs $r rounds over ${prs.size} edges")
  }

  test("q48's chain fixture (runs of 5) converges within lpRounds - 1") {
    val n = graft.Tables.documents(spark, sf).count()
    val ids = 0L until n
    val edges = ids.filter(i => i % 5 != 4 && i + 1 < n).map(i => (i, i + 1))
    val r = roundsToFixpoint(ids, edges)
    assert(r <= graft.SparkEntry.lpRounds - 1, s"q48 chain needs $r rounds")
  }

  test("q279's base (est >= tauBase) subgraph converges within lpRounds - 1 at the gate SFs") {
    // removing edges can only split components or LENGTHEN paths inside
    // what remains, so the full-graph bound does not transfer — the base
    // chain needs its own pin
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val prs = DedupOps.minHashLshPairsOracled(spark, dir)
        .filter(org.apache.spark.sql.functions.col("est_jaccard") >=
          Components.incCcTauBase)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(prs.nonEmpty, s"empty base graph at $dir")
      val nodes = prs.flatMap(p => Seq(p._1, p._2)).distinct
      val r = roundsToFixpoint(nodes, prs)
      assert(r <= graft.SparkEntry.lpRounds - 1,
        s"$dir: base graph needs $r rounds — raise lpRounds")
    }
  }
}
