package graft.props

import org.scalacheck.{Gen, Prop, Properties}

/** The gap-and-islands law behind q140/q153's run chaining, checked over
  * random duplicated-span index sets far beyond the fixed corpus: for any
  * strictly-increasing index sequence, grouping by `idx − rank(idx)`
  * yields exactly the MAXIMAL consecutive runs — each group is a gapless
  * interval, no two groups are adjacent (maximality), and the groups
  * partition the input. This is the pure-arithmetic core the operator's
  * `idx − (row_number() − 1)` window computes per document. */
object DupRunProps extends Properties("dup-run-chaining") {

  private val idxSet: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)

  /** The operators' formula: group key = idx − 0-based rank in sorted order. */
  private def chain(idxs: List[Long]): List[List[Long]] =
    idxs.zipWithIndex
      .groupBy { case (idx, rank) => idx - rank }
      .values.map(_.map(_._1).sorted).toList.sortBy(_.head)

  /** Brute-force maximal-run finder for the reference answer. */
  private def runsBrute(idxs: List[Long]): List[List[Long]] =
    idxs.foldLeft(List.empty[List[Long]]) {
      case (acc @ (run :: rest), i) if run.head == i - 1 => (i :: run) :: rest
      case (acc, i) => List(i) :: acc
    }.map(_.reverse).reverse

  property("chained groups are exactly the brute-force maximal runs") =
    Prop.forAll(idxSet) { idxs =>
      chain(idxs) == runsBrute(idxs)
    }

  property("each group is gapless; adjacent groups never touch (maximality)") =
    Prop.forAll(idxSet) { idxs =>
      val groups = chain(idxs)
      val gapless = groups.forall(g =>
        g.zip(g.tail).forall { case (a, b) => b == a + 1 })
      val maximal = groups.isEmpty || groups.zip(groups.tail).forall {
        case (a, b) => b.head > a.last + 1
      }
      val partitions = groups.flatten.sorted == idxs
      gapless && maximal && partitions
    }

  property("run token mass: Σ len·spanLen over groups = spanLen · |input|") =
    Prop.forAll(idxSet) { idxs =>
      val n = 5L // q140's spanLen
      chain(idxs).map(_.size.toLong * n).sum == n * idxs.size
    }
}
