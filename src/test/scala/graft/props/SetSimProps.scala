package graft.props

import org.scalacheck.{Gen, Prop, Properties}

/** Pure-set-algebra laws behind the q114/q122 prefix-filtered similarity
  * joins, checked over random set families far beyond the fixed corpus:
  * the prefix filter must be LOSSLESS — every pair at-or-above the
  * threshold shares a prefix element — for any input, any df ordering.
  * These mirror the exact integer arithmetic the operators use
  * (`⌈τn⌉ = ⌊(num·n + den−1) / den⌋`, `den·inter ≥ num·union`). */
object SetSimProps extends Properties("setsim-prefix-filter") {

  // small universe so random sets actually overlap
  private val universe: Gen[Int] = Gen.choose(0, 29)
  private val docSet: Gen[Set[Int]] =
    Gen.nonEmptyListOf(universe).map(_.toSet)
  private val family: Gen[List[Set[Int]]] =
    Gen.listOfN(12, docSet)

  /** Rarest-first canonical order: (document frequency asc, element asc)
    * — exactly the operators' (df, token) sort. */
  private def ordered(fam: List[Set[Int]]): List[List[Int]] = {
    val df = fam.flatten.groupBy(identity).view.mapValues(_.size).toMap
    fam.map(_.toList.sortBy(e => (df(e), e)))
  }

  private def prefixLen(n: Int, num: Int, den: Int): Int =
    n - ((n * num + den - 1) / den) + 1

  property("jaccard: τ-similar pairs always share a prefix element (lossless)") =
    Prop.forAll(family) { fam =>
      val (num, den) = (3, 5)
      val ord = ordered(fam)
      (for {
        i <- fam.indices; j <- (i + 1) until fam.size
        inter = (fam(i) & fam(j)).size
        union = (fam(i) | fam(j)).size
        if inter * den >= union * num // J ≥ τ
      } yield {
        val pi = ord(i).take(prefixLen(fam(i).size, num, den)).toSet
        val pj = ord(j).take(prefixLen(fam(j).size, num, den)).toSet
        (pi & pj).nonEmpty
      }).forall(identity)
    }

  property("containment: τ-contained sets always hit the container via the probe prefix") =
    Prop.forAll(family) { fam =>
      val (num, den) = (9, 10)
      val ord = ordered(fam)
      (for {
        i <- fam.indices; j <- fam.indices if i != j
        inter = (fam(i) & fam(j)).size
        if inter * den >= fam(i).size * num // C(i→j) ≥ τ
      } yield {
        // probe side prefix × container FULL set — the q122 shape
        val pi = ord(i).take(prefixLen(fam(i).size, num, den)).toSet
        (pi & fam(j)).nonEmpty
      }).forall(identity)
    }

  property("prefix length never exceeds the set size and is ≥ 1") =
    Prop.forAll(Gen.choose(1, 1000)) { n =>
      Seq((3, 5), (9, 10)).forall { case (num, den) =>
        val p = prefixLen(n, num, den)
        p >= 1 && p <= n
      }
    }

  // ——— HLL register merge (q119's theorem, any split) ———

  private def rho(h: Long): Long = {
    // mirrors the operator: 25 − (⌊log₂ w⌋ + 1), w = low 24 bits
    val w = h & 0xFFFFFFL
    if (w == 0) 25L else java.lang.Long.numberOfLeadingZeros(w) - 39L
  }

  private def registers(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(_ >>> 24).view.mapValues(_.map(rho).max).toMap

  property("HLL registers: any 2-way split merged by bucket-max equals the direct build") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, (1L << 32) - 1)),
                Gen.long) { (hashes, seed) =>
      val (a, b) = hashes.partition(h => ((h ^ seed) & 1) == 0)
      val merged = (registers(a).keySet ++ registers(b).keySet).map { k =>
        k -> math.max(registers(a).getOrElse(k, 0L),
          registers(b).getOrElse(k, 0L))
      }.toMap
      merged == registers(hashes)
    }
}
