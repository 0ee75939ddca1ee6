package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.Multimodal
import graft.streaming.{MediaGate, SemanticGate}

/** Property-based checks over the pure banding/arithmetic layer of the
  * perceptual-dedup family (no SparkSession — hundreds of samples stay
  * cheap). These are the GUARANTEES the q302/q304/q305/q307 recall
  * accounting leans on, proven mechanically instead of only at the
  * fixture points the specs sample. */
object BandingProps extends Properties("banding") {

  private val mask = (1L << Multimodal.phashBandBits) - 1

  private def flipBits(base: Long, width: Int, n: Int, seed: Long): Long = {
    // deterministic distinct bit positions from the seed
    val pos = Iterator.iterate(seed.abs)(s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 33) % width).toInt).distinct.take(n).toSeq
    pos.foldLeft(base)((h, p) => h ^ (1L << p))
  }

  private val hash56: Gen[Long] = Gen.choose(Long.MinValue, Long.MaxValue)
    .map(_ & ((1L << 56) - 1))
  private val hash32: Gen[Long] = Gen.choose(Long.MinValue, Long.MaxValue)
    .map(_ & 0xFFFFFFFFL)

  /** Image pigeonhole: 7 disjoint 8-bit arms over 56 bits — ANY pair at
    * Hamming ≤ 6 shares at least one untouched arm. This is the law the
    * q302 recall audit cites when it asserts a lost pair with no
    * agreeing band must sit beyond d = 6. */
  property("image: d ≤ 6 always shares a disjoint band (pigeonhole)") =
    Prop.forAll(hash56, Gen.choose(0, 6), Gen.choose(Long.MinValue, Long.MaxValue)) {
      (h, d, seed) =>
        val h2 = flipBits(h, 56, d, seed)
        Multimodal.phashBandShifts("image")
          .exists(sh => ((h >> sh) & mask) == ((h2 >> sh) & mask))
    }

  /** Audio/video pigeonhole: the 4 DISJOINT arms guarantee d ≤ 3; the 3
    * rotated multi-probe arms add recall beyond but no guarantee. */
  property("32-bit: d ≤ 3 always shares one of the 4 disjoint bands") =
    Prop.forAll(hash32, Gen.choose(0, 3), Gen.choose(Long.MinValue, Long.MaxValue)) {
      (h, d, seed) =>
        val h2 = flipBits(h, 32, d, seed)
        Seq(0, 8, 16, 24)
          .exists(sh => ((h >> sh) & mask) == ((h2 >> sh) & mask))
    }

  /** The gate's band keys are exactly the per-arm slices: two hashes
    * collide in some gate group iff they agree on some arm — so the
    * pigeonhole guarantees transfer verbatim to q305/q307 admission. */
  property("gate band keys ≡ arm agreement, every kind") =
    Prop.forAll(Gen.oneOf("image", "audio", "video"), hash56, hash56) {
      (kind, a0, b0) =>
        val (a, b) = if (kind == "image") (a0, b0)
                     else (a0 & 0xFFFFFFFFL, b0 & 0xFFFFFFFFL)
        val share = MediaGate.bandKeysOf(kind, a).toSet
          .intersect(MediaGate.bandKeysOf(kind, b).toSet).nonEmpty
        val agree = MediaGate.shiftsFor(kind)
          .exists(sh => ((a >> sh) & mask) == ((b >> sh) & mask))
        share == agree
    }

  private val vec: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.choose(-4.0f, 4.0f)).map(_.toSeq)
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  /** cosR4 is symmetric, bounded to the r4 grid in [-1, 1], and exactly
    * 1.0 on identical vectors — the invariants the q308 stream ≡ replay
    * identity rests on. */
  property("cosR4: symmetric, r4-grid-valued in [-1,1], reflexive 1.0") =
    Prop.forAll(vec, vec) { (a, b) =>
      val c = SemanticGate.cosR4(a, b)
      val sym = c == SemanticGate.cosR4(b, a)
      val grid = math.abs(c * 1e4 - math.rint(c * 1e4)) < 1e-6
      sym && grid && c >= -1.0 && c <= 1.0 &&
        SemanticGate.cosR4(a, a) == 1.0
    }

  /** Seen-based fold invariant: admission verdicts depend only on the
    * prefix of earlier arrivals, never on later ones — feeding the same
    * docs in one batch or split across two gives identical verdicts
    * (the relational-replayability argument, checked on the pure fold). */
  property("media fold: batch-split invariance") =
    Prop.forAll(Gen.listOfN(12, hash32), Gen.choose(1, 11)) { (hs, cut) =>
      val docs = hs.zipWithIndex.map { case (h, i) =>
        graft.streaming.MediaDoc(i.toLong, "audio", h) }
      val one = MediaGate.runFold(docs, Seq.empty, "bk", cap = 4)._1
      val (d1, d2) = docs.splitAt(cut)
      val (v1, st) = MediaGate.runFold(d1, Seq.empty, "bk", cap = 4)
      val (v2, _) = MediaGate.runFold(d2, st, "bk", cap = 4)
      one == v1 ++ v2
    }

  property("semantic fold: batch-split invariance") =
    Prop.forAll(Gen.listOfN(10, vec), Gen.choose(1, 9)) { (vs, cut) =>
      val docs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val one = SemanticGate.runFold(docs, Seq.empty, "0:5", cap = 4)._1
      val (d1, d2) = docs.splitAt(cut)
      val (v1, st) = SemanticGate.runFold(d1, Seq.empty, "0:5", cap = 4)
      val (v2, _) = SemanticGate.runFold(d2, st, "0:5", cap = 4)
      one == v1 ++ v2
    }

  /** The semantic band keys are exactly the per-arm sign-vector slices:
    * two vectors collide in some gate group iff their 32-plane SimHashes
    * agree on one of the 4 disjoint bytes — so exact duplicates
    * (identical planes) are guaranteed, and d ≤ 3 sign-bit drift keeps
    * the pigeonhole guarantee, same as audio/video. */
  property("semantic band keys ≡ arm agreement; d ≤ 3 sign drift guaranteed") =
    Prop.forAll(hash32, Gen.choose(0, 3), Gen.choose(Long.MinValue, Long.MaxValue)) {
      (s, d, seed) =>
        val s2 = flipBits(s, 32, d, seed)
        SemanticGate.bandKeysOf(s).toSet
          .intersect(SemanticGate.bandKeysOf(s2).toSet).nonEmpty
    }
}
