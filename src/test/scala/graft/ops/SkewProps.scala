package graft.ops

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.sources.QuantileStats

/** ScalaCheck invariants for the skew advisor's estimator over RANDOM
  * planted distributions: `modalMass` must track the true modal share
  * within KLL rank error wherever the share is material, and the salt
  * sizing must be monotone, clamped, and anchored at the two regimes
  * that matter (uniform → 1, single-value → parallelism). Below KLL's
  * compaction threshold the sketch is exact, so mass errors there are
  * estimator bugs, not sketch noise. */
object SkewProps extends Properties("SkewAdvisor") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30).withMaxDiscardRatio(10f)

  // a planted distribution: n total values, a hot value holding
  // share s of them, the rest spread uniformly over distinct values
  private val planted = for {
    n <- Gen.choose(500, 4000)
    sharePct <- Gen.choose(5, 98)
  } yield (n, sharePct / 100.0)

  private def sketchOf(n: Int, share: Double) = {
    val sk = org.apache.datasketches.kll.KllDoublesSketch
      .newHeapInstance(200)
    val hot = math.round(n * share).toInt
    (1 to hot).foreach(_ => sk.update(-1.0)) // hot value
    (1 to (n - hot)).foreach(i => sk.update(i.toDouble))
    (sk, hot.toDouble / n)
  }

  property("modalMass tracks a planted hot share across the range") =
    Prop.forAll(planted) { case (n, share) =>
      val (sk, trueShare) = sketchOf(n, share)
      val est = QuantileStats.modalMass(sk).get
      // KLL rank error ~1.65% at k=200; allow 5% absolute slack plus
      // the 1/grid resolution floor for small shares
      val tol = math.max(0.05, 2.0 / 128)
      (est >= trueShare - tol && est <= trueShare + tol) :|
        s"n=$n planted=$trueShare est=$est"
    }

  property("salt sizing is monotone in the share and clamped to " +
    "[1, parallelism]") =
    Prop.forAll(Gen.choose(0.0, 1.5), Gen.choose(0.0, 1.5),
      Gen.choose(1, 512)) { (a, b, p) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val sLo = SkewAdvisor.saltFor(lo, p)
      val sHi = SkewAdvisor.saltFor(hi, p)
      (sLo >= 1 && sHi <= p && sLo <= sHi) :|
        s"p=$p lo=$lo→$sLo hi=$hi→$sHi"
    }

  property("anchors: a uniform sketch advises 1 (exactly in KLL's " +
    "exact mode, within rank-error slack after compaction), a " +
    "constant column advises the full width") =
    Prop.forAll(Gen.choose(200, 3000), Gen.choose(2, 256)) { (n, p) =>
      val uni = org.apache.datasketches.kll.KllDoublesSketch
        .newHeapInstance(200)
      (1 to n).foreach(i => uni.update(i.toDouble))
      val const = org.apache.datasketches.kll.KllDoublesSketch
        .newHeapInstance(200)
      (1 to n).foreach(_ => const.update(7.0))
      val uniSalt = SkewAdvisor.saltFor(
        QuantileStats.modalMass(uni).get, p)
      val constSalt = SkewAdvisor.saltFor(
        QuantileStats.modalMass(const).get, p)
      // past the exact threshold a compacted item carries weight > 1,
      // so a uniform value's plateau can read ~weight/n and at
      // extreme parallelism the advice lands at 2 instead of 1 — a
      // benign over-salt bounded by KLL's rank error (±1.65% → at
      // most ceil(0.033·p) extra); in exact mode it must be exactly 1
      val exact = uni.getN == uni.getNumRetained
      val slack = if (exact) 0 else math.ceil(0.033 * p).toInt
      val expectUniOne = p.toDouble / n <= 0.9
      ((!expectUniOne || uniSalt <= 1 + slack) && constSalt == p) :|
        s"n=$n p=$p exact=$exact uniSalt=$uniSalt constSalt=$constSalt"
    }

  property("anchors, exact mode: a uniform column below the sketch's " +
    "compaction threshold advises EXACTLY 1 at any practical width") =
    Prop.forAll(Gen.choose(40, 180), Gen.choose(2, 32)) { (n, p) =>
      val uni = org.apache.datasketches.kll.KllDoublesSketch
        .newHeapInstance(200)
      (1 to n).foreach(i => uni.update(i.toDouble))
      (SkewAdvisor.saltFor(QuantileStats.modalMass(uni).get, p) == 1) :|
        s"n=$n p=$p"
    }
}
