package graft

import org.scalactic.Tolerance
import org.scalatest.funsuite.AnyFunSuite

/** The bench's probe-contamination estimator ([[Bench.probeStats]]),
  * pinned against three observed failure modes: round 14's
  * head-of-session median base was JIT-cold (~2.2× steady state, so
  * contamination fired only at ~3× and the normalizer INFLATED);
  * round 17's raw-minimum base let one idle-core lull flag a quiet
  * session wholesale; rounds 17–18's BIMODAL fabric (persistent
  * fast/slow probe modes ~1.5–2× apart) flagged half the rows at the
  * mode gap with nothing per-row wrong. The estimator: p10 anchor (a
  * storm can only inflate probes, and a median would land INSIDE a
  * majority-storm), with the flag THRESHOLD adapting to the
  * session's shape — 1.5× on a unimodal session, 3× when p50/p10
  * reveals two modes. */
class BenchProbeSpec extends AnyFunSuite with Tolerance {

  test("JIT-cold head probes do not set the base: steady-state rows " +
    "ratio ~1, not ~0.46") {
    // 3 cold warm-ups at 25 ms, steady state at 11-12 ms
    val warm = Seq(0.025, 0.024, 0.026)
    val rows = Seq(0.012, 0.011, 0.012, 0.011)
    val (base, ratios, _) = Bench.probeStats(warm ++ rows, rows)
    assert(base == 0.011)
    assert(ratios.forall(r => r >= 0.99 && r <= 1.1),
      s"steady rows ride ~1.0 on a min base, got $ratios")
    val median = ratios.sorted.apply(ratios.length / 2)
    assert(median >= 0.9 && median <= 1.1, "quiet-run contract band")
  }

  test("a mid-run storm flags exactly the stormed rows at their true " +
    "ratio, even when the run STARTS inside the storm — the p10 " +
    "anchor stays OUTSIDE a majority-storm where a median would " +
    "land inside it") {
    // run begins stormed (warm-ups and first rows inflated), clears
    // at row 3 — the post-hoc near-min re-anchors earlier rows
    val warm = Seq(0.060, 0.055, 0.058)
    val rows = Seq(0.050, 0.048, 0.010, 0.011, 0.030)
    val (base, ratios, flagAt) = Bench.probeStats(warm ++ rows, rows)
    assert(base == 0.010)
    assert(ratios(0) == 5.0 && ratios(1) === 4.8 +- 1e-9)
    assert(ratios(2) == 1.0 && ratios(3) === 1.1 +- 1e-9)
    assert(ratios(4) == 3.0, "non-uniform spike visible at true ratio")
    // the majority-storm session reads bimodal (p50 deep in the
    // storm), so the threshold rises to 3× — and the genuinely
    // stormed rows STILL flag, because a storm is not a mode gap
    assert(flagAt == 3.0)
    assert(ratios.count(_ >= flagAt) == 3,
      "exactly the stormed rows flag")
  }

  test("floor: scheduler-noise probes never divide by ~0") {
    val (base, ratios, _) = Bench.probeStats(Seq(0.0001, 0.0002),
      Seq(0.0001, 0.010))
    assert(base == 0.005)
    assert(ratios(0) < 1.0 && ratios(1) == 2.0)
  }

  test("one atypically fast probe in a long session does not set the " +
    "base: the near-minimum survives the outlier (round-17 failure " +
    "mode — a 0.048 s lull among ~0.14 s quiet probes flagged every " +
    "row at a uniform ~1.5-2x)") {
    // 30 quiet probes at ~0.14 s, one 0.048 s idle-core lull
    val rows = Seq.fill(15)(0.14) ++ Seq(0.048) ++ Seq.fill(15)(0.141)
    val (base, ratios, flagAt) = Bench.probeStats(rows, rows)
    assert(base >= 0.13, s"the lull must not anchor the base, got $base")
    assert(flagAt == 1.5, "a unimodal quiet session keeps the tight " +
      "threshold")
    assert(ratios.count(_ >= flagAt) == 0,
      "a quiet session with one fast lull must flag NOTHING")
    // but a real storm over the same session still flags at ~ratio
    val stormed = rows.updated(20, 0.42)
    val (_, r2, f2) = Bench.probeStats(stormed, stormed)
    assert(r2(20) >= 2.8 && r2(20) >= f2, "a genuine 3x spike still flags")
  }

  test("BIMODAL fabric (persistent interleaved fast/slow modes ~2x " +
    "apart): the mode gap flags NOTHING, a genuine spike clear of " +
    "both modes still flags — the rounds-17/18 phantom-regression " +
    "fix") {
    // 80 probes alternating 0.10 / 0.19 — the measured host shape
    val rows = (0 until 80).map(i => if (i % 2 == 0) 0.10 else 0.19)
    val (base, ratios, flagAt) = Bench.probeStats(rows, rows)
    assert(base === 0.10 +- 1e-9)
    assert(flagAt == 3.0, s"two modes ~2x apart must widen the " +
      s"threshold, got $flagAt")
    assert(ratios.count(_ >= flagAt) == 0,
      "slow-mode rows are the fabric, not per-row contamination")
    // a 0.55 s probe (5.5x the fast mode, ~3x the slow mode) is a
    // real spike in EITHER mode's terms
    val spiked = rows.updated(40, 0.55)
    val (_, r2, f2) = Bench.probeStats(spiked, spiked)
    assert(r2(40) >= f2, "a spike clear of both modes still flags")
    assert(r2.count(_ >= f2) == 1)
  }

  test("probeDist records the session's shape for cross-round " +
    "comparison: p10/p50/p90 of the raw probe series") {
    val rows = (0 until 80).map(i => if (i % 2 == 0) 0.10 else 0.19)
    val (p10, p50, p90) = Bench.probeDist(rows)
    assert(p10 === 0.10 +- 1e-9)
    assert(p50 === 0.19 +- 1e-9 || p50 === 0.10 +- 1e-9)
    assert(p90 === 0.19 +- 1e-9)
    assert(Bench.probeDist(Seq.empty) == ((0.0, 0.0, 0.0)))
  }
}
