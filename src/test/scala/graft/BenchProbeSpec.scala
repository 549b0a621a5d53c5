package graft

import org.scalactic.Tolerance
import org.scalatest.funsuite.AnyFunSuite

/** The bench's probe-contamination estimator ([[Bench.probeStats]]),
  * pinned against the round-14 failure mode: a head-of-session median
  * baseline was JIT-cold (~2.2× steady state), so (a) contamination
  * fired only at ~3× steady state and (b) the "total / probe_median"
  * normalizer divided by a ratio < 1 and INFLATED totals. The
  * session-minimum baseline is immune to both: a storm can only
  * inflate probes, never deflate them. */
class BenchProbeSpec extends AnyFunSuite with Tolerance {

  test("JIT-cold head probes do not set the base: steady-state rows " +
    "ratio ~1, not ~0.46") {
    // 3 cold warm-ups at 25 ms, steady state at 11-12 ms
    val warm = Seq(0.025, 0.024, 0.026)
    val rows = Seq(0.012, 0.011, 0.012, 0.011)
    val (base, ratios) = Bench.probeStats(warm ++ rows, rows)
    assert(base == 0.011)
    assert(ratios.forall(r => r >= 0.99 && r <= 1.1),
      s"steady rows ride ~1.0 on a min base, got $ratios")
    val median = ratios.sorted.apply(ratios.length / 2)
    assert(median >= 0.9 && median <= 1.1, "quiet-run contract band")
  }

  test("a mid-run storm flags exactly the stormed rows at their true " +
    "ratio, even when the run STARTS inside the storm") {
    // run begins stormed (warm-ups and first rows inflated), clears
    // at row 3 — the post-hoc min re-anchors earlier rows correctly
    val warm = Seq(0.060, 0.055, 0.058)
    val rows = Seq(0.050, 0.048, 0.010, 0.011, 0.030)
    val (base, ratios) = Bench.probeStats(warm ++ rows, rows)
    assert(base == 0.010)
    assert(ratios(0) == 5.0 && ratios(1) === 4.8 +- 1e-9)
    assert(ratios(2) == 1.0 && ratios(3) === 1.1 +- 1e-9)
    assert(ratios(4) == 3.0, "non-uniform spike visible at true ratio")
    assert(ratios.count(_ >= 1.5) == 3, "exactly the stormed rows flag")
  }

  test("floor: scheduler-noise probes never divide by ~0") {
    val (base, ratios) = Bench.probeStats(Seq(0.0001, 0.0002),
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
    val (base, ratios) = Bench.probeStats(rows, rows)
    assert(base >= 0.13, s"the lull must not anchor the base, got $base")
    assert(ratios.count(_ >= 1.5) == 0,
      "a quiet session with one fast lull must flag NOTHING")
    // but a real storm over the same session still flags at ~ratio
    val stormed = rows.updated(20, 0.42)
    val (_, r2) = Bench.probeStats(stormed, stormed)
    assert(r2(20) >= 2.8, "a genuine 3x spike still flags")
  }
}
