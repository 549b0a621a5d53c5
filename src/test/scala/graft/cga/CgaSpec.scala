package graft.cga

import graft.SparkSpec
import graft.core.Genome

class CgaSpec extends SparkSpec {

  private val cfg = CgaConfig(nBits = 64, numSplits = 2, tournamentSize = 8,
    population = 20, seed = 42, maxIterations = 400)

  test("initVector: all cells 0.5, correct shard shape") {
    val v = Cga.initVector(spark, cfg).collect().sortBy(_.splitId)
    assert(v.length == cfg.numSplits)
    assert(v.forall(_.probs.length == cfg.splitBits))
    assert(v.forall(_.probs.forall(_ == 0.5)))
    assert(v.map(_.splitId).toSeq == (0L until cfg.numSplits).toSeq)
  }

  test("sample: T candidates per split, genome width matches, deterministic") {
    val v = Cga.initVector(spark, cfg)
    val s1 = Cga.sample(v, cfg, 3).collect().sortBy(_.splitId)
    assert(s1.forall(_.candidates.length == cfg.tournamentSize))
    assert(s1.forall(_.candidates.forall(_.length == Genome.words(cfg.splitBits))))
    val s2 = Cga.sample(v, cfg, 3).collect().sortBy(_.splitId)
    assert(s1.zip(s2).forall { case (a, b) =>
      a.candidates.zip(b.candidates).forall { case (x, y) => x.sameElements(y) }
    })
  }

  test("sample respects extreme probabilities") {
    import spark.implicits._
    val allOnes = spark.createDataset(Seq(
      VectorSplit(0L, Array.fill(32)(1.0)),
      VectorSplit(1L, Array.fill(32)(0.0))))
    val s = Cga.sample(allOnes, cfg.copy(nBits = 64, numSplits = 2), 0)
      .collect().sortBy(_.splitId)
    assert(s(0).candidates.forall(g => Genome.popcount(g) == 32L))
    assert(s(1).candidates.forall(g => Genome.popcount(g) == 0L))
  }

  test("candidateTotals matches driver-side popcount sums") {
    val v = Cga.initVector(spark, cfg)
    val sampled = Cga.sample(v, cfg, 1)
    val totals = Cga.candidateTotals(sampled, cfg)
    val local = sampled.collect()
    val expected = (0 until cfg.tournamentSize).map(l =>
      local.map(ss => Genome.popcount(ss.candidates(l))).sum).toArray
    assert(totals.toSeq == expected.toSeq)
  }

  test("pickWinnerLoser: argmax/argmin, first index on ties") {
    assert(Cga.pickWinnerLoser(Array(3L, 9L, 9L, 1L, 1L)) == (1, 3))
    assert(Cga.pickWinnerLoser(Array(5L)) == (0, 0))
  }

  test("update: hand-computed 2-bit example") {
    import spark.implicits._
    // probs = [0.5, 0.5]; winner bits = [1, 0], loser bits = [0, 0]
    // bit 0 differs -> +delta; bit 1 same -> untouched
    val c = CgaConfig(nBits = 2, numSplits = 1, tournamentSize = 2,
      population = 10) // delta = 0.1
    val ss = spark.createDataset(Seq(SampledSplit(0L, Array(0.5, 0.5),
      Array(Array(1L), Array(0L)))))
    val (vec, un) = Cga.update(ss, winner = 0, loser = 1, c).collect().head
    assert(math.abs(vec.probs(0) - 0.6) < 1e-12)
    assert(vec.probs(1) == 0.5)
    // band [0.1, 0.501]: 0.6 is out, 0.5 is in -> 1 unconverged
    assert(un == 1L)
  }

  test("update clamps to [0,1]") {
    import spark.implicits._
    val c = CgaConfig(nBits = 2, numSplits = 1, tournamentSize = 2,
      population = 2) // delta = 0.5
    val ss = spark.createDataset(Seq(SampledSplit(0L, Array(0.9, 0.1),
      Array(Array(1L), Array(2L))))) // winner=[1,0], loser=[0,1]
    val (vec, _) = Cga.update(ss, 0, 1, c).collect().head
    assert(vec.probs(0) == 1.0) // 0.9 + 0.5 clamped
    assert(vec.probs(1) == 0.0) // 0.1 - 0.5 clamped
  }

  test("RDD iteration core computes the same trajectory as the Dataset operators") {
    import spark.implicits._
    val n = 5
    // drive n iterations through the declarative Dataset operators
    var vectors = Cga.initVector(spark, cfg)
    for (it <- 0 until n) {
      val sampled = Cga.sample(vectors, cfg, it)
      val totals = Cga.candidateTotals(sampled, cfg)
      val (w, l) = Cga.pickWinnerLoser(totals)
      vectors = Cga.update(sampled, w, l, cfg).map(_._1)
    }
    val viaDataset = vectors.collect().sortBy(_.splitId).flatMap(_.probs)
    // runLoop (RDD core) stopped at the same iteration count
    val viaRdd = Cga.runLoop(spark, cfg.copy(maxIterations = n)).vector
    assert(viaDataset.toSeq == viaRdd.toSeq,
      "Dataset operators and the RDD loop core diverged")
  }

  test("runLoop converges on ONEMAX and pushes the vector up") {
    val r = Cga.runLoop(spark, cfg)
    assert(r.converged, s"did not converge in ${r.iterations} iterations")
    assert(r.vector.length == cfg.nBits)
    // ONEMAX pressure: most cells should have converged high
    val high = r.vector.count(_ > cfg.uLimit)
    assert(high > cfg.nBits / 2,
      s"only $high/${cfg.nBits} cells converged high")
    assert(r.winnerFitness > cfg.nBits / 2)
  }
}
