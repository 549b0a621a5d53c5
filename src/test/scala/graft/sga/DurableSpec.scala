package graft.sga

import java.nio.file.Files
import graft.SparkSpec
import graft.core.GaConfig
import graft.cga.{Cga, CgaConfig}

class DurableSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-durable").toString

  test("dedupOffspring collapses identical genomes per generation") {
    val cfg = GaConfig(nBits = 8, popSize = 2048, numPartitions = 2,
      seed = 42, dedupOffspring = true)
    // 8-bit genomes, 2048 individuals: heavy duplication guaranteed
    val g0 = Sga.evaluate(Sga.initPopulation(spark, cfg))
    val g1 = Sga.step(g0, cfg, 0)
    val n = g1.count()
    val distinctGenomes = g1.dropDuplicates("genome").count()
    assert(n == distinctGenomes, "offspring must be genome-distinct")
    assert(n < cfg.popSize, "with 256 possible genomes, dedup must shrink 2048")
  }

  test("SGA durable loop persists generations and resumes") {
    val root = tmpDir()
    val cfg = GaConfig(nBits = 64, popSize = 512, numPartitions = 2,
      seed = 42, maxGenerations = 3, convergenceSlack = -1)
    val r1 = Sga.runLoopDurable(spark, cfg, root)
    assert(r1.generations == 3)
    assert(Sga.latestGeneration(spark, root).contains(3))
    // resume with a higher budget: continues from gen 3, not from 0
    val r2 = Sga.runLoopDurable(spark, cfg.copy(maxGenerations = 5), root)
    assert(r2.generations == 5)
    assert(Sga.latestGeneration(spark, root).contains(5))
    // the resumed population is the saved one (evaluate is idempotent)
    val reloaded = Sga.evaluate(Sga.loadGeneration(spark, root, 5))
    assert(reloaded.count() == cfg.popSize)
  }

  test("cGA durable loop saves vector and resumes from it") {
    val root = tmpDir()
    val cfg = CgaConfig(nBits = 64, numSplits = 2, tournamentSize = 8,
      population = 20, seed = 42, maxIterations = 5)
    val r1 = Cga.runLoop(spark, cfg, durableRoot = Some(root), saveEvery = 5)
    assert(!r1.converged && r1.iterations == 5)
    assert(Cga.latestIteration(spark, root).contains(5))
    val r2 = Cga.runLoop(spark, cfg.copy(maxIterations = 400),
      durableRoot = Some(root), saveEvery = 50)
    assert(r2.converged)
    // converged final vector persisted
    val last = Cga.latestIteration(spark, root).get
    assert(last > 5)
    val vec = Cga.loadVector(spark, root, last).collect()
    assert(vec.map(_.probs.length).sum == cfg.nBits)
  }
}
