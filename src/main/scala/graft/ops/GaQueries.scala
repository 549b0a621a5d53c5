package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.GaConfig
import graft.sga.Sga
import graft.cga.{Cga, CgaConfig}

/** The GA engines exposed through the driver's query surface.
  *
  * The GA loop is stochastic (seeded, but not SQL-expressible), so
  * these entries have no DuckDB oracle — the driver records a
  * rows-only check; deterministic invariants are asserted by the
  * scalatest suites instead (SURVEY.md §5).
  */
object GaQueries extends QueryPack {

  /** Full seeded SGA ONEMAX run (reference SGA,
    * /root/reference/src/edu/illinois/ga/MapReduce.java): returns the
    * per-generation best-fitness history. Small config so Verify stays
    * fast; the engine itself scales by raising popSize/numPartitions.
    */
  def sgaOnemax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cfg = GaConfig(nBits = 64, popSize = 512, tournamentSize = 5,
      numPartitions = 4, seed = 42, maxGenerations = 30)
    val r = Sga.runLoop(spark, cfg)
    r.history.zipWithIndex
      .map { case (f, g) => (g, f) }
      .toDF("generation", "best_fitness")
      .orderBy("generation")
  }

  /** Full seeded cGA ONEMAX run (reference cGA,
    * /root/reference/src/edu/illinois/ga/CGA.java): returns the final
    * converged probability vector, one row per gene bit. */
  def cgaOnemax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cfg = CgaConfig(nBits = 64, numSplits = 2, tournamentSize = 8,
      population = 20, seed = 42, maxIterations = 400)
    val r = Cga.runLoop(spark, cfg)
    r.vector.zipWithIndex
      .map { case (p, b) => (b, p, r.winnerFitness, r.iterations) }
      .toSeq
      .toDF("bit", "prob", "winner_fitness", "iterations")
      .orderBy("bit")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sga_onemax" -> sgaOnemax _,
    "cga_onemax" -> cgaOnemax _,
  )

  override def oracle: Map[String, String] = Map.empty
}
