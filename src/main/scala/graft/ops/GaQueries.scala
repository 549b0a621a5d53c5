package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GaConfig
import graft.sga.Sga
import graft.cga.{Cga, CgaConfig}

/** The GA engines exposed through the driver's query surface.
  *
  * The GA LOOP is stochastic (seeded, but not SQL-expressible), so the
  * full-run entries have no DuckDB oracle — the driver records a
  * rows-only check; deterministic invariants are asserted by the
  * scalatest suites instead (SURVEY.md §5). The deterministic HALF of
  * one generation — the mixing permutation and the fitness evaluation —
  * IS hash-gateable, via the fixture trick below.
  */
object GaQueries extends QueryPack {

  /** Where sgaGenerationInvariant parks the generation-0 population so
    * the DuckDB oracle can replay the SAME bytes via read_parquet.
    * Content is seeded and sf-independent, so reruns at any SF rewrite
    * identical values. */
  private val fixtureDir = "/tmp/graft_fixture/sga_gen0"

  /** Hash-gated generation-step invariant (the oracle-backed sibling of
    * `sga_onemax`): materialize a seeded generation-0 population as a
    * parquet fixture, push it through the engine's REAL mixing shuffle
    * (`Sga.mix`: rand-keyed hash repartition + in-partition sort,
    * reference ops 7-8), and emit the multiset summary of the result —
    * one row per distinct genome with its multiplicity and its
    * popcount fitness from the native codegen'd PopCountArray
    * (reference op 3). The DuckDB oracle recomputes the same summary
    * directly from the fixture with `bit_count`, so a hash match
    * proves, cross-engine, that (a) mix is exactly a permutation —
    * nothing dropped, duplicated, or corrupted by the shuffle — the
    * population-preservation invariant the reference's partitioner +
    * sort pair relies on (MapReduce.java:160-201), and (b) the packed
    * popcount fitness agrees with an independent engine on genuinely
    * random genomes (not just the synthetic ones q13 derives from sf
    * tables). Selection + crossover stay spec-gated: their outputs
    * depend on java.util.Random streams no SQL engine can replay. */
  def sgaGenerationInvariant(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cfg = GaConfig(nBits = 256, popSize = 4096, tournamentSize = 5,
      numPartitions = 8, seed = 1337, maxGenerations = 1)
    Sga.initPopulation(spark, cfg).write.mode("overwrite").parquet(fixtureDir)
    // step from the RELOADED fixture (not the recomputed lineage) so
    // Spark and the oracle read byte-identical inputs
    val pop = spark.read.parquet(fixtureDir).as[graft.core.Individual]
    Sga.mix(pop, cfg, generation = 0).toDF()
      .select(
        md5(concat_ws(",", transform(col("genome"), _.cast("string"))))
          .as("genome_key"),
        Sga.fitnessExpr(col("genome")).as("fitness"))
      .groupBy("genome_key")
      .agg(count(lit(1)).as("cnt"), min(col("fitness")).as("fitness"))
      .orderBy("genome_key")
  }

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
    "sga_generation_invariant" -> sgaGenerationInvariant _,
  )

  override def oracle: Map[String, String] = Map(
    // replay the fixture the Spark side just wrote: same multiset
    // summary, independently computed (bit_count vs PopCountArray)
    "sga_generation_invariant" ->
      s"""SELECT md5(array_to_string(genome, ',')) AS genome_key,
        |  COUNT(*) AS cnt,
        |  MIN(CAST(list_aggregate(list_transform(genome,
        |    x -> bit_count(x)), 'sum') AS BIGINT)) AS fitness
        |FROM read_parquet('$fixtureDir/*.parquet')
        |GROUP BY genome_key
        |ORDER BY genome_key""".stripMargin,
  )
}
