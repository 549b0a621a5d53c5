package graft.sga

import java.util.Random

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{GaConfig, Genome, Individual, Tournament}

/** Result of an SGA run. */
case class SgaResult(
    bestGenome: Array[Long],
    bestFitness: Long,
    generations: Int,
    history: Seq[Long])

/** Simple genetic algorithm (ONEMAX) as a library of pure
  * Dataset→Dataset stages over Spark SQL — the Spark-first
  * re-expression of /root/reference/src/edu/illinois/ga/MapReduce.java
  * (see SURVEY.md §2.1 ops 1-13 for the op-by-op mapping).
  *
  * Scale posture: one shuffle per generation (the mixing step — the
  * only shuffle the algorithm semantically needs), fitness evaluation
  * and partial argmax fully inside whole-stage codegen, selection +
  * crossover in a single narrow `mapPartitions`, and a
  * `localCheckpoint` per generation to cut the iterative lineage
  * (the reference paid a full HDFS write/read round-trip per
  * generation for the same purpose, MapReduce.java:298-302).
  */
object Sga {

  /** Column expression: ONEMAX fitness of a bit-packed genome — sum of
    * per-word popcounts (reference op 3, MapReduce.java:100-111).
    * Built entirely from codegen'd built-ins (bit_count inside
    * transform + aggregate), no UDF.
    */
  def fitnessExpr(genome: Column): Column =
    aggregate(
      transform(genome, w => bit_count(w).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Reference op 2: seeded parallel population init. `spark.range`
    * replaces the reference's seed-file fan-out trick (op 1,
    * MapReduce.java:314-356) — parallelism is native.
    * RNG discipline: `new Random(seed + partitionId)`, so results are
    * reproducible for a pinned partition count.
    */
  def initPopulation(spark: SparkSession, cfg: GaConfig): Dataset[Individual] = {
    import spark.implicits._
    spark.range(0L, cfg.popSize, 1L, cfg.numPartitions)
      .mapPartitions { it =>
        val rng = new Random(cfg.seed + TaskContext.getPartitionId())
        it.map(_ => Individual(Genome.random(cfg.nBits, rng), 0L))
      }
  }

  /** Reference op 3: re-score every individual. Declarative, so Catalyst
    * fuses it with whatever follows in one codegen stage. */
  def evaluate(pop: Dataset[Individual]): Dataset[Individual] = {
    import pop.sparkSession.implicits._
    pop.withColumn("fitness", fitnessExpr(col("genome"))).as[Individual]
  }

  /** Reference ops 7-8: the mixing shuffle. A seeded `rand` key is
    * hash-repartitioned (random reducer assignment — op 7's
    * IndividualPartitioner) and sorted within partitions (op 8's random
    * sort comparator), yielding a deterministic-for-a-seed random
    * permutation. NOT a global `orderBy(rand)` — that would add a range
    * exchange + full sort; this is a single hash exchange with a cheap
    * in-partition sort, the minimal mixing the algorithm needs.
    */
  def mix(pop: Dataset[Individual], cfg: GaConfig, generation: Int): Dataset[Individual] = {
    import pop.sparkSession.implicits._
    val key = rand(cfg.seed * 1000003L + generation)
    pop.withColumn("__mix", key)
      .repartition(cfg.numPartitions, col("__mix"))
      .sortWithinPartitions("__mix")
      .drop("__mix")
      .as[Individual]
  }

  /** Reference ops 9-10: per-partition sliding-window tournament +
    * paired uniform crossover, one narrow `mapPartitions` (no shuffle;
    * the mixing shuffle already randomized partition contents).
    * Emits exactly one child per input row (population preserved). */
  def selectAndCross(pop: Dataset[Individual], cfg: GaConfig, generation: Int): Dataset[Individual] = {
    import pop.sparkSession.implicits._
    val s = cfg.tournamentSize
    val seed = cfg.seed
    pop.mapPartitions { it =>
      val rng = new Random(seed * 7919L + generation * 104729L +
        TaskContext.getPartitionId())
      Tournament.selectAndCross(it, s, rng)
    }
  }

  /** Reference ops 4-6: global best via the built-in argmax aggregate —
    * Catalyst runs it partial (per partition) + final, replacing the
    * reference's side-channel files + driver scan
    * (MapReduce.java:132-148,386-426). */
  def best(pop: Dataset[Individual]): (Array[Long], Long) = {
    val row = pop.agg(
      max_by(col("genome"), col("fitness")).as("g"),
      max(col("fitness")).as("f")).head()
    (row.getSeq[Long](0).toArray, row.getLong(1))
  }

  /** Reference op 11: the generation loop. localCheckpoint each
    * generation truncates lineage (and is the only materialization —
    * vs the reference's per-generation HDFS round trip). Stops on
    * convergence (best >= n - slack) or maxGenerations. */
  def runLoop(spark: SparkSession, cfg: GaConfig): SgaResult = {
    var pop = evaluate(initPopulation(spark, cfg))
      .persist(StorageLevel.MEMORY_AND_DISK).localCheckpoint()
    var gen = 0
    val history = scala.collection.mutable.ArrayBuffer[Long]()
    var (bg, bf) = best(pop)
    history += bf
    while (!cfg.converged(bf) && gen < cfg.maxGenerations) {
      val next = evaluate(selectAndCross(mix(pop, cfg, gen), cfg, gen))
        .localCheckpoint()
      pop.unpersist(blocking = false)
      pop = next
      gen += 1
      val r = best(pop)
      bg = r._1; bf = r._2
      history += bf
    }
    pop.unpersist(blocking = false)
    SgaResult(bg, bf, gen, history.toSeq)
  }
}
