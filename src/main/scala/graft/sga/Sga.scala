package graft.sga

import java.util.Random

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.{GaConfig, Genome, Individual, Tournament}

/** Driver-merged running argmax over (genome, fitness) — the Spark
  * accumulator spelling of the reference's side-channel best files +
  * driver scan (/root/reference/src/edu/illinois/ga/MapReduce.java:132-148,
  * 386-426). Strict `>` keeps the first-seen genome on fitness ties
  * (same tie class as `max_by`); a pure max is idempotent, so task
  * retries and speculative duplicates cannot corrupt it. */
class BestAccumulator
    extends org.apache.spark.util.AccumulatorV2[(Array[Long], Long), (Array[Long], Long)] {
  private var bestG: Array[Long] = null
  private var bestF: Long = Long.MinValue
  override def isZero: Boolean = bestG == null
  override def copy(): BestAccumulator = {
    val c = new BestAccumulator
    c.bestG = bestG; c.bestF = bestF
    c
  }
  override def reset(): Unit = { bestG = null; bestF = Long.MinValue }
  override def add(v: (Array[Long], Long)): Unit =
    if (bestG == null || v._2 > bestF) { bestG = v._1; bestF = v._2 }
  override def merge(
      other: org.apache.spark.util.AccumulatorV2[(Array[Long], Long), (Array[Long], Long)]): Unit = {
    val (g, f) = other.value
    if (g != null) add((g, f))
  }
  override def value: (Array[Long], Long) = (bestG, bestF)
}

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
    * per-word popcounts (reference op 3, MapReduce.java:100-111), as
    * the native codegen'd PopCountArray expression (one fused loop, no
    * intermediate array — see graft.functions.PopCountArray).
    */
  def fitnessExpr(genome: Column): Column =
    graft.functions.PopCountArray.popcountArray(genome)

  /** The equivalent built-ins-only spelling (bit_count inside
    * transform + aggregate); kept as the cross-check for tests. */
  def fitnessExprBuiltin(genome: Column): Column =
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

  /** One generation step: mix → select+cross → (optional incremental-
    * variant offspring dedup, reference op 14) → evaluate. */
  def step(pop: Dataset[Individual], cfg: GaConfig, gen: Int): Dataset[Individual] = {
    val crossed = selectAndCross(mix(pop, cfg, gen), cfg, gen)
    val next = if (cfg.dedupOffspring) crossed.dropDuplicates("genome") else crossed
    evaluate(next)
  }

  /** Reference op 11: the generation loop. localCheckpoint each
    * generation truncates lineage (and is the only materialization —
    * vs the reference's per-generation HDFS round trip). Stops on
    * convergence (best >= n - slack) or maxGenerations. */
  /** selectAndCross with fitness evaluation fused into the same
    * mapPartitions and the global argmax tracked by `acc` as rows
    * stream by. Values are identical to selectAndCross→evaluate→best
    * (popcount is pure; the accumulator is an idempotent max, safe
    * under task retries/speculation) — but the per-generation plan
    * loses one full-population aggregate job: the checkpoint
    * materialization is the ONLY action, and the best individual
    * rides home on the accumulator instead of a second 2 GB cache
    * scan (measured win at the reference's README:41 headline scale). */
  def selectCrossEvaluate(pop: Dataset[Individual], cfg: GaConfig,
      generation: Int, acc: BestAccumulator): Dataset[Individual] = {
    import pop.sparkSession.implicits._
    val s = cfg.tournamentSize
    val seed = cfg.seed
    pop.mapPartitions { it =>
      val rng = new Random(seed * 7919L + generation * 104729L +
        TaskContext.getPartitionId())
      Tournament.selectAndCross(it, s, rng).map { ind =>
        val f = Genome.popcount(ind.genome)
        acc.add((ind.genome, f))
        Individual(ind.genome, f)
      }
    }
  }

  def runLoop(spark: SparkSession, cfg: GaConfig,
      onGeneration: (Int, Long, Long) => Unit = (_, _, _) => ()): SgaResult = {
    var pop = evaluate(initPopulation(spark, cfg))
      .persist(StorageLevel.MEMORY_AND_DISK).localCheckpoint()
    var gen = 0
    val history = scala.collection.mutable.ArrayBuffer[Long]()
    var (bg, bf) = best(pop)
    history += bf
    while (!cfg.converged(bf) && gen < cfg.maxGenerations) {
      val t0 = System.nanoTime()
      val acc = new BestAccumulator
      spark.sparkContext.register(acc, s"sga_best_gen_${gen + 1}")
      val crossed = selectCrossEvaluate(mix(pop, cfg, gen), cfg, gen, acc)
      val deduped = if (cfg.dedupOffspring) crossed.dropDuplicates("genome")
        else crossed
      val next = deduped.localCheckpoint() // the generation's ONE action
      pop.unpersist(blocking = false)
      pop = next
      gen += 1
      val r = acc.value
      bg = r._1; bf = r._2
      history += bf
      onGeneration(gen, bf, (System.nanoTime() - t0) / 1000000L)
    }
    pop.unpersist(blocking = false)
    SgaResult(bg, bf, gen, history.toSeq)
  }

  // ---- durable generations (reference ops 13 + 22: per-generation
  // materialization as Parquet instead of SequenceFiles, with
  // resume-from-latest continuation) ----

  /** Write one generation durably (op 13's per-iteration sink). */
  def saveGeneration(pop: Dataset[Individual], root: String, gen: Int): Unit =
    pop.write.mode("overwrite").parquet(s"$root/gen=$gen")

  /** Read a generation back. */
  def loadGeneration(spark: SparkSession, root: String, gen: Int): Dataset[Individual] = {
    import spark.implicits._
    spark.read.parquet(s"$root/gen=$gen").as[Individual]
  }

  /** Latest persisted generation id under `root`, if any. */
  def latestGeneration(spark: SparkSession, root: String): Option[Int] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("gen=") => s.drop(4).toInt }
      .maxOption
  }

  /** The loop with durable generations: every generation lands in
    * `root/gen=k` Parquet, and a rerun resumes from the latest one
    * (reference op 22's `iter` CLI continuation, CGA.java:503-519).
    *
    * Every generation steps from the RELOADED parquet form — the same
    * discipline as the reference's per-iteration HDFS round trip.
    * This is what makes resume EXACT: the rand-keyed mixing shuffle
    * reads physical layout (per-partition rand streams), so stepping
    * from in-memory state here would put an uninterrupted run on a
    * different trajectory than a crash-and-resume one. With the
    * round trip, both see byte-identical inputs generation for
    * generation (GaCliSpec asserts the multiset equality). The write
    * itself is the loop's materialization point — no extra
    * localCheckpoint needed, and lineage stays one-generation deep. */
  def runLoopDurable(spark: SparkSession, cfg: GaConfig, root: String): SgaResult = {
    val startGen = latestGeneration(spark, root) match {
      case Some(g) => g
      case None =>
        saveGeneration(evaluate(initPopulation(spark, cfg)), root, 0)
        0
    }
    var gen = startGen
    var pop = evaluate(loadGeneration(spark, root, gen))
    val history = scala.collection.mutable.ArrayBuffer[Long]()
    var (bg, bf) = best(pop)
    history += bf
    while (!cfg.converged(bf) && gen < cfg.maxGenerations) {
      saveGeneration(step(pop, cfg, gen), root, gen + 1)
      gen += 1
      pop = evaluate(loadGeneration(spark, root, gen))
      val r = best(pop)
      bg = r._1; bf = r._2
      history += bf
    }
    SgaResult(bg, bf, gen, history.toSeq)
  }
}
