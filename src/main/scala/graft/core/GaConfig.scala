package graft.core

/** SGA run configuration.
  *
  * @param nBits            genome length in bits (ONEMAX optimum)
  * @param popSize          population size; the reference derives it as
  *                         ceil(k·n·log2 n)
  *                         (/root/reference/src/edu/illinois/ga/MapReduce.java:454)
  * @param tournamentSize   sliding-window tournament size S
  * @param numPartitions    pinned partition count (determinism contract:
  *                         all RNG is seed+partitionId, so partitioning
  *                         must be stable across runs)
  * @param seed             master seed; per-stage RNGs derive from it
  * @param maxGenerations   hard stop
  * @param convergenceSlack stop when best >= nBits - slack
  *                         (/root/reference/src/edu/illinois/ga/MapReduce.java:433-434)
  * @param dedupOffspring   the "incremental" variant's semantics:
  *                         identical offspring collapse to one per
  *                         generation (reference reducer-HashMap dedup,
  *                         /root/reference/src/edu/illinois/incr_ga/IncMapReduce.java:241-325)
  */
case class GaConfig(
    nBits: Int,
    popSize: Long,
    tournamentSize: Int = 5,
    numPartitions: Int = 8,
    seed: Long = 42L,
    maxGenerations: Int = 100,
    convergenceSlack: Int = 10,
    dedupOffspring: Boolean = false) {
  require(nBits > 0 && popSize > 0 && tournamentSize > 1)
  def converged(bestFitness: Long): Boolean =
    bestFitness >= nBits - convergenceSlack
}

object GaConfig {

  /** pop = ceil(k · n · log2 n), the reference's population-sizing rule
    * (/root/reference/src/edu/illinois/ga/MapReduce.java:454). */
  def populationSize(nBits: Int, k: Double): Long =
    math.ceil(k * nBits * (math.log(nBits.toDouble) / math.log(2.0))).toLong
}
