package graft

import org.apache.spark.sql.SparkSession
import graft.core.GaConfig
import graft.sga.Sga

/** The SURVEY §6 local GA yardstick: sec/generation for the pinned SGA
  * config (n=4096, pop=65536, 8 partitions, 20 generations, seed 42).
  * Prints one JSON line; recorded in BASELINE.md so future rounds have
  * a reproducible local number the reference repo never published.
  */
object GaBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ga-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = GaConfig(nBits = 4096, popSize = 65536, tournamentSize = 5,
      numPartitions = 8, seed = 42, maxGenerations = 20,
      convergenceSlack = -1) // slack -1: never converges early, runs all 20
    val t0 = System.nanoTime()
    val r = Sga.runLoop(spark, cfg)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"sga_sec_per_generation","value":${sec / r.generations}%.3f,"unit":"sec","generations":${r.generations},"total_sec":$sec%.3f,"best":${r.bestFitness},"n":4096,"pop":65536}""")
    spark.stop()
  }
}
