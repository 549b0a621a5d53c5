package graft

import org.apache.spark.sql.SparkSession
import graft.cga.{Cga, CgaConfig}

/** Standalone cGA timing: the bench-pinned ONEMAX config, repeated
  * `reps` times, printing per-run seconds (median is the signal —
  * the loop is action-latency bound, not data bound). */
object CgaBench {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // reference op 21 (CGA.java:339-341): straggler re-launch
      .config("spark.speculation", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = CgaConfig(nBits = 64, numSplits = 2, tournamentSize = 8,
      population = 20, seed = 42, maxIterations = 400)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val r = Cga.runLoop(spark, cfg)
      val s = (System.nanoTime() - t0) / 1e9
      (s, r.iterations, r.converged)
    }
    times.foreach { case (s, its, c) =>
      println(f"""{"metric":"cga_run_sec","value":$s%.3f,"iterations":$its,"converged":$c}""")
    }
    spark.stop()
  }
}
