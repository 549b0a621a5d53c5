package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timer for the versioned-table lifecycle (the gate rows'
  * fixture shape): times init / append / append / dataDirs / delete /
  * dataDirs / read+count individually, many reps, printing per-phase
  * medians — resolves the ProfileJobs driver-gap finding into concrete
  * commit-protocol phases.
  *
  * Usage: runMain graft.ProfilePhases [reps] [sfDir]
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .appName("graft-profile-phases")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.extensions", "graft.sources.GraftSqlExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val base = graft.ops.Tables.documents(s, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
    // warmup
    base.filter(col("doc_id") < 10).count()

    // per-phase job accounting: a listener sums job wall time so each
    // phase reports (wall, Σjobs, njobs) — separating cluster work from
    // driver-side commit-protocol overhead
    val jobMs = new java.util.concurrent.atomic.AtomicLong()
    val nJobs = new java.util.concurrent.atomic.AtomicLong()
    val starts = new scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, js.time)
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { t0 =>
            jobMs.addAndGet(je.time - t0); nJobs.incrementAndGet(); ()
          }
      })
    val acc = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[(Double, Double, Long)]]()
    def timed[T](k: String)(f: => T): T = {
      Thread.sleep(50) // drain listener between phases
      val (j0, n0) = (jobMs.get(), nJobs.get())
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      acc.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer())
        .+=((wall, (jobMs.get() - j0) / 1e3, nJobs.get() - n0))
      r
    }
    (1 to reps).foreach { _ =>
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft_prof")
      val root = tmpRoot.resolve("tbl").toString
      try {
        val vt = graft.sources.VersionedTable
        timed("init") { vt.init(s, root, base.filter(col("doc_id") < 150)
          .repartitionByRange(2, col("doc_id"))) }
        timed("append1") { vt.append(s, root,
          base.filter(col("doc_id") >= 150 && col("doc_id") < 300)
            .repartitionByRange(2, col("doc_id")), expectedVersion = 0) }
        timed("append2") { vt.append(s, root,
          base.filter(col("doc_id") >= 300 && col("doc_id") < 450)
            .repartitionByRange(2, col("doc_id")), expectedVersion = 1) }
        timed("dataDirs") { vt.dataDirs(s, root, Some(2)) }
        timed("delete") { vt.delete(s, root,
          col("doc_id").between(180, 260)) }
        timed("read+count") { vt.read(s, root)
          .select(col("doc_id"), md5(col("text")).as("m"))
          .count() }
      } finally
        org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      val walls = ts.map(_._1).sorted
      val jobs = ts.map(_._2).sorted
      val nj = ts.map(_._3).max
      println(f"$k%12s  wall med ${walls(ts.length / 2)}%.3f  " +
        f"min ${walls.head}%.3f | jobs med ${jobs(ts.length / 2)}%.3f  " +
        f"njobs $nj")
    }
    spark.stop()
  }
}
