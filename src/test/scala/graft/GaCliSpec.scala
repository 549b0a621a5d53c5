package graft

import java.nio.file.Files

import graft.sga.Sga

/** The CLI argument surface — specifically the SGA durable-resume path
  * (the reference's `iter` continuation arg): run k generations, "crash",
  * re-invoke with the same resume dir and a larger budget, and land on
  * the identical trajectory an uninterrupted run produces. */
class GaCliSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-cli-sga").toString

  private def genomes(root: String, gen: Int): Seq[Seq[Long]] =
    Sga.loadGeneration(spark, root, gen).collect()
      .map(_.genome.toSeq).toSeq.sorted(Ordering.Implicits.seqOrdering[Seq, Long])

  test("sga CLI resume matches the uninterrupted run generation-for-generation") {
    val interrupted = tmpDir()
    val straight = tmpDir()
    // 2 generations, then resume the same dir up to 4
    GaCli.main(Array("sga", "2", "128", "2", "0.5", interrupted))
    assert(Sga.latestGeneration(spark, interrupted).contains(2))
    GaCli.main(Array("sga", "2", "128", "4", "0.5", interrupted))
    // the uninterrupted twin
    GaCli.main(Array("sga", "2", "128", "4", "0.5", straight))
    assert(Sga.latestGeneration(spark, interrupted).contains(4))
    assert(Sga.latestGeneration(spark, straight).contains(4))
    // identical population multiset at the final generation — the
    // resume consumed the durable state, not a fresh init
    assert(genomes(interrupted, 4) == genomes(straight, 4))
  }

  test("the CLI leaves an embedding caller's session running") {
    GaCli.main(Array("sga", "2", "64", "1", "0.5"))
    assert(!spark.sparkContext.isStopped,
      "GaCli must not stop a session it did not create")
  }
}
