package graft.sources

import graft.SparkSpec
import graft.core.{GaConfig, Individual}
import graft.sga.Sga

class SequenceFilesSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  test("population round-trips through the reference's SequenceFile format") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-seq").toFile
    val path = s"${tmp.getAbsolutePath}/iter0"
    val cfg = GaConfig(nBits = 128, popSize = 256, tournamentSize = 5,
      numPartitions = 4, seed = 7, maxGenerations = 1)
    val pop = Sga.evaluate(Sga.initPopulation(spark, cfg))
    SequenceFiles.writePopulation(pop, path)
    val back = SequenceFiles.readPopulation(spark, path)
    def canon(ds: org.apache.spark.sql.Dataset[Individual]) =
      ds.collect().map(i => (i.genome.toSeq, i.fitness)).sortBy(_.hashCode).toSeq
    assert(canon(back) == canon(pop))
    assert(back.count() == 256)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

  test("wire format: int32 word count + big-endian int64 words") {
    val bytes = new java.io.ByteArrayOutputStream()
    GenomeWritable(Array(0x0102030405060708L, -1L))
      .write(new java.io.DataOutputStream(bytes))
    val expect = Array[Byte](0, 0, 0, 2, // count
      1, 2, 3, 4, 5, 6, 7, 8, // word 0 big-endian
      -1, -1, -1, -1, -1, -1, -1, -1) // word 1
    assert(bytes.toByteArray.toSeq == expect.toSeq)
    val r = new GenomeWritable
    r.readFields(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray)))
    assert(r.words.toSeq == Seq(0x0102030405060708L, -1L))
  }
}
