package graft.sources

import org.apache.hadoop.io.{LongWritable, Writable}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Individual

/** A bit-packed genome as a Hadoop Writable, wire-compatible with the
  * reference's record format so OUR engine can read the reference's
  * on-disk generations (and write files it could read back): an int32
  * word count followed by that many big-endian int64s —
  * /root/reference/src/edu/illinois/ga/LongArrayWritable.java:36-50.
  * Re-implemented from the format description, not the code; a failed
  * deserialize there patches in a `[-1]` sentinel
  * (/root/reference/src/edu/illinois/incr_ga/LongArrayWritable.java:53-57),
  * which we do NOT replicate — a short read here is an error, not data.
  */
class GenomeWritable extends Writable {
  var words: Array[Long] = Array.emptyLongArray

  override def write(out: java.io.DataOutput): Unit = {
    out.writeInt(words.length)
    var i = 0
    while (i < words.length) { out.writeLong(words(i)); i += 1 }
  }

  override def readFields(in: java.io.DataInput): Unit = {
    val n = in.readInt()
    require(n >= 0, s"negative genome length $n")
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = in.readLong(); i += 1 }
    words = a
  }
}

object GenomeWritable {
  def apply(g: Array[Long]): GenomeWritable = {
    val w = new GenomeWritable
    w.words = g
    w
  }
}

/** SequenceFile interchange with the reference's generation dirs
  * (SURVEY §2.1 op 13: `GA/iter{k}` holds (genome, fitness) pairs as
  * uncompressed SequenceFiles,
  * /root/reference/src/edu/illinois/ga/MapReduce.java:282-302).
  * Parquet is this engine's native generation format (Sga.save/
  * loadGeneration); these two functions exist so a population written
  * by the reference's Hadoop jobs can be continued here, and vice
  * versa. */
object SequenceFiles {

  /** Read a reference-format generation dir into a typed population. */
  def readPopulation(spark: SparkSession, path: String): Dataset[Individual] = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[GenomeWritable], classOf[LongWritable])
      // Writable instances are reused by the record reader: copy out
      .map { case (g, f) => Individual(g.words.clone(), f.get()) }
      .toDS()
  }

  /** Write a population as an uncompressed (genome, fitness)
    * SequenceFile dir the reference's jobs could consume. */
  def writePopulation(pop: Dataset[Individual], path: String): Unit =
    pop.rdd
      .map(ind => (GenomeWritable(ind.genome), new LongWritable(ind.fitness)))
      .saveAsSequenceFile(path, codec = None)
}
