package graft.core

import java.util.Random

/** Bit-packed genome codec: n gene bits in ceil(n/64) longs, 64 genes
  * per word, mirroring the reference representation
  * (/root/reference/src/edu/illinois/ga/MapReduce.java:35,67-81).
  *
  * Pure Scala, zero Spark deps — unit/property tested without a session.
  * Tail bits beyond nBits are kept zero (the reference leaves them
  * random and never reads them because its n is a multiple of 64 in
  * practice; masking makes ONEMAX == popcount exact for any n).
  */
object Genome {
  val LongBits = 64

  /** Words needed for nBits genes. */
  def words(nBits: Int): Int = (nBits + LongBits - 1) / LongBits

  /** Uniform random genome; tail bits masked to zero. */
  def random(nBits: Int, rng: Random): Array[Long] = {
    val w = words(nBits)
    val g = new Array[Long](w)
    var i = 0
    while (i < w) { g(i) = rng.nextLong(); i += 1 }
    val rem = nBits % LongBits
    if (rem != 0) g(w - 1) &= (1L << rem) - 1
    g
  }

  /** ONEMAX fitness = total set bits
    * (/root/reference/src/edu/illinois/ga/MapReduce.java:100-111). */
  def popcount(g: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < g.length) { s += java.lang.Long.bitCount(g(i)); i += 1 }
    s
  }

  /** Gene bit i (0-based). */
  def bit(g: Array[Long], i: Int): Int =
    ((g(i / LongBits) >>> (i % LongBits)) & 1L).toInt

  /** Uniform crossover: one random 64-bit mask per word replaces the
    * reference's 64 per-bit coin flips
    * (/root/reference/src/edu/illinois/ga/MapReduce.java:174-201) —
    * identical distribution (each bit an independent fair coin),
    * 64× fewer RNG draws.
    * c1 takes p1's bits where mask=1, p2's where mask=0; c2 is the
    * complement, so per bit position the children's bit multiset
    * equals the parents'.
    */
  def uniformCrossover(p1: Array[Long], p2: Array[Long], rng: Random)
      : (Array[Long], Array[Long]) = {
    val w = p1.length
    val c1 = new Array[Long](w)
    val c2 = new Array[Long](w)
    var i = 0
    while (i < w) {
      val m = rng.nextLong()
      c1(i) = (p1(i) & m) | (p2(i) & ~m)
      c2(i) = (p2(i) & m) | (p1(i) & ~m)
      i += 1
    }
    (c1, c2)
  }
}
