package graft.core

import java.util.Random
import org.scalatest.funsuite.AnyFunSuite

class TournamentSpec extends AnyFunSuite {

  private def ind(fit: Long): Individual =
    Individual(Array(fit), fit) // genome encodes fitness for traceability

  /** Brute-force replica of the reference reducer's control flow
    * (/root/reference/src/edu/illinois/ga/MapReduce.java:224-271) that
    * records each tournament winner's fitness. */
  private def referenceWinners(fits: Seq[Long], s: Int): Seq[Long] = {
    val win = new Array[Long](s)
    var processed = 0
    val winners = scala.collection.mutable.ArrayBuffer[Long]()
    def argmax(): Long = {
      var bf = -1L
      for (j <- 0 until s) if (win(j) > bf) bf = win(j)
      bf
    }
    for (f <- fits) {
      win(processed % s) = f
      if (processed >= s) winners += argmax()
      processed += 1
    }
    for (_ <- 0 until s) { winners += argmax(); processed += 1 }
    winners.toSeq
  }

  test("population size is preserved (even row count)") {
    val rows = (1L to 100L).map(ind)
    val out = Tournament.selectAndCross(rows.iterator, 5, new Random(1)).toSeq
    assert(out.size == rows.size)
  }

  test("population size is preserved (odd row count)") {
    for (n <- Seq(7L, 99L, 101L)) {
      val rows = (1L to n).map(ind)
      val out = Tournament.selectAndCross(rows.iterator, 5, new Random(1)).toSeq
      assert(out.size == rows.size, s"n=$n")
    }
  }

  test("all emitted children have fitness 0 (re-evaluated next gen)") {
    val rows = (1L to 40L).map(ind)
    val out = Tournament.selectAndCross(rows.iterator, 5, new Random(1)).toSeq
    assert(out.forall(_.fitness == 0L))
  }

  test("winners match the reference sliding-window argmax") {
    // Genomes are single-word arrays equal to the fitness, and crossover
    // of words a,b yields words whose OR/AND bound the parents — instead
    // of decoding children, check the selected parent stream directly by
    // replicating selection with crossover disabled via identical pairs:
    // feed a sequence where each window argmax is unique and verify the
    // child pool only draws bits from the right winners.
    val fits = Seq[Long](5, 3, 9, 1, 7, 2, 8, 4, 6, 10, 11, 0)
    val s = 3
    val expected = referenceWinners(fits, s)
    // expected winners: tournaments start at arrival s
    assert(expected.size == fits.size)
    // Children = crossover(pair); with single-word genomes = fitness
    // values, c1|c2 == p1|p2 and c1&c2 == p1&p2. Reconstruct the
    // unordered winner pairs from consecutive expected winners and
    // compare with the emitted children's OR/AND.
    val out = Tournament.selectAndCross(fits.map(ind).iterator, s, new Random(7)).toSeq
    val childPairs = out.grouped(2).map(p => (p(0).genome(0), p(1).genome(0))).toSeq
    val expPairs = expected.grouped(2).map(p => (p(0), p(1))).toSeq
    assert(childPairs.size == expPairs.size)
    for (((c1, c2), (p1, p2)) <- childPairs.zip(expPairs)) {
      assert((c1 | c2) == (p1 | p2), "bit union differs")
      assert((c1 & c2) == (p1 & p2), "bit intersection differs")
    }
  }

  test("partition smaller than window passes rows through unchanged") {
    val rows = (1L to 3L).map(ind)
    val out = Tournament.selectAndCross(rows.iterator, 5, new Random(1)).toSeq
    assert(out.map(_.fitness) == Seq(1L, 2L, 3L))
  }

  test("empty input yields empty output") {
    assert(Tournament.selectAndCross(Iterator.empty, 5, new Random(1)).isEmpty)
  }

  test("selection pressure: mean child word popcount >= parent mean (ONEMAX)") {
    val rng = new Random(42)
    val rows = (1 to 2000).map { _ =>
      val g = Genome.random(64, rng)
      Individual(g, Genome.popcount(g))
    }
    val out = Tournament.selectAndCross(rows.iterator, 5, new Random(43)).toSeq
    val parentMean = rows.map(_.fitness).sum.toDouble / rows.size
    val childMean = out.map(i => Genome.popcount(i.genome)).sum.toDouble / out.size
    assert(childMean > parentMean,
      s"child mean $childMean should exceed parent mean $parentMean")
  }
}
