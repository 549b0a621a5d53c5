package graft.core

import java.util.Random
import org.scalatest.funsuite.AnyFunSuite

class GenomeSpec extends AnyFunSuite {

  test("words: ceil division") {
    assert(Genome.words(1) == 1)
    assert(Genome.words(64) == 1)
    assert(Genome.words(65) == 2)
    assert(Genome.words(256) == 4)
  }

  test("random genome masks tail bits beyond nBits") {
    val rng = new Random(42)
    for (n <- Seq(1, 7, 63, 65, 100, 130)) {
      val g = Genome.random(n, rng)
      assert(g.length == Genome.words(n))
      for (i <- n until g.length * 64) assert(Genome.bit(g, i) == 0,
        s"tail bit $i set for n=$n")
    }
  }

  test("popcount matches per-bit loop") {
    val rng = new Random(7)
    for (_ <- 1 to 50) {
      val g = Genome.random(200, rng)
      val slow = (0 until 200).map(i => Genome.bit(g, i).toLong).sum
      assert(Genome.popcount(g) == slow)
    }
  }

  test("crossover: per-position child bit multiset equals parents'") {
    // {c1_b, c2_b} == {p1_b, p2_b} per bit  <=>  c1&c2 == p1&p2 && c1|c2 == p1|p2
    val metaRng = new Random(123)
    for (_ <- 1 to 200) {
      val p1 = Array.fill(3)(metaRng.nextLong())
      val p2 = Array.fill(3)(metaRng.nextLong())
      val (c1, c2) = Genome.uniformCrossover(p1, p2, new Random(metaRng.nextLong()))
      for (i <- 0 until 3) {
        assert((c1(i) & c2(i)) == (p1(i) & p2(i)))
        assert((c1(i) | c2(i)) == (p1(i) | p2(i)))
      }
    }
  }

  test("crossover of identical parents reproduces the parent") {
    val rng = new Random(3)
    val p = Genome.random(128, rng)
    val (c1, c2) = Genome.uniformCrossover(p, p, rng)
    assert(c1.sameElements(p) && c2.sameElements(p))
  }

  test("crossover is deterministic for a seed") {
    val p1 = Genome.random(128, new Random(1))
    val p2 = Genome.random(128, new Random(2))
    val a = Genome.uniformCrossover(p1, p2, new Random(99))
    val b = Genome.uniformCrossover(p1, p2, new Random(99))
    assert(a._1.sameElements(b._1) && a._2.sameElements(b._2))
  }
}
