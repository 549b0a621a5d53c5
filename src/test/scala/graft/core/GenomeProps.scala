package graft.core

import java.util.Random
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite (sbt runs the scalacheck framework
  * natively; no scalatestplus bridge needed). */
object GenomeProps extends Properties("Genome") {

  private val wordArray = Gen.containerOfN[Array, Long](4, Gen.long)

  property("crossover preserves per-position bit multiset") =
    Prop.forAll(wordArray, wordArray, Gen.long) { (p1, p2, seed) =>
      val (c1, c2) = Genome.uniformCrossover(p1, p2, new Random(seed))
      (0 until 4).forall { i =>
        (c1(i) & c2(i)) == (p1(i) & p2(i)) &&
        (c1(i) | c2(i)) == (p1(i) | p2(i))
      }
    }

  property("popcount equals sum of word bitCounts") =
    Prop.forAll(wordArray) { g =>
      Genome.popcount(g) == g.map(java.lang.Long.bitCount(_).toLong).sum
    }

  property("random genome fitness bounded by nBits") =
    Prop.forAll(Gen.choose(1, 500), Gen.long) { (n, seed) =>
      val g = Genome.random(n, new Random(seed))
      val pc = Genome.popcount(g)
      pc >= 0 && pc <= n
    }
}
