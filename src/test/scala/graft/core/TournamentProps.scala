package graft.core

import java.util.Random
import org.scalacheck.{Gen, Prop, Properties}

/** SURVEY §5.2 properties for selection + crossover. */
object TournamentProps extends Properties("Tournament") {

  private val genPop: Gen[List[Long]] =
    Gen.chooseNum(6, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000L)))

  private def inds(fits: Seq[Long]): Seq[Individual] =
    fits.map(f => Individual(Array(f), f))

  property("population size is always preserved") =
    Prop.forAll(genPop, Gen.long) { (fits, seed) =>
      val out = Tournament.selectAndCross(
        inds(fits).iterator, 5, new Random(seed)).toSeq
      out.size == fits.size
    }

  property("selection never invents genomes: children's words come from parents") =
    Prop.forAll(genPop, Gen.long) { (fits, seed) =>
      // single-word genomes: every child word w satisfies
      // w == (p1&m)|(p2&~m) for SOME window parents — a necessary
      // condition is that each set bit of w exists in some input genome
      val inputBits = fits.foldLeft(0L)(_ | _)
      val out = Tournament.selectAndCross(
        inds(fits).iterator, 5, new Random(seed)).toSeq
      out.forall(c => (c.genome(0) & ~inputBits) == 0L)
    }

  property("winners dominate: children OR/AND bounded by top-window fitness words") =
    Prop.forAll(genPop, Gen.long) { (fits, seed) =>
      // with genome == fitness encoding, every crossover's parent pair
      // are tournament winners, whose fitness is >= the min of their
      // windows; weak but fully general check: no child word exceeds
      // the global max genome bits-wise union
      val all = fits.foldLeft(0L)(_ | _)
      val out = Tournament.selectAndCross(
        inds(fits).iterator, 5, new Random(seed)).toSeq
      out.forall(c => (c.genome(0) | all) == all)
    }
}
