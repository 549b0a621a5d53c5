package graft.pipeline

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck invariants for the deterministic-sampling family: the
  * Lehmer-hash predicates must hold their contracts on ANY id set and
  * ANY rate, not just SamplingSpec's fixtures — these are the
  * properties a 100 TB pipeline silently depends on (stable
  * membership under rate changes, leakage purity under any component
  * structure). Uses the shared test session (graft.SparkSpec). */
object SamplingProps extends Properties("Sampling") {

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val idsGen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))
    .map(_.distinct.take(300))

  private val rateGen = Gen.choose(0, 1000)

  property("hashSample membership nests across ANY rate pair") =
    Prop.forAllNoShrink(idsGen, rateGen, rateGen) { (ids, r1, r2) =>
      val (lo, hi) = (math.min(r1, r2), math.max(r1, r2))
      val df = ids.toDF("doc_id")
      val small = Sampling.hashSample(df, "doc_id", lo)
        .collect().map(_.getLong(0)).toSet
      val big = Sampling.hashSample(df, "doc_id", hi)
        .collect().map(_.getLong(0)).toSet
      small.subsetOf(big) :| s"rate $lo kept ${small.diff(big)} outside rate $hi"
    }

  property("leakageSafeSplit is pure in the component and total over ids") =
    Prop.forAllNoShrink(idsGen, Gen.choose(1L, 20L), rateGen) {
      (ids, nComps, train) =>
        val valid = math.min(1000 - train, 100)
        val comps = ids.map(i => (i, i % nComps)).toDF("doc_id", "component")
        val split = Sampling.leakageSafeSplit(comps, train, valid)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        (split.length == ids.length) :| "every id assigned exactly once" &&
          split.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1) :|
            "a component straddles splits" &&
          split.forall(s => Set("train", "valid", "test")(s._3)) :|
            "unknown split label"
    }

  property("leakageSafeSplit train set only grows with the train rate") =
    Prop.forAllNoShrink(idsGen, Gen.choose(0, 900), Gen.choose(0, 99)) {
      (ids, train, bump) =>
        val comps = ids.map(i => (i, i % 7L)).toDF("doc_id", "component")
        def trainSet(t: Int) = Sampling
          .leakageSafeSplit(comps, t, validPermille = 0)
          .collect().filter(_.getString(2) == "train").map(_.getLong(0)).toSet
        val a = trainSet(train)
        val b = trainSet(train + bump)
        a.subsetOf(b) :| s"raising train rate evicted ${a.diff(b)}"
    }

  property("weightedSample keeps a subset of hashSample at the same rate " +
      "and never keeps zero-weight rows") =
    Prop.forAllNoShrink(idsGen, rateGen) { (ids, rate) =>
      val df = ids.map(i => (i, i % 5L)).toDF("doc_id", "w")
      val weighted = Sampling.weightedSample(df, "doc_id", "w",
        maxWeight = 4L, permille = rate)
        .collect().map(_.getLong(0)).toSet
      val plain = Sampling.hashSample(df, "doc_id", rate)
        .collect().map(_.getLong(0)).toSet
      val zeros = ids.filter(_ % 5L == 0L).toSet
      weighted.subsetOf(plain) :|
        s"weighted kept ${weighted.diff(plain)} that hashSample dropped" &&
        weighted.intersect(zeros).isEmpty :| "kept a zero-weight row"
    }
}
