package graft.pipeline

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val ids = (0L until 10000L).toDF("doc_id")

  test("hash sample hits the requested rate within tolerance") {
    val n = Sampling.hashSample(ids, "doc_id", permille = 100).count()
    assert(math.abs(n - 1000L) < 150, s"10% of 10k ids -> got $n")
  }

  test("hash sample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(ids, "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(13), "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("lower rates select subsets of higher rates (stable membership)") {
    val small = Sampling.hashSample(ids, "doc_id", 50)
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(ids, "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big),
      "a doc's membership must not flip when the rate is raised")
  }

  test("rate bounds: 0 keeps nothing, 1000 keeps everything") {
    assert(Sampling.hashSample(ids, "doc_id", 0).count() == 0L)
    assert(Sampling.hashSample(ids, "doc_id", 1000).count() == 10000L)
  }

  private lazy val grouped = (0L until 1000L)
    .map(i => (i, s"g${i % 7}")).toDF("doc_id", "grp")

  test("stratified sample takes exactly min(k, group size) per group") {
    val got = Sampling.stratifiedSample(grouped, "grp", "doc_id", k = 25)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 7 && got.values.forall(_ == 25L), got.toString)
    // a group smaller than k survives whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "grp")
    val t = Sampling.stratifiedSample(tiny, "grp", "doc_id", k = 25)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t == Map("a" -> 2L, "b" -> 1L))
  }

  test("stratified sample is deterministic and partitioning-independent") {
    val a = Sampling.stratifiedSample(grouped, "grp", "doc_id", 25)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(grouped.repartition(13), "grp", "doc_id", 25)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  private lazy val weighted = (0L until 10000L)
    .map(i => (i, 100L + (i % 5) * 450L)).toDF("doc_id", "w")

  test("weighted sample keeps rows in proportion to their weight") {
    // weights 100,550,1000,1450,1900 under maxWeight 2000, rate 50% —
    // expected keep fraction per class: w/2000 * 0.5
    val kept = Sampling.weightedSample(weighted, "doc_id", "w", 2000L, 500)
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((w, n) <- kept) {
      val expect = 2000 * (w / 2000.0) * 0.5
      assert(math.abs(n - expect) < 90,
        s"weight $w kept $n, expected ~$expect")
    }
    // heavier rows must be kept strictly more often
    val byW = kept.toSeq.sortBy(_._1).map(_._2)
    assert(byW == byW.sorted, s"keep counts not monotone in weight: $kept")
  }

  test("weighted sample is deterministic; zero/null weights never survive") {
    val a = Sampling.weightedSample(weighted, "doc_id", "w", 2000L, 500)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(weighted.repartition(13), "doc_id", "w", 2000L, 500)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    val withZero = Seq((1L, 0L), (2L, -5L)).toDF("doc_id", "w")
      .union(weighted)
    val z = Sampling.weightedSample(withZero, "doc_id", "w", 2000L, 1000)
    assert(z.filter($"w" <= 0).count() == 0)
  }

  test("weighted sample with uniform max weight degenerates to hashSample") {
    val uni = (0L until 5000L).map(i => (i, 2000L)).toDF("doc_id", "w")
    val ws = Sampling.weightedSample(uni, "doc_id", "w", 2000L, 300)
      .collect().map(_.getLong(0)).toSet
    val hs = Sampling.hashSample(uni, "doc_id", 300)
      .collect().map(_.getLong(0)).toSet
    assert(ws == hs)
  }

  test("stratified quotas nest: k=10 selects a subset of k=25") {
    val small = Sampling.stratifiedSample(grouped, "grp", "doc_id", 10)
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.stratifiedSample(grouped, "grp", "doc_id", 25)
      .collect().map(_.getLong(0)).toSet
    assert(small.size == 70 && small.subsetOf(big),
      "shrinking an eval set must never swap its members")
  }

  test("mixCorpora: per-source rates, labels, and rate independence") {
    val a = (0L until 1000L).toDF("doc_id")
    val b = (1000L until 2000L).toDF("doc_id")
    val mix = Sampling.mixCorpora(
      Seq(("a_full", a, 1000), ("b_tenth", b, 100)), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLabel = mix.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLabel("a_full") == (0L until 1000L).toSet)
    assert(math.abs(byLabel("b_tenth").size - 100) < 40)
    // rate independence: b's members at 100 permille are identical
    // whether a rides at 1000 or 0 — no cross-source coupling
    val mix2 = Sampling.mixCorpora(
      Seq(("a_none", a, 0), ("b_tenth", b, 100)), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(mix2.filter(_._2 == "b_tenth").map(_._1).toSet ==
      byLabel("b_tenth"))
    assert(!mix2.exists(_._2 == "a_none"))
    // duplicate labels rejected
    intercept[IllegalArgumentException](
      Sampling.mixCorpora(Seq(("x", a, 10), ("x", b, 10)), "doc_id"))
  }

  test("leakageSafeSplit: components never straddle splits; rates land; " +
      "growing train only absorbs, never reshuffles") {
    // 2000 docs in 500 4-member components
    val comps = (0L until 2000L).map(i => (i, (i % 500L) * 4L))
      .toDF("doc_id", "component")
    val split = Sampling.leakageSafeSplit(comps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.length == 2000)
    // leakage-safety: split is a pure function of component
    assert(split.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1))
    // rough rates over the 500 components (800/100/100 permille)
    val byComp = split.groupBy(_._2).map(_._2.head._3).toSeq
    val train = byComp.count(_ == "train")
    assert(math.abs(train - 400) < 60, s"train comps: $train / 500")
    assert(byComp.count(_ == "valid") > 10 && byComp.count(_ == "test") > 10)
    // nesting: raising train rate never evicts a train member
    val wider = Sampling.leakageSafeSplit(comps, trainPermille = 900,
      validPermille = 50)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val train800 = split.filter(_._3 == "train").map(_._1).toSet
    val train900 = wider.filter(_._2 == "train").map(_._1).toSet
    assert(train800.subsetOf(train900))
    // partitioning independence
    val again = Sampling.leakageSafeSplit(comps.repartition(13))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(again == split.map(r => (r._1, r._3)).toSet)
    // invalid rates rejected
    intercept[IllegalArgumentException](
      Sampling.leakageSafeSplit(comps, trainPermille = 950,
        validPermille = 100))
  }
}
