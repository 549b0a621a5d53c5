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
}
