package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  // anisotropic 4-d fixture: spread t·u (dominant) + small
  // deterministic wobble along an orthogonal w
  private val u = {
    val raw = Array(1.0, 2.0, 3.0, 4.0)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private val w = {
    val raw = Array(2.0, -1.0, 0.0, 0.0) // ⊥ u
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private lazy val planted = (0 until 40).map { i =>
    val a = (i - 20).toDouble
    val b = ((i * 7) % 5 - 2) * 0.05
    val x = Array.tabulate(4)(j => (a * u(j) + b * w(j)).toFloat)
    (i.toLong, x.toSeq)
  }.toDF("vec_id", "embedding")

  test("jacobi eigendecomposition recovers a hand-built spectrum") {
    // A = Q D Qᵀ with D = diag(5, 2, 1) and Q a known 3-d rotation
    val c = math.cos(0.7); val s = math.sin(0.7)
    val q = Array(
      Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val d0 = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => q(i)(k) * d0(k) * q(j)(k)).sum
    }
    val (vals, vecs) = Embeddings.jacobiEig(a)
    for (k <- 0 until 3) {
      assert(math.abs(vals(k) - d0(k)) < 1e-9, vals.mkString(","))
      val expect = Array.tabulate(3)(i => q(i)(k))
      val dot = (0 until 3).map(i => vecs(k)(i) * expect(i)).sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-9,
        s"eigvec $k misaligned: ${vecs(k).mkString(",")}")
    }
  }

  test("top principal component aligns with the planted direction") {
    val (_, eigVals, eigVecs) = Embeddings.pcaBasis(planted, dim = 4)
    val dot = (0 until 4).map(i => eigVecs(0)(i) * u(i)).sum
    assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
      s"top PC ${eigVecs(0).mkString(",")} vs planted ${u.mkString(",")}")
    assert(eigVals(0) > 100 * eigVals(1), eigVals.mkString(","))
    // eigenvalues descend; trace is preserved
    assert(eigVals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("basis is orthonormal and eigenvalue sum equals total variance") {
    val (_, eigVals, eigVecs) = Embeddings.pcaBasis(planted, dim = 4)
    for (i <- 0 until 4; j <- i until 4) {
      val dot = (0 until 4).map(k => eigVecs(i)(k) * eigVecs(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"($i,$j) -> $dot")
    }
    // trace check against per-coordinate sample variances
    val cols = planted.select(
      (0 until 4).map(i => col("embedding")(i).cast("double").as(s"c$i")): _*)
      .collect()
    val byCoord = (0 until 4).map { i =>
      val xs = cols.map(_.getDouble(i))
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    assert(math.abs(eigVals.sum - byCoord.sum) < 1e-6,
      s"${eigVals.sum} vs ${byCoord.sum}")
  }

  test("full-rank projection preserves pairwise distances (pure rotation)") {
    val proj = Embeddings.pcaProject(planted, k = 4, dim = 4)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = planted.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- Seq(0L, 7L, 19L); j <- Seq(3L, 25L, 39L)) {
      assert(math.abs(d2(raw(i), raw(j)) - d2(proj(i), proj(j))) < 1e-6,
        s"distance not preserved for ($i,$j)")
    }
  }

  test("explained fraction reflects the kept eigenvalues") {
    val (_, eigVals, _) = Embeddings.pcaBasis(planted, dim = 4)
    val got = Embeddings.pcaProject(planted, k = 1, dim = 4)
      .select("explained").head().getDouble(0)
    assert(math.abs(got - eigVals(0) / eigVals.sum) < 1e-12)
    assert(got > 0.999, s"dominant direction must explain ~all: $got")
  }

  // three well-separated 4-d cluster centers + small wobble
  private val centers3 = Array(
    Array(10.0, 0.0, 0.0, 0.0),
    Array(0.0, 10.0, 0.0, 0.0),
    Array(0.0, 0.0, 10.0, 5.0))
  private lazy val clustered = (0 until 60).map { i =>
    val c = centers3(i % 3)
    val eps = ((i * 13) % 7 - 3) * 0.03
    (i.toLong, Array.tabulate(4)(j => (c(j) + eps).toFloat).toSeq)
  }.toDF("vec_id", "embedding")

  private def bruteAssign(v: Array[Double], cents: Array[Array[Double]],
      metric: String): Int = {
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    val scores = cents.map { c =>
      if (metric == "cosine") {
        val d = norm(v) * norm(c)
        if (d == 0.0) -2.0 else dot(v, c) / d
      } else -a2(v, c)
    }
    scores.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2
  }
  private def a2(a: Array[Double], b: Array[Double]) =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("assignToCentroids matches brute force under both metrics") {
    val raw = clustered.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    for (metric <- Seq("cosine", "l2")) {
      val got = Embeddings.assignToCentroids(clustered, centers3, metric)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 60)
      raw.foreach { case (id, v) =>
        assert(got(id) == bruteAssign(v, centers3, metric).toLong,
          s"$metric vec $id: got ${got(id)}")
      }
    }
  }

  test("assignToCentroids ties break to the lowest centroid index") {
    // duplicate centroids: every vector ties across 0 and 1
    val dup = Array(centers3(0), centers3(0))
    val got = Embeddings.assignToCentroids(clustered, dup, "l2")
      .select("cluster_id").distinct().collect().map(_.getLong(0)).toSet
    assert(got == Set(0L))
  }

  test("zero-norm vectors under cosine land on centroid 0, not NULL") {
    val z = Seq((0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val rows = Embeddings.assignToCentroids(z, centers3, "cosine")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 0L) // all scores -2, first wins
    assert(rows(1L) == 0L) // genuinely nearest in direction
  }

  test("clusterEmbeddings recovers the planted 3-way partition") {
    val labels = Embeddings.clusterEmbeddings(clustered, k = 3, metric = "l2",
        sampleSize = 60, trainIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 60)
    // same planted group -> same label; different groups -> different
    for (g <- 0 until 3) {
      val ls = (0 until 60).filter(_ % 3 == g).map(i => labels(i.toLong)).toSet
      assert(ls.size == 1, s"group $g split across labels $ls")
    }
    assert((0 until 3).map(g => labels(g.toLong)).toSet.size == 3)
  }
}
