package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-matrix analytics (SURVEY.md §2.3 extension; no reference
  * counterpart). PCA is the workhorse of embedding pipelines —
  * whitening before clustering, dimensionality reduction before ANN
  * indexing (IVF-PQ trains on PCA-rotated vectors), drift monitoring
  * via explained-variance profiles.
  *
  * The 100 TB shape ("big data, small math"): ONE distributed pass
  * accumulates the d-vector coordinate sums and the d×d Gram matrix
  * per partition, combined in log depth (`treeAggregate` — d=64 means
  * 33 KB of state per task, independent of row count); the d×d
  * symmetric eigendecomposition runs on the DRIVER (cyclic Jacobi —
  * microseconds at d=64, fine to ~d=1000); the projection ships the
  * top-k basis back inside a per-row expression. The corpus is
  * scanned twice and never shuffled.
  */
object Embeddings {

  /** Principal-component basis of an embedding column.
    * Returns (mean, eigenvalues descending, eigenvectors as rows
    * matching the eigenvalue order) of the SAMPLE covariance
    * (n−1 denominator). `dim` must match the embedding width. */
  def pcaBasis(emb: DataFrame, dim: Int,
      embedCol: String = "embedding"): (Array[Double], Array[Double], Array[Array[Double]]) = {
    val rows = emb.select(col(embedCol)).na.drop()
      .rdd.map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // state: [n, sum_0..sum_{d-1}, gram upper triangle row-major]
    val triLen = dim * (dim + 1) / 2
    val zero = new Array[Double](1 + dim + triLen)
    def seqOp(acc: Array[Double], x: Array[Double]): Array[Double] = {
      require(x.length == dim,
        s"embedding width ${x.length} != declared dim $dim")
      acc(0) += 1.0
      var i = 0
      var t = 0
      while (i < dim) {
        acc(1 + i) += x(i)
        var j = i
        while (j < dim) {
          acc(1 + dim + t) += x(i) * x(j)
          t += 1; j += 1
        }
        i += 1
      }
      acc
    }
    def combOp(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    val acc = rows.treeAggregate(zero)(seqOp, combOp)
    val n = acc(0)
    require(n > 1, s"PCA needs at least 2 vectors, got ${n.toLong}")
    val mean = Array.tabulate(dim)(i => acc(1 + i) / n)
    // sample covariance C = (G − n·μμᵀ)/(n−1), symmetrized from the
    // accumulated upper triangle
    val c = Array.ofDim[Double](dim, dim)
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      val v = (acc(1 + dim + t) - n * mean(i) * mean(j)) / (n - 1.0)
      c(i)(j) = v; c(j)(i) = v
      t += 1
    }
    val (eigVals, eigVecs) = jacobiEig(c)
    (mean, eigVals, eigVecs)
  }

  /** Project the embedding column onto its top-k principal components:
    * appends `proj` (array<double>, length k) and, for monitoring,
    * the constant `explained` — the fraction of total variance the
    * kept components carry. The basis and mean ride into the per-row
    * expression as literals (same discipline as the IVF centroids);
    * the projection pass is a narrow scan. */
  def pcaProject(emb: DataFrame, k: Int, dim: Int,
      embedCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= dim, s"k=$k must be in [1, dim=$dim]")
    val (mean, eigVals, eigVecs) = pcaBasis(emb, dim, embedCol)
    val explained = eigVals.take(k).sum / math.max(eigVals.sum, 1e-300)
    val meanLit = array(mean.toIndexedSeq.map(lit): _*)
    val centered = zip_with(
      transform(col(embedCol), x => x.cast("double")), meanLit,
      (x, m) => x - m)
    // bind the centered vector once; each component is one fused dot
    val projCols = (0 until k).map { i =>
      graft.functions.VectorOps.dotProduct(col("__centered"),
        array(eigVecs(i).toIndexedSeq.map(lit): _*))
    }
    emb.withColumn("__centered", centered)
      .withColumn("proj", array(projCols: _*))
      .withColumn("explained", lit(explained))
      .drop("__centered")
  }

  /** Nearest-centroid assignment of the whole embedding corpus — the
    * corpus-scale half of document clustering (the trainer half is
    * `Similarity.kmeans` over a bounded sample, the posture every
    * quantizer in this repo uses). Centroids ride into a per-row
    * codegen'd expression as literals; assignment is |centroids|
    * fused dot products + an argmin — a narrow scan, zero shuffles,
    * no driver state beyond the centroid matrix itself.
    *
    * `metric`: "cosine" (argmax cosine) or "l2" (argmin Euclidean —
    * compared via c·c − 2·v·c, dropping the per-row ‖v‖² constant).
    * Ties break to the LOWEST centroid index in both metrics (the
    * engine-portable choice, matching ROW_NUMBER ORDER BY cid).
    * Zero-norm vectors under cosine coalesce to −2 (below any real
    * cosine) instead of NULL-poisoning the argmax.
    *
    * Returns (idCol, cluster_id) with cluster_id = 0-based centroid
    * index. */
  def assignToCentroids(emb: DataFrame, centroids: Array[Array[Double]],
      metric: String = "cosine", embedCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(metric == "cosine" || metric == "l2",
      s"metric must be cosine or l2, got $metric")
    val e = emb.select(col(idCol),
      transform(col(embedCol), x => x.cast("double")).as("__e"))
    def centLit(c: Array[Double]): Column = array(c.toIndexedSeq.map(lit): _*)
    // one "goodness" score per centroid, larger = better in both metrics
    val scores = centroids.toIndexedSeq.map { c =>
      if (metric == "cosine")
        coalesce(Similarity.cosine(col("__e"), centLit(c)), lit(-2.0d))
      else {
        val cc = c.map(x => x * x).sum
        graft.functions.VectorOps.dotProduct(col("__e"), centLit(c)) * 2.0d - lit(cc)
      }
    }
    // first-max-wins argmax: sort (−score, idx) structs, take the head
    // (the semanticNearDup cell-assignment discipline)
    e.withColumn("__s", array(scores: _*))
      .select(col(idCol),
        element_at(
          transform(
            array_sort(zip_with(col("__s"),
              sequence(lit(0), lit(centroids.length - 1)),
              (s, i) => struct((-s).as("ns"), i.as("i")))),
            x => x("i")),
          1).cast("long").as("cluster_id"))
  }

  /** End-to-end document clustering: train k centroids on a bounded
    * deterministic hash-sample (`Similarity.kmeans` — Lloyd over at
    * most `sampleSize` driver-side vectors, the IVF/SemDeDup trainer),
    * then assign the WHOLE corpus with `assignToCentroids`. The
    * sample bound is the 100 TB contract: driver memory is
    * sampleSize×d doubles regardless of corpus size, and the corpus
    * itself is touched by exactly one narrow assignment scan. */
  def clusterEmbeddings(emb: DataFrame, k: Int, metric: String = "l2",
      sampleSize: Int = 512, trainIters: Int = 8, seed: Long = 42L,
      embedCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sample = Similarity.trainingSample(
      emb.select(col(idCol),
        transform(col(embedCol), x => x.cast("double")).as("e")),
      idCol, "e", sampleSize, seed)
    require(sample.nonEmpty, "cannot cluster an empty corpus")
    // deterministic farthest-point init (the kmeans++ hard-max variant):
    // Lloyd from first-k init can land a split-cluster local optimum;
    // maximin seeding puts one seed per well-separated mode by
    // construction, and needs no RNG — same result on every run.
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
      s
    }
    val seeds = scala.collection.mutable.ArrayBuffer(sample.head)
    val minD = sample.map(v => d2(v, seeds.head))
    while (seeds.length < math.min(k, sample.length)) {
      val far = minD.indices.maxBy(minD)
      seeds += sample(far)
      var i = 0
      while (i < sample.length) {
        minD(i) = math.min(minD(i), d2(sample(i), sample(far))); i += 1
      }
    }
    // if k > |sample| pad by cycling (kmeans' own convention)
    val init = Array.tabulate(k)(i => seeds(i % seeds.length).clone())
    val centroids = Similarity.kmeans(sample, k, trainIters, seed, init)
    assignToCentroids(emb, centroids, metric, embedCol, idCol)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotates
    * away the largest off-diagonal elements until convergence.
    * Returns (eigenvalues descending, matching eigenvectors as rows).
    * O(d³) per sweep with ~log(ε) sweeps — driver-side math for
    * d ≲ 1000; the standard dense-symmetric recipe (Golub & Van Loan
    * §8.5). */
  private[pipeline] def jacobiEig(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < maxSweeps) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-300) {
        // symmetric Schur rotation zeroing a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val tSign = if (theta >= 0) 1.0 else -1.0
        val tTan = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val cCos = 1.0 / math.sqrt(tTan * tTan + 1.0)
        val s = tTan * cCos
        var i = 0
        while (i < d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = cCos * aip - s * aiq
          a(i)(q) = s * aip + cCos * aiq
          i += 1
        }
        i = 0
        while (i < d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = cCos * api - s * aqi
          a(q)(i) = s * api + cCos * aqi
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = cCos * vip - s * viq
          v(i)(q) = s * vip + cCos * viq
          i += 1
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map(i => Array.tabulate(d)(j => v(j)(i))).toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
