package graft.pipeline

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  import SparkSpec.session.implicits._

  test("cosine expression matches driver-side computation") {
    val df = Seq(
      (Array(1.0, 0.0, 2.0), Array(2.0, 1.0, 0.0)),
      (Array(1.0, 1.0, 1.0), Array(1.0, 1.0, 1.0)),
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(math.abs(got(0) - cos(Array(1.0, 0.0, 2.0), Array(2.0, 1.0, 0.0))) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("bruteForceTopK matches a full driver-side ranking") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val got = Similarity.bruteForceTopK(emb, maxQueryId = 5L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (0L until 5L).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (n, v) => (n, cos(vecs(q), v)) }
        .sortBy { case (n, c) => (-c, n) }
        .take(3).zipWithIndex
        .map { case ((n, _), i) => (q, n, i + 1) }
    }
    assert(got.sortBy(x => (x._1, x._3)).toSeq == expected.sortBy(x => (x._1, x._3)))
  }

  test("partial top-k heap prunes without changing the final result") {
    // covered implicitly by the bruteForce test (which uses the heap);
    // here: heap output contains the true top-k of each partition
    val emb = Tables.embeddings(spark, sf("sf0.001")).repartition(7)
    val a = Similarity.bruteForceTopK(emb, 3L, 5).collect().toSet
    val b = Similarity.bruteForceTopK(emb.repartition(2), 3L, 5).collect().toSet
    assert(a == b, "top-k must be partitioning-invariant")
  }

  test("lshTopK recall against brute force is usable") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val brute = Similarity.bruteForceTopK(emb, 20L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, 20L, 5, planes = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    // random embeddings are the worst case for hyperplane LSH (no
    // cluster structure); 8 tables of 4 planes should recover over
    // half the true neighbors (theory: 1-(1-p)^8, p=(1-θ/π)^4)
    assert(recall > 0.5, s"recall $recall")
    // and every LSH-returned neighbor shares the query's bucket by
    // construction — sanity: no query returns more than k
    assert(lsh.groupBy(_._1).forall(_._2.size <= 5))
  }

  test("ivfTopK: probe-list search recalls most true neighbors, ranks well-formed") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val brute = Similarity.bruteForceTopK(emb, 20L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, 20L, 5, nCells = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // probing 4 of 16 cells scores ~1/4 of the corpus; on unstructured
    // embeddings cell membership of true neighbors is near-random, so
    // recall ~ nprobe/nCells is the floor and locality lifts it
    val recall = (brute intersect ivf.map(x => (x._1, x._2)).toSet).size.toDouble / brute.size
    assert(recall > 0.25, s"recall $recall")
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // determinism: seeded sample + seeded kmeans -> same result
    val again = Similarity.ivfTopK(emb, 20L, 5, nCells = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(ivf.sortBy(x => (x._1, x._3)).toSeq == again.sortBy(x => (x._1, x._3)).toSeq)
  }

  test("kmeans quantizer: converges on separable clusters, deterministic") {
    val rng = new java.util.Random(1)
    val clusterA = Array.fill(50)(Array.tabulate(8)(j => 10.0 + rng.nextGaussian() * 0.1))
    val clusterB = Array.fill(50)(Array.tabulate(8)(j => -10.0 + rng.nextGaussian() * 0.1))
    val cs = Similarity.kmeans(clusterA ++ clusterB, kCells = 2, iters = 10, seed = 42)
    val means = cs.map(_.sum / 8.0).sorted
    assert(math.abs(means(0) + 10.0) < 0.5 && math.abs(means(1) - 10.0) < 0.5,
      s"centroid means ${means.toSeq}")
  }

  test("lshTopK returns subset-consistent ranks") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val r = Similarity.lshTopK(emb, maxQueryId = 5L, k = 3).collect()
    // ranks well-formed per query
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rns = rows.map(_.getInt(2)).sorted
      assert(rns.zipWithIndex.forall { case (rn, i) => rn == i + 1 })
    }
    // every LSH neighbor's cosine is a real (query, neighbor) pair —
    // same bucket implies scored, so rn ordering is internally exact
    assert(r.nonEmpty)
  }

  test("pqTopK: ADC ranking recalls true neighbors on real embeddings") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val brute = Similarity.bruteForceTopK(emb, 20L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, 20L, 5, m = 16, codebookSize = 16,
        refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    // unstructured 64-d embeddings are PQ's worst case (quantization
    // noise ~ signal); 16 subspaces + an 8k-deep exact refine must
    // still recover well over half — deterministic seed, not flaky
    assert(recall > 0.6, s"recall $recall")
    assert(pq.groupBy(_._1).forall(_._2.size <= 5))
  }

  test("pqTopK: clustered vectors rank near-exactly through 8-byte codes") {
    // 3 well-separated directions, 20 vectors each: quantization
    // centers ON the clusters, so ADC ranking ~= exact ranking
    val rng = new scala.util.Random(11)
    val bases = Seq(
      Array.tabulate(64)(i => if (i < 21) 1f else 0f),
      Array.tabulate(64)(i => if (i >= 21 && i < 42) 1f else 0f),
      Array.tabulate(64)(i => if (i >= 42) 1f else 0f))
    val vecs = for {
      (b, c) <- bases.zipWithIndex; i <- 0 until 20
    } yield ((c * 20 + i).toLong,
      b.map(x => x + (rng.nextFloat() - 0.5f) * 0.05f).toSeq)
    val emb = vecs.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, 10L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, 10L, 5, m = 8, codebookSize = 8,
      sampleSize = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every returned neighbor must come from the query's own cluster
    assert(pq.forall { case (q, n) => q / 20 === n / 20 }, pq.toString)
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"clustered recall $recall")
  }

  test("ivfPqTopK: cell-bounded compressed scan still recalls true neighbors") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val brute = Similarity.bruteForceTopK(emb, 20L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqTopK(emb, 20L, 5, nCells = 16, nprobe = 8,
        m = 16, codebookSize = 16, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    // two approximations stack (cell miss + code noise); half the
    // cells probed + deep refine must still recover > half on the
    // unstructured worst case — deterministic seeds, not flaky
    assert(recall > 0.5, s"recall $recall")
    assert(got.groupBy(_._1).forall(_._2.size <= 5))
    // IVF-PQ candidates are a subset of PQ's full-scan candidates
    // at the same code setting: probing can only REMOVE candidates
    val pqFull = Similarity.pqTopK(emb, 20L, 5, m = 16,
      codebookSize = 16, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecallVsPq = (pqFull intersect got).size.toDouble / pqFull.size
    assert(ivfRecallVsPq > 0.4, s"vs full-scan PQ: $ivfRecallVsPq")
  }

  test("prebuilt PQ / IVF-PQ indexes serve identical results to a fresh build") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pqIdx = Similarity.pqIndex(emb, m = 16, codebookSize = 16)
    assert(rows(Similarity.pqTopK(emb, 10L, 5, m = 16, codebookSize = 16,
        refine = 8, prebuilt = Some(pqIdx))) ==
      rows(Similarity.pqTopK(emb, 10L, 5, m = 16, codebookSize = 16,
        refine = 8)))
    val ivfIdx = Similarity.ivfPqIndex(emb, nCells = 8, m = 16,
      codebookSize = 16)
    assert(rows(Similarity.ivfPqTopK(emb, 10L, 5, nCells = 8, nprobe = 6,
        m = 16, codebookSize = 16, refine = 8, prebuilt = Some(ivfIdx))) ==
      rows(Similarity.ivfPqTopK(emb, 10L, 5, nCells = 8, nprobe = 6,
        m = 16, codebookSize = 16, refine = 8)))
    // serving against the prebuilt index must not re-train: the plan
    // over the cached coded relation is a scan, not a fresh coding
    val served = Similarity.pqTopK(emb, 10L, 5, m = 16,
      codebookSize = 16, refine = 8, prebuilt = Some(pqIdx))
    assert(!served.queryExecution.optimizedPlan.toString
      .contains("array_position"),
      "prebuilt path must reuse codes, not re-assign them")
  }

  test("pqIndexExtend: incremental batches == building on the union with the same codebooks") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val a = emb.filter(col("vec_id") < 150L)
    val b = emb.filter(col("vec_id") >= 150L)
    // train on A only, then absorb B incrementally
    val idxA = Similarity.pqIndex(a, m = 16, codebookSize = 16)
    val extended = Similarity.pqIndexExtend(idxA, b)
    // codebooks are untouched by extension (old codes stay comparable)
    assert(extended.books eq idxA.books)
    // the extended coded relation equals encoding the union against
    // A's codebooks: every A row identical, every B row coded by A's
    // books deterministically — serving results prove it end to end
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaExtend = rows(Similarity.pqTopK(emb, 10L, 5, m = 16,
      codebookSize = 16, refine = 8, prebuilt = Some(extended)))
    // one-shot extension == two-batch extension (order-insensitive)
    val twoStep = Similarity.pqIndexExtend(
      Similarity.pqIndexExtend(idxA, b.filter(col("vec_id") < 300L)),
      b.filter(col("vec_id") >= 300L))
    assert(viaExtend == rows(Similarity.pqTopK(emb, 10L, 5, m = 16,
      codebookSize = 16, refine = 8, prebuilt = Some(twoStep))))
    // the extended index covers the full corpus: results may differ
    // from an A-only index (B vectors are now candidates)
    assert(rows(Similarity.pqTopK(a, 10L, 5, m = 16, codebookSize = 16,
      refine = 8, prebuilt = Some(idxA))) != viaExtend)
  }

  test("ivfPqIndexExtend: fixed quantizers absorb a batch; serving covers it") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val a = emb.filter(col("vec_id") < 150L)
    val b = emb.filter(col("vec_id") >= 150L)
    val idxA = Similarity.ivfPqIndex(a, nCells = 8, m = 16, codebookSize = 16)
    val ext = Similarity.ivfPqIndexExtend(idxA, b)
    assert((ext.books eq idxA.books) && (ext.centroids eq idxA.centroids))
    // extension is a partition: A rows untouched, every B row coded
    // and cell-assigned exactly once
    assert(ext.coded.count() == idxA.coded.count() + b.count())
    assert(ext.coded.filter(col("cell").isNull || col("code").isNull)
      .count() == 0L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val served = rows(Similarity.ivfPqTopK(emb, 10L, 5, nCells = 8,
      nprobe = 8, m = 16, codebookSize = 16, refine = 8,
      prebuilt = Some(ext)))
    // at nprobe == nCells the scan is exhaustive over the extended
    // corpus: results must equal the full-scan PQ with the same books
    assert(served == rows(Similarity.pqTopK(emb, 10L, 5, m = 16,
      codebookSize = 16, refine = 8,
      prebuilt = Some(Similarity.PqIndex(
        ext.coded.drop("cell"), ext.books)))))
  }

  test("pqDriftAudit: identical and on-distribution batches ride ~1x; " +
      "a planted geometry shift trips the rebuild flag") {
    val rng = new scala.util.Random(13)
    val bases = Seq(
      Array.tabulate(64)(i => if (i < 21) 1f else 0f),
      Array.tabulate(64)(i => if (i >= 21 && i < 42) 1f else 0f),
      Array.tabulate(64)(i => if (i >= 42) 1f else 0f))
    def draws(r: scala.util.Random, offset: Int, per: Int) = for {
      (b, c) <- bases.zipWithIndex; i <- 0 until per
    } yield ((offset + c * per + i).toLong,
      b.map(x => x + (r.nextFloat() - 0.5f) * 0.05f).toSeq)
    val emb = draws(rng, 0, 20).toDF("vec_id", "embedding")
    val idx = Similarity.pqIndex(emb, m = 8, codebookSize = 8,
      sampleSize = 60)
    // batch == corpus: same codes, same per-row errors — ratio 1
    // (up to summation-order ulps), no rebuild
    val same = Similarity.pqDriftAudit(idx, emb,
      rebuildThreshold = 2.0).collect().head
    assert(math.abs(same.getAs[Double]("drift_ratio") - 1.0) < 1e-9)
    assert(same.getAs[Long]("rebuild") == 0L)
    assert(same.getAs[Long]("n_corpus") == 60L &&
      same.getAs[Long]("n_batch") == 60L)
    // fresh draws from the training distribution: codebooks still fit
    val fresh = draws(new scala.util.Random(99), 1000, 10)
      .toDF("vec_id", "embedding")
    val on = Similarity.pqDriftAudit(idx, fresh,
      rebuildThreshold = 2.0).collect().head
    assert(on.getAs[Double]("drift_ratio") < 2.0,
      s"on-distribution ratio ${on.getAs[Double]("drift_ratio")}")
    assert(on.getAs[Long]("rebuild") == 0L)
    // planted shift: dense uniform directions none of the trained
    // centroids fit — error jumps, rebuild recommended
    val rng2 = new scala.util.Random(7)
    val shifted = (0 until 30).map(i => ((2000 + i).toLong,
      Array.fill(64)(rng2.nextFloat()).toSeq)).toDF("vec_id", "embedding")
    val off = Similarity.pqDriftAudit(idx, shifted,
      rebuildThreshold = 1.5).collect().head
    assert(off.getAs[Double]("batch_mse") > on.getAs[Double]("batch_mse"))
    assert(off.getAs[Double]("drift_ratio") > 1.5,
      s"shifted ratio ${off.getAs[Double]("drift_ratio")}")
    assert(off.getAs[Long]("rebuild") == 1L)
    // threshold is honored in both directions on the same batch
    val lax = Similarity.pqDriftAudit(idx, shifted,
      rebuildThreshold = off.getAs[Double]("drift_ratio") + 1.0)
      .collect().head
    assert(lax.getAs[Long]("rebuild") == 0L)
  }
}
