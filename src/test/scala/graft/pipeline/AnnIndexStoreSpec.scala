package graft.pipeline

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: load returns EXACTLY what save was given
  * (bit-equal codebooks, identical coded rows), serving from a loaded
  * index reproduces in-memory serving row-for-row, the loaded path is
  * a file scan of the index root (no retraining), and persisted extend
  * appends O(batch) while matching the in-memory extend contract. */
class AnnIndexStoreSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_annidx")
      .resolve("idx").toString

  private def emb: DataFrame = Tables.embeddings(spark, sf("sf0.001"))

  private def topkRows(df: DataFrame): Seq[(Long, Long, Int)] =
    df.select("qid", "nid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      .sortBy(x => (x._1, x._3))

  private def codedSet(df: DataFrame): Set[(Long, Seq[Double], Seq[Int])] =
    df.select("vec_id", "e", "code").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Int](2))).toSet

  test("PQ: save/load round-trips bit-exactly and serves identically, no retrain") {
    val root = tmpRoot()
    val fresh = Similarity.pqIndex(emb, m = 16, codebookSize = 16)
    AnnIndexStore.savePq(spark, root, fresh)
    val loaded = AnnIndexStore.loadPq(spark, root)

    // codebooks bit-equal (doubles round-trip parquet exactly)
    assert(loaded.books.length == fresh.books.length)
    for (j <- fresh.books.indices; c <- fresh.books(j).indices)
      assert(java.util.Arrays.equals(loaded.books(j)(c), fresh.books(j)(c)),
        s"codebook ($j,$c) drifted through persistence")
    // coded relation identical (codes stored, not re-derived)
    assert(codedSet(loaded.coded) == codedSet(fresh.coded))

    // serving equivalence: same topK rows from loaded vs fresh
    val servedFresh = topkRows(Similarity.pqTopK(emb, 10L, 5, m = 16,
      codebookSize = 16, refine = 8, prebuilt = Some(fresh)))
    val servedLoaded = topkRows(Similarity.pqTopK(emb, 10L, 5, m = 16,
      codebookSize = 16, refine = 8, prebuilt = Some(loaded)))
    assert(servedLoaded == servedFresh)

    // no-retrain plan audit: the loaded coded relation is a parquet
    // scan of the index root's commit dirs — serving never touches the
    // raw embeddings table or a training sample
    val plan = loaded.coded.queryExecution.executedPlan.toString
    assert(plan.contains("idx") && plan.toLowerCase.contains("parquet"),
      s"loaded path should scan the saved index files:\n$plan")
    assert(!plan.contains("embeddings.parquet"),
      "loaded index must not re-derive from the raw embeddings table")
  }

  test("IVF-PQ: save/load round-trips codebooks, centroids, cells; serves identically") {
    val root = tmpRoot()
    val fresh = Similarity.ivfPqIndex(emb, nCells = 16, m = 16, codebookSize = 16)
    AnnIndexStore.saveIvfPq(spark, root, fresh)
    val loaded = AnnIndexStore.loadIvfPq(spark, root)

    for (j <- fresh.books.indices; c <- fresh.books(j).indices)
      assert(java.util.Arrays.equals(loaded.books(j)(c), fresh.books(j)(c)))
    assert(loaded.centroids.length == fresh.centroids.length)
    for (c <- fresh.centroids.indices)
      assert(java.util.Arrays.equals(loaded.centroids(c), fresh.centroids(c)))
    val cells = (df: DataFrame) => df.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cells(loaded.coded) == cells(fresh.coded))

    val servedFresh = topkRows(Similarity.ivfPqTopK(emb, 10L, 5,
      nCells = 16, nprobe = 12, m = 16, codebookSize = 16, refine = 8,
      prebuilt = Some(fresh)))
    val servedLoaded = topkRows(Similarity.ivfPqTopK(emb, 10L, 5,
      nCells = 16, nprobe = 12, m = 16, codebookSize = 16, refine = 8,
      prebuilt = Some(loaded)))
    assert(servedLoaded == servedFresh)
  }

  test("graph: save/load round-trips the edge relation; serving matches") {
    val root = tmpRoot()
    val sub = emb.filter(col("vec_id") < 300)
    val g = GraphAnn.nnDescentGraph(sub, k = 8, iters = 2)
    AnnIndexStore.saveGraph(spark, root, g)
    val loaded = AnnIndexStore.loadGraph(spark, root)
    val edges = (df: DataFrame) => df.select("id", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges(loaded) == edges(g))
    val servedFresh = topkRows(GraphAnn.graphTopK(sub, 5L, 5, beam = 16,
      hops = 3, prebuilt = Some(g)))
    val servedLoaded = topkRows(GraphAnn.graphTopK(sub, 5L, 5, beam = 16,
      hops = 3, prebuilt = Some(loaded)))
    assert(servedLoaded == servedFresh)
  }

  test("extendPq: persisted extend == in-memory extend; append is O(batch)") {
    val root = tmpRoot()
    val a = emb.filter(col("vec_id") < 400L)
    val b = emb.filter(col("vec_id") >= 400L && col("vec_id") < 600L)
    val idxA = Similarity.pqIndex(a, m = 16, codebookSize = 16)
    AnnIndexStore.savePq(spark, root, idxA)
    val v1 = AnnIndexStore.extendPq(spark, root, b)
    assert(v1 == 1)
    // persisted extend matches the in-memory contract
    val mem = Similarity.pqIndexExtend(idxA, b)
    val loaded = AnnIndexStore.loadPq(spark, root)
    assert(codedSet(loaded.coded) == codedSet(mem.coded))
    // time travel: v0 still reads the pre-extend index
    assert(codedSet(AnnIndexStore.loadPq(spark, root, Some(0)).coded)
      == codedSet(idxA.coded))
    // O(batch): the appended version carries v0's commit dir and adds
    // exactly one new dir (no rewrite of existing data)
    val dirs0 = graft.sources.VersionedTable.dataDirs(spark, root, Some(0))
    val dirs1 = graft.sources.VersionedTable.dataDirs(spark, root, Some(1))
    assert(dirs1.toSet.intersect(dirs0.toSet) == dirs0.toSet)
    assert(dirs1.size == dirs0.size + 1)
  }

  test("extendIvfPq: persisted extend == in-memory extend, cells included") {
    val root = tmpRoot()
    val a = emb.filter(col("vec_id") < 400L)
    val b = emb.filter(col("vec_id") >= 400L && col("vec_id") < 600L)
    val idxA = Similarity.ivfPqIndex(a, nCells = 16, m = 16, codebookSize = 16)
    AnnIndexStore.saveIvfPq(spark, root, idxA)
    AnnIndexStore.extendIvfPq(spark, root, b)
    val mem = Similarity.ivfPqIndexExtend(idxA, b)
    val loaded = AnnIndexStore.loadIvfPq(spark, root)
    val full = (df: DataFrame) => df.select("vec_id", "e", "code", "cell")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1),
        r.getSeq[Int](2), r.getInt(3))).toSet
    assert(full(loaded.coded) == full(mem.coded))
  }

  test("save over an existing root is an atomic whole-index replacement") {
    val root = tmpRoot()
    val idx16 = Similarity.pqIndex(emb, m = 16, codebookSize = 16)
    AnnIndexStore.savePq(spark, root, idx16)
    // rebuild with different geometry — replaces atomically as v1
    val idx8 = Similarity.pqIndex(emb, m = 8, codebookSize = 16)
    val v = AnnIndexStore.savePq(spark, root, idx8)
    assert(v == 1)
    assert(AnnIndexStore.loadPq(spark, root).books.length == 8)
    // old generation still time-travelable until vacuum
    assert(AnnIndexStore.loadPq(spark, root, Some(0)).books.length == 16)
  }
}
