package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.VersionedTable
import Similarity.{IvfPqIndex, PqIndex}

/** Persistence for the ANN serving artifacts ([[Similarity.PqIndex]],
  * [[Similarity.IvfPqIndex]], [[GraphAnn]]'s k-NN graph) through the
  * [[graft.sources.VersionedTable]] log-structured format — the
  * missing half of the offline-build/online-serve split: the in-memory
  * index caches die with the application, so without this every fresh
  * application re-trains quantizers and re-codes the corpus before it
  * can serve a single query. At 100 TB the coding pass is a full
  * corpus scan; the index MUST be a durable artifact that a serving
  * application opens, not rebuilds (the FAISS on-disk index, done
  * relationally).
  *
  * Layout: ONE VersionedTable root per index, holding coded rows and
  * quantizer metadata (codebooks, coarse centroids) in a single
  * unified relation discriminated by `kind`:
  * {{{
  *   kind="coded"     vec_id, e,  code, cell?          (the corpus)
  *   kind="book"      j (subspace), c (centroid), cvec (codebook entry)
  *   kind="centroid"  c (cell), cvec                   (IVF-PQ only)
  * }}}
  * One table → ONE manifest rename covers data AND metadata, so a
  * reader can never observe new codes under old codebooks (two
  * separate tables would need cross-table transactions the format
  * deliberately doesn't have). Time travel gives consistent
  * (codebooks, codes) pairs at every version; `vacuum` ages old index
  * generations out; a rebuild is a `save` over the same root — an
  * atomic whole-index replacement readers see all-or-nothing.
  *
  * Incremental ingest ([[extendPq]]/[[extendIvfPq]]) is
  * `VersionedTable.append` of ONLY the new batch's coded rows,
  * encoded against the stored codebooks — O(batch) I/O, the
  * [[Similarity.pqIndexExtend]] contract made durable. Codebooks are
  * append-time invariants: the unified schema carries them in the
  * carried-over commit dirs untouched, so old and new codes stay
  * comparable by construction.
  *
  * Fidelity: codes and vectors are STORED, not re-derived — doubles
  * and ints round-trip parquet bit-exactly, so `load` returns exactly
  * the index `save` was given (AnnIndexStoreSpec asserts bit-equal
  * codebooks, identical coded rows, and identical served top-k).
  * The loaded `coded` relation is a plain parquet scan of the saved
  * commit dirs — serving needs NO sample collection, NO k-means, and
  * no localCheckpoint (the files are the materialization; the spec's
  * no-retrain audit pins the loaded plan to a file scan of the index
  * root).
  */
object AnnIndexStore {

  // ---- unified row schema (PQ / IVF-PQ) ----

  private val schema = StructType(Seq(
    StructField("kind", StringType),
    StructField("vec_id", LongType),
    StructField("e", ArrayType(DoubleType)),
    StructField("code", ArrayType(IntegerType)),
    StructField("cell", IntegerType),
    StructField("j", IntegerType),
    StructField("c", IntegerType),
    StructField("cvec", ArrayType(DoubleType))))

  private def codedRows(coded: DataFrame, hasCell: Boolean): DataFrame =
    coded.select(lit("coded").as("kind"),
      col("vec_id"), col("e"), col("code"),
      (if (hasCell) col("cell") else lit(null)).cast("int").as("cell"),
      lit(null).cast("int").as("j"), lit(null).cast("int").as("c"),
      lit(null).cast("array<double>").as("cvec"))

  private def metaRows(spark: SparkSession, kind: String,
      vecs: Seq[(Int, Int, Array[Double])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map { case (j, c, v) =>
        Row(kind, null, null, null, null, j, c, v.toSeq) }, 1),
      schema)

  private def bookRows(spark: SparkSession,
      books: Array[Array[Array[Double]]]): DataFrame =
    metaRows(spark, "book", for {
      j <- books.indices
      c <- books(j).indices
    } yield (j, c, books(j)(c)))

  private def centroidRows(spark: SparkSession,
      centroids: Array[Array[Double]]): DataFrame =
    metaRows(spark, "centroid", centroids.indices.map(c => (0, c, centroids(c))))

  /** Commit `rows` as the next version of `root` (or v0 if the table
    * is new) — a save over an existing index is an atomic whole-index
    * replacement (rebuild absorbing drift), never an in-place edit. */
  private def saveRows(spark: SparkSession, root: String,
      rows: DataFrame): Int = {
    val latest = VersionedTable.latestVersion(spark, root)
    if (latest < 0) VersionedTable.init(spark, root, rows)
    else VersionedTable.commit(spark, root, rows, expectedVersion = latest)
  }

  /** Collect the bounded metadata rows of `kind` back into the nested
    * array shape the quantizers use (m·codebookSize rows — the same
    * driver-side budget training itself has). */
  private def collectMeta(df: DataFrame, kind: String): Array[Array[Array[Double]]] = {
    val rows = df.filter(col("kind") === kind)
      .select(col("j"), col("c"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"no '$kind' metadata rows — not a saved index?")
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
      g.sortBy(_._2).map(_._3)
    }.toArray
  }

  private def loadedCoded(df: DataFrame, withCell: Boolean): DataFrame = {
    val base = df.filter(col("kind") === "coded")
    if (withCell) base.select("vec_id", "e", "code", "cell")
    else base.select("vec_id", "e", "code")
  }

  // ---- PQ ----

  def savePq(spark: SparkSession, root: String, idx: PqIndex): Int =
    saveRows(spark, root,
      codedRows(idx.coded, hasCell = false)
        .unionByName(bookRows(spark, idx.books)))

  def loadPq(spark: SparkSession, root: String,
      version: Option[Int] = None): PqIndex = {
    val df = VersionedTable.read(spark, root, version)
    PqIndex(loadedCoded(df, withCell = false), collectMeta(df, "book"))
  }

  /** Append a new embedding batch to the PERSISTED index: encode
    * against the stored codebooks (loaded once, driver-side — they are
    * m·codebookSize vectors), append only the batch's coded rows.
    * O(batch) I/O; optimistic like every commit (a concurrent extend
    * loses the manifest rename and throws — reload and retry).
    * Returns the new version. */
  def extendPq(spark: SparkSession, root: String, newEmb: DataFrame): Int = {
    val base = VersionedTable.latestVersion(spark, root)
    val idx = loadPq(spark, root, Some(base))
    VersionedTable.append(spark, root,
      codedRows(Similarity.pqEncodeBatch(newEmb, idx.books), hasCell = false),
      expectedVersion = base)
  }

  // ---- IVF-PQ ----

  def saveIvfPq(spark: SparkSession, root: String, idx: IvfPqIndex): Int =
    saveRows(spark, root,
      codedRows(idx.coded, hasCell = true)
        .unionByName(bookRows(spark, idx.books))
        .unionByName(centroidRows(spark, idx.centroids)))

  def loadIvfPq(spark: SparkSession, root: String,
      version: Option[Int] = None): IvfPqIndex = {
    val df = VersionedTable.read(spark, root, version)
    IvfPqIndex(loadedCoded(df, withCell = true),
      collectMeta(df, "book"),
      collectMeta(df, "centroid").flatten)
  }

  /** [[extendPq]] with the coarse quantizer included: encode +
    * cell-assign the batch against the stored codebooks AND centroids,
    * append only the batch. */
  def extendIvfPq(spark: SparkSession, root: String,
      newEmb: DataFrame): Int = {
    val base = VersionedTable.latestVersion(spark, root)
    val idx = loadIvfPq(spark, root, Some(base))
    VersionedTable.append(spark, root,
      codedRows(Similarity.cellAssign(
          Similarity.pqEncodeBatch(newEmb, idx.books), idx.centroids),
          hasCell = true),
      expectedVersion = base)
  }

  // ---- k-NN graph (GraphAnn) ----

  /** The graph is a plain edge relation (id, nid, cos) — no quantizer
    * metadata, so it persists as-is (its own schema, its own root).
    * The DIRECTED NN-Descent output is the canonical artifact (n·k
    * rows); serving symmetrizes via [[GraphAnn.undirected]] once per
    * opened index, exactly as the in-memory cache does. */
  def saveGraph(spark: SparkSession, root: String, graph: DataFrame): Int =
    saveRows(spark, root, graph.select("id", "nid", "cos"))

  def loadGraph(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    VersionedTable.read(spark, root, version)
}
