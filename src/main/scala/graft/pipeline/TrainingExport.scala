package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pipeline's LAST mile: hand the curated, packed corpus to a
  * trainer's data loader as `shards` self-describing shard directories
  * plus a manifest the loader trusts instead of listing files.
  *
  * Layout:
  * {{{
  *   <out>/data/shard=<s>/part-*.parquet   (doc_id, seq_idx, n_tokens, text)
  *   <out>/_manifest.json                  one JSON line per shard
  * }}}
  *
  * Scale shape: ONE pass over the corpus — the Lehmer shard hash and
  * token counts are scan-level projections ([[TextAnalysis.packSequences]]'
  * per-shard prefix-sum window is the only exchange), and
  * `partitionBy("shard")` writes every shard dir in the same job. The
  * manifest aggregate is one partial+final pass collapsing to
  * `shards` rows (driver-bounded by construction). The manifest is
  * written AFTER the data — its presence is the commit point, the
  * VersionedTable discipline — so a loader never reads a half-written
  * export. Re-export = rewrite to a fresh dir; shards are immutable.
  *
  * A loader reading one shard ([[readShard]]) touches exactly that
  * shard's directory (Hive partition pruning on `shard=`), so N data-
  * loader workers each scan 1/N of the bytes with no coordination.
  */
object TrainingExport {

  /** Pack `docs` and write the sharded export; returns the manifest
    * (shard, n_docs, n_seqs, n_tokens, sum_doc_id) read back from the
    * committed file. `sum_doc_id` is the order-independent content
    * identity the loader can cheaply re-verify per shard. */
  def writeShards(docs: DataFrame, outDir: String,
      budget: Int, shards: Int): DataFrame =
    writePacked(
      TextAnalysis.packSequences(docs, budget, shards)
        .join(docs.select(col("doc_id"), col("text")), "doc_id"),
      outDir)

  /** Export rows that are ALREADY packed — the composition entry for
    * a curated corpus whose packing happened upstream (e.g.
    * [[Curation.e2e]] output joined back to its cleaned text), so the
    * pack is never paid twice. Requires columns
    * (doc_id, shard, seq_idx, n_tokens, text); extra columns ride
    * along into the shard files as loader-visible metadata. */
  def writePacked(rows: DataFrame, outDir: String): DataFrame = {
    val spark = rows.sparkSession
    val needed = Seq("doc_id", "shard", "seq_idx", "n_tokens", "text")
    val missing = needed.filterNot(rows.columns.contains)
    require(missing.isEmpty,
      s"writePacked needs columns ${needed.mkString(",")}; missing: " +
        missing.mkString(","))
    rows.write.partitionBy("shard").parquet(s"$outDir/data")
    // manifest describes the DURABLE bytes: re-read what landed (one
    // cheap scan of the export, never a recompute of the pack). The
    // explicit schema keeps the read lazy-safe for a legitimately
    // EMPTY corpus (no files to infer from → zero-row manifest).
    val manifest = spark.read.schema(rows.schema)
      .parquet(s"$outDir/data")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("seq_idx")).as("n_seqs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("doc_id")).as("sum_doc_id"))
      .orderBy("shard")
    // shards rows — driver-bounded; land as one atomic manifest file
    val lines = manifest.toJSON.collect().mkString("", "\n", "\n")
    val mpath = new Path(outDir, "_manifest.json")
    val fs = mpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(outDir, s".tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(lines.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, mpath)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"export already committed at $outDir")
    }
    readManifest(spark, outDir)
  }

  /** The committed manifest (fails loudly on an uncommitted export). */
  def readManifest(spark: SparkSession, outDir: String): DataFrame = {
    val mpath = new Path(outDir, "_manifest.json")
    val fs = mpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(mpath),
      s"no committed export at $outDir — _manifest.json is the commit point")
    // driver-side read: the manifest is `shards` rows by construction,
    // and Spark's file readers skip underscore-prefixed paths anyway
    val in = fs.open(mpath)
    val text =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    import spark.implicits._
    import org.apache.spark.sql.types._
    // explicit schema: a zero-shard manifest (empty corpus) must still
    // round-trip, and the gate hash needs stable BIGINT columns
    val manifestSchema = StructType(Seq("shard", "n_docs", "n_seqs",
      "n_tokens", "sum_doc_id").map(StructField(_, LongType)))
    spark.read.schema(manifestSchema)
      .json(text.linesIterator.filter(_.nonEmpty).toSeq.toDS())
      .select(col("shard"), col("n_docs"), col("n_seqs"),
        col("n_tokens"), col("sum_doc_id"))
      .orderBy("shard")
  }

  /** One shard's rows, pruned to its directory by the partition
    * predicate — the loader-worker read path. */
  def readShard(spark: SparkSession, outDir: String, shard: Int): DataFrame = {
    val declared = readManifest(spark, outDir) // commit check
      .filter(col("shard") === shard.toLong).count()
    require(declared > 0,
      s"shard $shard is not in $outDir's manifest — nothing to read")
    spark.read.parquet(s"$outDir/data").filter(col("shard") === shard)
  }
}
