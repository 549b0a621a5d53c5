package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface of the engine (SURVEY §2.1 op 13 modernized).
  * The reference's only format was uncompressed SequenceFiles, one dir
  * per generation; a Spark-native library standardizes on columnar
  * parquet/orc plus row formats (csv/json) for interchange, with the
  * two layout levers that matter at 100 TB:
  *
  *  - `partitionBy` (hive-style directory partitioning) → partition
  *    PRUNING: a filter on the partition column skips whole
  *    directories at planning time;
  *  - bucketed tables (`writeBucketed`) → co-located joins: two
  *    tables bucketed by the same key and count sort-merge-join with
  *    NO exchange on either side — the reference's "shuffle once,
  *    reuse forever" pattern it never had.
  */
object Io {

  /** Formats the engine reads/writes. */
  val formats: Seq[String] = Seq("parquet", "orc", "csv", "json")

  def write(df: DataFrame, path: String, format: String = "parquet",
      partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    require(formats.contains(format), s"unsupported format $format")
    val w: DataFrameWriter[Row] = df.write.format(format).mode(mode)
      .option("header", "true") // no-op outside csv
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  def read(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[StructType] = None): DataFrame = {
    require(formats.contains(format), s"unsupported format $format")
    val r = spark.read.format(format)
      .option("header", "true").option("inferSchema", schema.isEmpty)
    schema.fold(r)(r.schema).load(path)
  }

  /** Persist as a bucketed managed table: pre-shuffled on `bucketCol`
    * into `buckets` files per partition, so joins/aggregations on that
    * key skip their exchange entirely.
    *
    * Idempotent across sessions: a managed table's warehouse directory
    * outlives the in-memory catalog that created it, and a fresh
    * session's `saveAsTable` refuses to adopt the stray location
    * (LOCATION_ALREADY_EXISTS) — so drop any registered table AND
    * clear a leftover location before writing. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(w.sortBy(_)).saveAsTable(table)
  }

  /** (table → build tag) of bucketed tables already built in this JVM
    * — see ensureBucketed. */
  private val bucketedBuilt =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Build a bucketed table ONCE per (table, tag) per JVM — the setup
    * half of the "shuffle once, reuse forever" layout lever, split
    * from the queries that consume it so a benchmark of a bucketed
    * JOIN times the join, not two table writes per run (the round-8
    * q30 lesson: its bench row was dominated by in-row writes and
    * jittered with file I/O). `tag` scopes the cache to the data that
    * built the table (source dir + Spark application), so a different
    * SF dir or a fresh session rebuilds instead of reading stale
    * buckets. `df` is by-name: a skipped build never constructs the
    * frame. The registry is cross-checked against the session catalog
    * — anyone may DROP the table between calls (tests do) and a stale
    * "already built" entry must rebuild, not serve a missing table. */
  def ensureBucketed(spark: SparkSession, df: => DataFrame, table: String,
      tag: String, bucketCol: String, buckets: Int,
      sortCol: Option[String] = None): Unit = {
    def current = bucketedBuilt.get(table).contains(tag) &&
      spark.catalog.tableExists(table)
    if (!current) synchronized {
      if (!current) {
        writeBucketed(df, table, bucketCol, buckets, sortCol)
        bucketedBuilt(table) = tag
      }
    }
  }

  /** Compact a parquet directory to ~`targetBytes` per output file —
    * the small-files housekeeping every long-lived 100 TB table needs
    * (streaming sinks and fine-grained partitions accrete kilobyte
    * files; each costs a task + a footer read forever after).
    *
    * Hive-partitioned layouts (`col=value` subdirectories) are
    * compacted leaf by leaf — each partition directory is rewritten
    * IN PLACE, so the directory structure, and with it planning-time
    * partition pruning, survives compaction; sizing uses each leaf's
    * own bytes, never the (empty) top level. Leaves compact
    * independently, so a crash mid-run leaves every leaf either fully
    * old or fully new.
    *
    * Each leaf rewrites into max(1, ⌈leafBytes/targetBytes⌉) files via
    * coalesce (no shuffle — coalesce only merges read splits) and
    * swaps directories only after the rewrite commits. The swap is two
    * renames — CRASH-SAFE but not atomic: a crash between them leaves
    * the leaf path absent with the data intact under
    * `<leaf>._compact_old` (recover by renaming it back), and a
    * concurrent reader can catch the gap between the renames — run
    * compaction when the table has no readers. Returns the total
    * output file count. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val children = fs.listStatus(hp)
      .filterNot(_.getPath.getName.startsWith("_"))
      .filterNot(_.getPath.getName.startsWith("."))
    val parts = children.filter(s =>
      s.isDirectory && s.getPath.getName.contains("="))
    if (parts.nonEmpty) {
      // hive-partitioned: recurse (handles multi-level partitioning),
      // leaving the col=value directory skeleton untouched
      parts.map(p => compact(spark, p.getPath.toString, targetBytes)).sum
    } else {
      val dataBytes = children.filter(_.isFile).map(_.getLen).sum
      val nFiles = math.max(1L, (dataBytes + targetBytes - 1) / targetBytes).toInt
      val tmp = new org.apache.hadoop.fs.Path(path + "._compact_tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      spark.read.parquet(path).coalesce(nFiles)
        .write.mode("overwrite").parquet(tmp.toString)
      val old = new org.apache.hadoop.fs.Path(path + "._compact_old")
      if (fs.exists(old)) fs.delete(old, true)
      require(fs.rename(hp, old), s"could not move $path aside")
      require(fs.rename(tmp, hp), s"could not move compacted dir into $path")
      fs.delete(old, true)
      nFiles
    }
  }
}
