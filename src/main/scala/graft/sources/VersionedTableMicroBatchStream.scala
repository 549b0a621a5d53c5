package graft.sources

import java.util.{Map => JMap, Set => JSet}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 MICRO-BATCH implementation of the versioned-table
  * streaming source — the durable spelling of
  * [[VersionedTableStreamSource]] on the PUBLIC
  * `connector.read.streaming.MicroBatchStream` seam (the migration
  * the v1 pin spec's failure messages prescribe, executed while the
  * seams were still green).
  *
  * Semantics are identical to the v1 source, which remains as the
  * engine-selected fallback: offsets ARE version numbers
  * ([[VersionOffset]] serializes to the bare integer, so a
  * checkpoint written by the v1 source restarts cleanly under this
  * one and vice versa), the initial batch `(-1, v]` is the snapshot
  * at `v`, every later batch reads exactly the commit dirs its
  * version range ADDED — O(delta) resolved from the manifests — and
  * a rewrite inside a streamed range fails the query loudly.
  *
  * Scanning stays delegated: each batch plans its partitions through
  * a fresh `ParquetScan` over the delta dirs, so execution is
  * Spark's own vectorized parquet read with its normal split/coalesce
  * sizing. The reader factory is path-independent (it captures
  * schema + conf, not a file list), so one factory built at stream
  * start serves every batch's partitions.
  */
class VersionedTableMicroBatchStream(spark: SparkSession, root: String,
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private def version(o: Offset): Int = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toInt
  }

  override def latestOffset(): Offset =
    VersionOffset(VersionedTable.latestVersion(spark, root))

  override def initialOffset(): Offset = VersionOffset(-1)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toInt)

  private def deltaPaths(from: Int, to: Int): Seq[String] = {
    if (from < 0)
      return VersionedTable.dataDirs(spark, root, Some(to))
    val fromDirs = VersionedTable.dataDirs(spark, root, Some(from))
      .map(d => new Path(d).getName).toSet
    val toDirs = VersionedTable.dataDirs(spark, root, Some(to))
      .map(d => new Path(d).getName)
    require(fromDirs.subsetOf(toDirs.toSet),
      s"versions ($from, $to] of $root contain a rewrite " +
        "(merge/compact/optimize) — the streaming source only tails " +
        "APPENDS; use VersionedTable.changesBetween for rewrite deltas")
    toDirs.filterNot(fromDirs)
      .map(d => new Path(new Path(root, "data"), d).toString)
  }

  private def scanOver(paths: Seq[String]) =
    ParquetTable(s"graft-versioned-stream $root", spark, options, paths,
      userSpecifiedSchema = Some(tableSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(options).build()
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = version(start)
    val to = version(end)
    if (to < 0 || to == from) Array.empty
    else scanOver(deltaPaths(from, to)).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // path-independent: built over no files, reads any batch's
    // FilePartitions (same schema, same conf)
    scanOver(Seq.empty).createReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Version number as a streaming offset; `json` is the bare integer,
  * byte-compatible with the v1 source's LongOffset checkpoints. */
case class VersionOffset(v: Int) extends Offset {
  override def json: String = v.toString
}

/** The table handed to the engine by the provider's TableProvider
  * half: capabilities say MICRO_BATCH_READ, the scan builder returns
  * a [[VersionedTableMicroBatchStream]]. */
class VersionedStreamTable(spark: SparkSession, root: String,
    tableSchema: StructType) extends Table with SupportsRead {

  override def name(): String = s"graft-versioned-stream $root"

  override def schema(): StructType = tableSchema

  override def capabilities(): JSet[TableCapability] =
    java.util.Collections.singleton(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new VersionedTableMicroBatchStream(spark, root, tableSchema, options)
      }
    }
}
