package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Storage-partitioned-join scan over a bucket-pinned versioned table:
  * delegates ALL I/O machinery to Spark's own `ParquetScan` (pushdown,
  * split planning, the vectorized reader — nothing re-implemented) and
  * changes exactly two things:
  *
  *  1. partitions REGROUP by bucket id — every `part-NNNNN-` file the
  *     bucketing write path produced carries its bucket in its name
  *     (shuffle-partition index == `pmod(murmur3(key,42), n)`, see
  *     [[graft.sources.GraftBucket]]), so files of bucket k across ALL
  *     commit dirs fold into ONE `InputPartition` exposing
  *     `HasPartitionKey` = k — exactly n partitions, empty buckets
  *     included (a missing value on one join side would otherwise need
  *     the push-part-values dance);
  *  2. the scan reports `KeyGroupedPartitioning(bucket(n, key), n)`,
  *     which Spark resolves through the catalog's `FunctionCatalog`
  *     and — when both join sides report the SAME bound function and
  *     bucket count — plans the join with NO shuffle exchange
  *     (`spark.sql.sources.v2.bucketing.enabled`; Iceberg's
  *     storage-partitioned-join mechanism).
  *
  * At 100 TB the join shuffle is the dominant cost of any fact-fact
  * join; co-bucketing the tables at write time converts it into a
  * per-bucket merge — this scan is what makes that conversion provable
  * to the planner rather than a promise in a runbook.
  *
  * The scan only exists when the snapshot is PROVABLY bucketed (every
  * non-empty dir `#bucketed:`-marked — the caller checks); a file
  * whose name doesn't parse as a bucket is therefore an invariant
  * violation and fails loudly rather than mis-grouping rows.
  */
/** A snapshot's provable bucket layout: the pinned key and count,
  * plus whether per-partition KEY ORDER is also provable (every dir
  * `#sorted:`-marked and no bucket concatenates two data files —
  * concatenation would break the order sortWithinPartitions wrote). */
case class BucketLayout(key: String, n: Int, sorted: Boolean)

private[graft] class BucketedDelegatingScan(spark: SparkSession,
    root: String, options: CaseInsensitiveStringMap, delegate: Scan,
    key: String, n: Int, streamable: Boolean)
    extends Scan with SupportsReportPartitioning {

  override def readSchema() = delegate.readSchema()

  override def description(): String =
    s"graft-bucketed(n=$n, key=$key) ${delegate.description()}"

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.bucket(n, key)), n)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val planned = delegate.toBatch.planInputPartitions()
      val files = planned.flatMap {
        case fp: FilePartition => fp.files
        case other => sys.error(
          s"bucketed scan of $root: expected FilePartitions from the " +
            s"delegated parquet scan, got ${other.getClass.getName}")
      }
      val byBucket = files.groupBy { f =>
        graft.sources.GraftBucket.fileBucket(f.toPath.getName) match {
          case Some(b) if b < n => b
          case _ => sys.error(
            s"bucketed scan of $root: file ${f.toPath} is not a " +
              s"bucket-$n layout file — the #bucketed: manifest mark " +
              "lied, which is a format invariant violation")
        }
      }
      Array.tabulate(n) { k =>
        val fs = byBucket.getOrElse(k, Array.empty)
          .sortBy(f => (f.toPath.toString, f.start))
        BucketPartition(k, FilePartition(k, fs))
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new BucketReaderFactory(delegate.toBatch.createReaderFactory())
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(streamable,
      s"stream read of $root: a time-traveled snapshot is frozen — " +
        "nothing to stream")
    require(!Option(options.get("readChangeFeed"))
      .exists(_.trim.toBoolean),
      "change-feed STREAMING adds change_kind/_commit_version columns " +
        "the catalog relation's schema cannot carry — use " +
        "spark.readStream.format(\"graft-versioned-stream\")" +
        ".option(\"readChangeFeed\", \"true\").load(<table root>)")
    new graft.sources.VersionedTableMicroBatchStream(spark, root,
      delegate.readSchema(), options)
  }
}

/** [[BucketedDelegatingScan]] that ALSO proves per-partition key
  * order (`SupportsReportOrdering`): each bucket holds at most one
  * data file, written key-sorted by the bucketing path — so a
  * co-bucketed, co-sorted join needs neither the shuffle NOR the
  * sort, and the merge join runs straight off the parquet readers.
  * The end state a 100 TB fact-fact join wants: O(read) + O(merge),
  * zero exchange, zero sort spill. */
private[graft] class SortedBucketedDelegatingScan(spark: SparkSession,
    root: String, options: CaseInsensitiveStringMap, delegate: Scan,
    key: String, n: Int, streamable: Boolean)
    extends BucketedDelegatingScan(spark, root, options, delegate, key,
      n, streamable)
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(Expressions.sort(Expressions.column(key),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
}

/** All of bucket k's files (across every commit dir of the snapshot),
  * as one partition keyed by k — the unit Spark's SPJ matches across
  * join sides. */
private[graft] case class BucketPartition(id: Int, inner: FilePartition)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](id))
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Unwraps [[BucketPartition]] for the delegated parquet reader
  * factory — rows AND columnar batches pass straight through, so the
  * bucketed path keeps the vectorized reader. */
private[graft] class BucketReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {

  private def unwrap(p: InputPartition): InputPartition = p match {
    case BucketPartition(_, fp) => fp
    case other => other
  }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(partition))

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    inner.createReader(unwrap(partition))

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(unwrap(partition))
}
