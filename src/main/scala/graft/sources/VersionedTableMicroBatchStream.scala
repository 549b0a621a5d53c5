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
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    checkpointLocation: String = "")
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl {

  private def version(o: Offset): Int = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toInt
  }

  // maxVersionsPerTrigger: bound each micro-batch to N versions'
  // deltas — a consumer starting cold against a long-history table
  // catches up in bounded steps instead of one giant initial batch
  // (the initial snapshot batch itself counts as its "to" version's
  // worth and is not splittable below one version). Clamped to >= 1:
  // 0 would stall the stream silently, a negative value would write
  // regressing offsets into the checkpoint.
  private val maxVersions: Option[Int] =
    Option(options.get("maxVersionsPerTrigger"))
      .map(s => math.max(1, s.trim.toInt))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val latest = VersionedTable.latestVersion(spark, root)
    val from = version(start)
    VersionOffset(maxVersions match {
      case Some(n) if from >= 0 => math.min(latest, from + n)
      case _ => latest
    })
  }

  override def latestOffset(): Offset =
    VersionOffset(VersionedTable.latestVersion(spark, root))

  override def initialOffset(): Offset = VersionOffset(-1)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toInt)

  private def deltaPaths(from: Int, to: Int): Seq[String] = {
    if (from < 0) {
      // initial batch = the snapshot AT `to` — only that manifest and
      // its dirs need to exist (a vacuumed-away PREFIX is irrelevant:
      // a fresh stream on a long-vacuumed table must still start)
      VersionedTable.requireVersionsAvailable(spark, root, to, to)
      val paths = VersionedTable.dataDirs(spark, root, Some(to))
      VersionedTable.requireDirsAvailable(spark, root, paths)
      return paths
    }
    // per-version walk (not one (from, to] set diff) so DATA-EQUIVALENT
    // maintenance versions (compact/compactSmall/optimize re-home rows
    // the consumer already received) are SKIPPED instead of failing the
    // rewrite refusal — a tailing consumer survives layout maintenance.
    // Shared with the change-feed streams via addedDirsForVersion; a
    // lagging consumer hits the typed data-loss error in there, never
    // a raw missing-file failure deep inside the scan.
    (from + 1 to to).flatMap { v =>
      VersionedTable.addedDirsForVersion(spark, root, v).getOrElse(
        throw new IllegalArgumentException(
          s"version $v of $root is a rewrite (merge/delete/update) — " +
            "the streaming source only tails APPENDS; use " +
            "VersionedTable.changesBetween for rewrite deltas"))
    }
  }

  private def scanOver(paths: Seq[String]) =
    ParquetTable(s"graft-versioned-stream $root", spark, options, paths,
      userSpecifiedSchema = Some(tableSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(options).build()
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]

  // triggerOnly: the stream is consumed as a COMMIT TICKER — offsets
  // advance with the base's versions (one trigger per commit, same
  // checkpoint/Trigger semantics) but every batch plans ZERO
  // partitions, so no data is ever read and the append-only
  // restriction never applies (a rewrite version ticks like any
  // other). The shape a side-effecting follower wants
  // (Streams.followMaterializedView: refresh reads the CDF plane
  // itself — executing the batch would read the same delta twice).
  private val triggerOnly: Boolean =
    Option(options.get("triggerOnly")).exists(_.trim.toBoolean)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    if (triggerOnly) return Array.empty
    val from = version(start)
    val to = version(end)
    if (to < 0 || to == from) Array.empty
    else scanOver(deltaPaths(from, to)).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // path-independent: built over no files, reads any batch's
    // FilePartitions (same schema, same conf)
    scanOver(Seq.empty).createReaderFactory()

  // triggerOnly tickers never auto-publish: the follower they serve
  // (an MV refresh) has its own deliberate floor convention
  // (MaterializedView.publishFloor) keyed to the VIEW's watermark,
  // not this checkpoint's offset — a second id here would just be
  // registry noise
  private val floors = StreamFloorPublisher(spark, root, options,
    checkpointLocation, enabled = !triggerOnly)

  override def commit(end: Offset): Unit = floors.onCommit(version(end))

  override def stop(): Unit = ()
}

/** Version number as a streaming offset; `json` is the bare integer,
  * byte-compatible with the v1 source's LongOffset checkpoints. */
case class VersionOffset(v: Int) extends Offset {
  override def json: String = v.toString
}

/** AUTO-PUBLISHES a streaming reader's version floor into the base's
  * `_consumers` registry — what closes the one consumer class
  * `VACUUM … RESPECT CONSUMERS` could not see: a bare `readStream`
  * tail's position lives only in ITS checkpoint, so until now a
  * consumer-respecting vacuum protected materialized views (which
  * publish deliberately) but could still sweep the versions a lagging
  * plain stream needs next.
  *
  * Identity: the CHECKPOINT location (leaf name + path hash, same
  * shape as [[MaterializedView.floorConsumerId]]) — the checkpoint IS
  * the consumer's durable position, so a restarted query re-claims
  * its own registry row and two streams can never collide (distinct
  * checkpoints) or duplicate (same checkpoint = same consumer).
  *
  * Cadence: every epoch would put one registry MERGE commit on every
  * micro-batch's critical path for a capacity-planning signal, so the
  * publish fires on the FIRST `commit()` after (re)start and then
  * every `floorPublishEvery` epochs (default 10; 0 disables). Engine
  * timing caveat: Spark invokes `source.commit(end)` when it
  * CONSTRUCTS the next batch (`cleanUpLastExecutedMicroBatch` is a
  * no-op for batch 0 and otherwise commits batch N−1's offsets), so
  * a stream that runs one batch and then idles publishes nothing —
  * which is harmless, because a floor only matters for a consumer
  * the table is moving PAST, and every base commit that creates that
  * lag also constructs the batch whose clean-up fires the publish.
  * Between publishes the registered floor lags the true position by
  * at most N batches, which only ever errs CONSERVATIVE (vacuum
  * keeps a few extra versions, never too few). ADVISORY discipline:
  * a publish failure must never fail the DATA stream — it is caught,
  * counted, and retried at the next cadence point (the registry
  * write's own concurrency is already handled by
  * [[VersionedTable.publishConsumerFloor]]'s retry loop).
  *
  * The floor value is the COMMITTED end offset v: the checkpoint
  * restarts reading deltas `(v, …]` from v's manifest chain, so
  * "keep version ≥ v" is exactly the guarantee the next batch needs. */
private[sources] class StreamFloorPublisher(spark: SparkSession,
    root: String, consumerId: String, every: Int) {

  private var commits = 0L
  private[sources] var publishFailures = 0L

  def onCommit(version: Int): Unit = {
    if (every <= 0 || version < 0) return
    commits += 1
    if (commits == 1 || commits % every == 0) {
      try VersionedTable.publishConsumerFloor(
        spark, root, consumerId, version)
      catch {
        // advisory metadata: never kill the data stream over the
        // registry — the floor just stays at its last value until
        // the next cadence point retries
        case scala.util.control.NonFatal(_) => publishFailures += 1
      }
    }
  }
}

private[sources] object StreamFloorPublisher {

  /** Registry id for a checkpoint: leaf name for readability plus a
    * full-path hash for identity (two checkpoints sharing a leaf
    * name must never overwrite each other's floors). */
  def consumerIdFor(checkpoint: String): String = {
    val p = new Path(checkpoint)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(p.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    s"stream:${p.getName}-$h"
  }

  /** Spark auto-creates `temporary-<uuid>` checkpoint dirs for
    * queries started without one (console/memory exploration) and
    * deletes them when the query stops — such a consumer can NEVER
    * resume, so a durable registry floor under its one-run id would
    * be a ghost: each notebook run would append a dead row that
    * `RESPECT CONSUMERS` (without MAX LAG) then pins retention to
    * forever. Non-durable checkpoint ⇒ no durable floor, unless the
    * user EXPLICITLY sets floorPublishEvery (an opt-in is a
    * statement that they'll manage the registry). The `temporary-`
    * dir is the query ROOT; the per-source checkpoint handed here is
    * `<root>/sources/<i>`, so every segment is checked. */
  private def isTempCheckpoint(checkpoint: String): Boolean =
    checkpoint.split('/').exists(_.startsWith("temporary-"))

  def apply(spark: SparkSession, root: String,
      options: CaseInsensitiveStringMap, checkpointLocation: String,
      enabled: Boolean = true): StreamFloorPublisher = {
    val explicit = Option(options.get("floorPublishEvery"))
      .map(_.trim.toInt)
    val every =
      if (!enabled || checkpointLocation.isEmpty) 0
      else if (isTempCheckpoint(checkpointLocation))
        explicit.getOrElse(0)
      else explicit.getOrElse(10)
    new StreamFloorPublisher(spark, root,
      if (checkpointLocation.isEmpty) "" else consumerIdFor(checkpointLocation),
      every)
  }
}

/** CHANGE-FEED micro-batch stream over the versioned table — the
  * streaming spelling of [[VersionedTable.changeFeed]]'s append path:
  * each micro-batch covers a committed version range `(from, to]` and
  * emits the rows those versions ADDED, tagged `change_kind =
  * 'insert'` and the `_commit_version` that committed them — so a
  * downstream topology consumes an ordered CDC feed, not bare
  * appends. `startingVersion` (default 0) picks the first version to
  * replay; the initial batch is `[startingVersion, latest]`, one
  * version at a time, which is what gives every row its exact commit
  * provenance (the snapshot-mode source can't say which version a row
  * arrived in).
  *
  * Partition planning stays delegated and O(delta): per version, a
  * fresh `ParquetScan` over exactly the dirs that version's manifest
  * added; the wrapping reader appends the two constant columns per
  * partition — no data copied, one `JoinedRow` per row. Constants
  * force the row-based parquet read path (a columnar batch can't be
  * extended in place) — the honest price of per-row provenance;
  * snapshot tailing keeps the vectorized path.
  *
  * A REWRITE inside a streamed range fails loudly, same as the
  * snapshot stream: its delta is a content diff no file scan can
  * express. KEYED feeds (update pre/post images) are a join per
  * version — also not a file scan; both run on the v1 source's
  * `getBatch` seam (`readChangeFeed` + `key` with
  * `spark.sql.streaming.disabledV2MicroBatchReaders`) or the batch
  * [[VersionedTable.changeFeed]]. */
class VersionedTableChangeFeedStream(spark: SparkSession, root: String,
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    startingVersion: Int, checkpointLocation: String = "")
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl {

  private def version(o: Offset): Int = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toInt
  }

  // the change-feed replay is per-version already, so
  // maxVersionsPerTrigger bounds EVERY batch including the replay —
  // a cold consumer of a 10^4-version log catches up in bounded steps
  // (clamped >= 1: 0 would stall silently, negative would regress
  // offsets)
  private val maxVersions: Option[Int] =
    Option(options.get("maxVersionsPerTrigger"))
      .map(s => math.max(1, s.trim.toInt))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val latest = VersionedTable.latestVersion(spark, root)
    val from = version(start)
    VersionOffset(maxVersions match {
      case Some(n) => math.min(latest, from + n)
      case _ => latest
    })
  }

  override def latestOffset(): Offset =
    VersionOffset(VersionedTable.latestVersion(spark, root))

  override def initialOffset(): Offset = VersionOffset(startingVersion - 1)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toInt)

  // the dirs version v ADDED over v-1 (v == 0: everything it lists);
  // data-equivalent maintenance versions contribute NOTHING (their
  // rows were already delivered under their old dirs) — shared walk
  // with the other streams via addedDirsForVersion
  private def addedPaths(v: Int): Seq[String] =
    VersionedTable.addedDirsForVersion(spark, root, v).getOrElse(
      throw new IllegalArgumentException(
        s"version $v of $root is a rewrite (merge/delete/update) — " +
          "the change-feed stream tails APPENDS; consume rewrite " +
          "deltas keyed (enableChangeFeed + option(\"key\", ...)), " +
          "via batch VersionedTable.changeFeed, or the v1 source's " +
          "keyed readChangeFeed"))

  private def scanOver(paths: Seq[String]) =
    ParquetTable(s"graft-versioned-cdf-stream $root", spark, options, paths,
      userSpecifiedSchema = Some(tableSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(options).build()
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = version(start)
    val to = version(end)
    if (to < 0 || to <= from) return Array.empty
    (math.max(from + 1, 0) to to).flatMap { v =>
      val paths = addedPaths(v)
      if (paths.isEmpty) Array.empty[InputPartition]
      else scanOver(paths).planInputPartitions()
        .map(p => ChangeTaggedPartition(v.toLong, p))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeTaggedReaderFactory(scanOver(Seq.empty).createReaderFactory())

  private val floors =
    StreamFloorPublisher(spark, root, options, checkpointLocation)

  override def commit(end: Offset): Unit = floors.onCommit(version(end))

  override def stop(): Unit = ()
}

/** An input partition plus the commit version whose manifest added
  * its files — carried to the executor so the reader can tag rows. */
case class ChangeTaggedPartition(commitVersion: Long,
    inner: InputPartition) extends InputPartition

/** Appends the constant `(change_kind, _commit_version)` suffix to
  * every row of the wrapped partition reader — one shared JoinedRow,
  * zero copies. Row-based only: constants can't be appended to a
  * columnar batch in place. */
private[sources] class ChangeTaggedReaderFactory(
    inner: PartitionReaderFactory) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    partition match {
      case ChangeTaggedPartition(v, ip) =>
        val r = inner.createReader(ip)
        new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
          private val joined =
            new org.apache.spark.sql.catalyst.expressions.JoinedRow
          private val tag = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](
              org.apache.spark.unsafe.types.UTF8String.fromString("insert"),
              v))
          override def next(): Boolean = r.next()
          override def get(): InternalRow = joined(r.get(), tag)
          override def close(): Unit = r.close()
        }
      case other => inner.createReader(other)
    }
}

/** KEYED change-feed micro-batch stream — the DSv2 spelling of
  * `VersionedTable.changeFeed(key = ...)`, servable on the public
  * seam because rewrite commits MATERIALIZE their keyed change rows
  * at commit time ([[VersionedTable.enableChangeFeed]], Delta's
  * CDC-file approach). Per version in a batch's `(from, to]` range:
  *
  *  - APPEND versions stream their added dirs tagged
  *    `("insert", v)` — identical to the unkeyed feed, because an
  *    append can only insert, keyed or not. O(delta) from manifests.
  *  - REWRITE versions stream their materialized `_changes/v{N}`
  *    parquet (rows already carry `change_kind` — pre/post images
  *    included), tagged with only `_commit_version`. O(change file).
  *  - DATA-EQUIVALENT maintenance versions have an EMPTY change file
  *    (or are skipped outright by their `#op:` marker) and contribute
  *    nothing.
  *
  * A rewrite committed BEFORE CDC was enabled has no file and fails
  * loudly with the batch/v1 recipe — the v1 `Source` seam remains as
  * the LEGACY fallback for exactly that case (pre-CDC history). */
class VersionedTableKeyedChangeFeedStream(spark: SparkSession,
    root: String, dataSchema: StructType,
    options: CaseInsensitiveStringMap, startingVersion: Int, key: String,
    checkpointLocation: String = "")
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl {

  require(VersionedTable.changeFeedKey(spark, root).contains(key),
    s"keyed DSv2 change feeds need commit-time change files: run " +
      s"VersionedTable.enableChangeFeed(spark, root, \"$key\") first " +
      "(or consume via batch changeFeed / the v1 seam)")

  private val changeSchema = StructType(dataSchema.fields :+
    org.apache.spark.sql.types.StructField("change_kind",
      org.apache.spark.sql.types.StringType, nullable = true))

  private def version(o: Offset): Int = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toInt
  }

  private val maxVersions: Option[Int] =
    Option(options.get("maxVersionsPerTrigger"))
      .map(s => math.max(1, s.trim.toInt)) // 0 would stall silently

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val latest = VersionedTable.latestVersion(spark, root)
    val from = version(start)
    VersionOffset(maxVersions match {
      case Some(n) => math.min(latest, from + n)
      case _ => latest
    })
  }

  override def latestOffset(): Offset =
    VersionOffset(VersionedTable.latestVersion(spark, root))

  override def initialOffset(): Offset = VersionOffset(startingVersion - 1)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toInt)

  private def scanTable(paths: Seq[String]) =
    ParquetTable(s"graft-versioned-kcdf $root", spark, options, paths,
      userSpecifiedSchema = Some(dataSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(options).build()
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]

  private def scanChanges(paths: Seq[String]) =
    ParquetTable(s"graft-versioned-kcdf-chg $root", spark, options, paths,
      userSpecifiedSchema = Some(changeSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(options).build()
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]

  private def planVersion(v: Int): Array[InputPartition] = {
    VersionedTable.addedDirsForVersion(spark, root, v) match {
      case Some(paths) =>
        // append-only (v == 0: snapshot replay) or maintenance skip:
        // added dirs are inserts
        if (paths.isEmpty) Array.empty
        else scanTable(paths).planInputPartitions()
          .map(p => ChangeTaggedPartition(v.toLong, p))
      case None =>
        // rewrite: its commit-time change file IS the feed
        val file = VersionedTable.changeFilePathIfExists(spark, root, v)
          .getOrElse(throw new IllegalStateException(
            s"version $v of $root is a rewrite with no materialized " +
              "change file (committed BEFORE enableChangeFeed, or a " +
              "metadata-only RESTORE) — replay that range via batch " +
              "VersionedTable.changeFeed or the v1 seam, then tail " +
              "from a version with change files"))
        scanChanges(Seq(file)).planInputPartitions()
          .map(p => VersionTaggedPartition(v.toLong, p))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = version(start)
    val to = version(end)
    if (to < 0 || to <= from) return Array.empty
    (math.max(from + 1, 0) to to).flatMap(planVersion).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedChangeFeedReaderFactory(
      scanTable(Seq.empty).createReaderFactory(),
      scanChanges(Seq.empty).createReaderFactory())

  private val floors =
    StreamFloorPublisher(spark, root, options, checkpointLocation)

  override def commit(end: Offset): Unit = floors.onCommit(version(end))

  override def stop(): Unit = ()
}

/** A change-file partition plus its commit version: rows already
  * carry `change_kind`; only `_commit_version` is appended. */
case class VersionTaggedPartition(commitVersion: Long,
    inner: InputPartition) extends InputPartition

/** Dispatches the keyed feed's two partition flavors: append
  * partitions read table-schema files and append
  * `("insert", version)`; change-file partitions read
  * (table + change_kind) files and append `(version)`. One shared
  * JoinedRow each, zero copies. */
private[sources] class KeyedChangeFeedReaderFactory(
    tableInner: PartitionReaderFactory,
    changeInner: PartitionReaderFactory) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow

  private val appendDelegate = new ChangeTaggedReaderFactory(tableInner)

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    partition match {
      case VersionTaggedPartition(v, ip) =>
        val r = changeInner.createReader(ip)
        new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
          private val joined =
            new org.apache.spark.sql.catalyst.expressions.JoinedRow
          private val tag = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](v))
          override def next(): Boolean = r.next()
          override def get(): InternalRow = joined(r.get(), tag)
          override def close(): Unit = r.close()
        }
      case other => appendDelegate.createReader(other)
    }
}

/** The table handed to the engine by the provider's TableProvider
  * half: capabilities say MICRO_BATCH_READ, the scan builder returns
  * a [[VersionedTableMicroBatchStream]] — or, with
  * `option("readChangeFeed", "true")`, a
  * [[VersionedTableChangeFeedStream]] whose schema appends
  * `change_kind` + `_commit_version` (plus `option("key", k)` for the
  * keyed variant served from commit-time change files). */
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
          if (Option(options.get("readChangeFeed"))
              .exists(_.trim.toBoolean)) {
            // tableSchema here is the CDF schema the provider inferred;
            // the underlying file scan reads the table columns only
            val dataSchema = StructType(tableSchema.fields.dropRight(2))
            val starting = Option(options.get("startingVersion"))
              .map(_.trim.toInt).getOrElse(0)
            Option(options.get("key")).map(_.trim).filter(_.nonEmpty) match {
              case Some(k) => new VersionedTableKeyedChangeFeedStream(
                spark, root, dataSchema, options, starting, k,
                checkpointLocation)
              case None => new VersionedTableChangeFeedStream(
                spark, root, dataSchema, options, starting,
                checkpointLocation)
            }
          } else new VersionedTableMicroBatchStream(
            spark, root, tableSchema, options, checkpointLocation)
      }
    }
}
