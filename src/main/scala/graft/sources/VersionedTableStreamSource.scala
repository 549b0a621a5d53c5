package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[VersionedTable]] — the
  * continuous spelling of [[VersionedTable.changesBetween]]'s append
  * fast path:
  *
  * {{{
  *   spark.readStream.format("graft-versioned-stream").load(tableRoot)
  * }}}
  *
  * Offsets ARE version numbers: each micro-batch covers a committed
  * version range `(start, end]` and reads exactly the commit dirs
  * those versions ADDED — O(delta) I/O per batch resolved from the
  * manifests alone, never a snapshot scan or a directory listing.
  * Batch 0 is the table's current snapshot (the Delta streaming-read
  * convention: initial load, then tail). Exactly-once composes the
  * standard way: the engine checkpoints offsets and replays a crashed
  * batch; an idempotent sink (foreachBatch keyed on batchId, or the
  * txn-marker append sink) deduplicates the replay.
  *
  * A REWRITE inside a streamed range (merge/compact/optimize) fails
  * the query loudly: dirs the old version referenced are gone from
  * the new manifest, so the appended-dirs premise is broken and
  * silently emitting the delta as inserts would corrupt downstream
  * state. Consumers of rewriting tables run the batch
  * [[VersionedTable.changesBetween]] general path instead — same
  * posture as Delta's streaming read without ignoreChanges.
  *
  * Why the v1 `Source` API: `getBatch` returns a DataFrame, which
  * lets the source delegate scanning to Spark's vectorized parquet
  * reader over the delta dirs (the [[VersionedTableSource]] DSv2
  * delegation posture, kept for streaming) instead of hand-rolling a
  * PartitionReader — the same call Delta's streaming source makes.
  * This is a PINNED internal dependency: every seam used here is
  * locked by reflection in `StreamSourceApiPinSpec`, which fails with
  * the DSv2 migration recipe the moment a Spark bump moves any of
  * them (instead of an opaque linkage error mid-stream).
  */
class VersionedTableStreamSource(sqlContext: SQLContext, root: String,
    override val schema: StructType,
    cdf: Option[VersionedTableStreamSource.CdfMode] = None,
    maxVersionsPerTrigger: Option[Int] = None,
    triggerOnly: Boolean = false) extends Source {

  private def spark: SparkSession = sqlContext.sparkSession

  private def versionOf(o: OffsetV1): Int = o match {
    case LongOffset(v) => v.toInt
    case SerializedOffset(json) => json.trim.toInt
    case other => throw new IllegalStateException(
      s"unexpected offset type ${other.getClass.getName}")
  }

  // admission control on the legacy seam: the last end version this
  // source served (getBatch records it; recovery replays the last
  // batch through getBatch first, re-seeding it), so getOffset can
  // bound each batch — including the CDF INITIAL batch, which without
  // a bound replays the entire history in one go
  @volatile private var lastEnd: Option[Int] = None

  override def getOffset: Option[OffsetV1] =
    VersionedTable.latestVersion(spark, root) match {
      case -1 => None
      case v =>
        val bounded = maxVersionsPerTrigger match {
          case Some(n) =>
            // cold-start base: CDF mode replays per version from
            // startingVersion (boundable); SNAPSHOT mode's initial
            // batch is the whole snapshot at `v` — one unsplittable
            // "version's worth", so it must NOT be bounded (pinning it
            // to version n-1 would fail outright on vacuumed tables
            // and on histories containing a rewrite)
            val base = lastEnd.getOrElse(
              cdf.map(_.startingVersion - 1).getOrElse(v))
            math.min(v, base + math.max(n, 1))
          case None => v
        }
        Some(LongOffset(bounded.toLong))
    }

  // CHANGE-FEED mode: each micro-batch is the per-version change feed
  // of its `(from, to]` range — getBatch returns a DataFrame, so the
  // v1 seam serves the feed's FULL vocabulary: keyed pre/post images
  // and rewrite deltas included (each version pays exactly its
  // changesBetween cost — O(delta) for appends, an honest content
  // diff for rewrites). This is the seam Delta's own CDC streaming
  // read lives on; the DSv2 half serves the insert-only append tail.
  private def cdfBatch(start: Option[OffsetV1], to: Int): DataFrame = {
    val mode = cdf.get
    val from = start.map(versionOf)
    VersionedTable.changeFeed(spark, root,
      startingVersion = from.map(_ + 1).getOrElse(mode.startingVersion),
      endingVersion = Some(to), key = mode.key)
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    lastEnd = Some(versionOf(end))
    // triggerOnly: the commit-ticker mode, SAME contract as the DSv2
    // stream's option — offsets advance per version, batches carry no
    // rows, and the append-only rewrite check never applies. Kept in
    // parity here so a follow consumer behaves identically under the
    // disabledV2MicroBatchReaders fallback.
    if (triggerOnly)
      return StreamingBridge.asStreaming(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    if (cdf.isDefined)
      return StreamingBridge.asStreaming(cdfBatch(start, versionOf(end)))
    val to = versionOf(end)
    val batch = start match {
      case None =>
        // initial micro-batch: the whole snapshot as of `to`
        VersionedTable.requireVersionsAvailable(spark, root, to, to)
        VersionedTable.read(spark, root, Some(to))
      case Some(s) =>
        val from = versionOf(s)
        VersionedTable.requireVersionsAvailable(spark, root,
          math.max(from, 0), to)
        // compare manifest REFERENCES, not flattened leaf names:
        // a file-granular reference (`dir/file.parquet`, a partial
        // rewrite's in-place carry) must keep its parent dir both
        // for the append-only subset check and for path resolution —
        // Path.getName would alias it to a bare file name that
        // resolves nowhere (same contract as addedDirsForVersion on
        // the DSv2 path)
        val fromRefs = VersionedTable.readManifest(spark, root, from)
          .toSet
        val toRefs = VersionedTable.readManifest(spark, root, to)
        require(fromRefs.subsetOf(toRefs.toSet),
          s"versions ($from, $to] of $root contain a rewrite " +
            "(merge/compact/optimize) — the streaming source only tails " +
            "APPENDS; use VersionedTable.changesBetween for rewrite deltas")
        val added = toRefs.filterNot(fromRefs)
        if (added.isEmpty) // defensive: engine never asks for (v, v]
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.schema(schema).parquet(added.map(d =>
          new Path(new Path(root, "data"), d).toString): _*)
    }
    StreamingBridge.asStreaming(batch)
  }

  override def stop(): Unit = ()
}

object VersionedTableStreamSource {
  /** Change-feed read parameters: `startingVersion` is the first
    * version the INITIAL batch replays (0 = snapshot replay then
    * tail); `key` switches per-version deltas to the keyed
    * pre/post-image vocabulary. */
  case class CdfMode(startingVersion: Int, key: Option[String])

  private[sources] def cdfModeOf(parameters: Map[String, String])
      : Option[CdfMode] = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    if (!ci.get("readchangefeed").exists(_.trim.toBoolean)) None
    else Some(CdfMode(
      ci.get("startingversion").map(_.trim.toInt).getOrElse(0),
      ci.get("key").map(_.trim).filter(_.nonEmpty)))
  }

  /** The feed schema: table columns + change_kind + _commit_version
    * (nullable like any projected column — the keyed path derives
    * change_kind through an explode, and attribute nullability must
    * not drift between the declared and per-batch schemas). */
  private[sources] def cdfSchema(table: StructType): StructType =
    StructType(table.fields :+
      org.apache.spark.sql.types.StructField("change_kind",
        org.apache.spark.sql.types.StringType, nullable = true) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = true))
}

/** `format("graft-versioned-stream")` provider (registered in
  * META-INF/services alongside the batch connector).
  *
  * Implements BOTH streaming seams: the public DSv2 `TableProvider`
  * half hands the engine a [[VersionedStreamTable]] (MICRO_BATCH_READ
  * via [[VersionedTableMicroBatchStream]] — the path the engine
  * selects by default), and the v1 `StreamSourceProvider` half stays
  * as the explicit fallback (`DataStreamReader` wires it into
  * `StreamingRelationV2`'s v1Relation, selectable via
  * `spark.sql.streaming.disabledV2MicroBatchReaders`). Offsets
  * serialize identically, so checkpoints move between the two. */
class VersionedTableStreamSourceProvider
    extends StreamSourceProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "graft-versioned-stream"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-versioned-stream needs a table root: .load(<root>)"))

  // ---- DSv2 TableProvider half ----

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : StructType = {
    val spark = SparkSession.active
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-versioned-stream needs a table root: .load(<root>)"))
    val base = VersionedTable.read(spark, root).schema
    if (Option(options.get("readChangeFeed")).exists(_.trim.toBoolean))
      VersionedTableStreamSource.cdfSchema(base)
    else base
  }

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-versioned-stream needs a table root: .load(<root>)"))
    new VersionedStreamTable(SparkSession.active, root, schema)
  }

  // ---- v1 StreamSourceProvider half (fallback) ----

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      VersionedTable.read(sqlContext.sparkSession, rootOf(parameters)).schema)
    (shortName(),
      if (VersionedTableStreamSource.cdfModeOf(parameters).isDefined &&
        schema.isEmpty)
        VersionedTableStreamSource.cdfSchema(base)
      else base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    val cdf = VersionedTableStreamSource.cdfModeOf(parameters)
    val s = schema.getOrElse {
      val base = VersionedTable.read(sqlContext.sparkSession, root).schema
      if (cdf.isDefined) VersionedTableStreamSource.cdfSchema(base)
      else base
    }
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val maxV = lower.get("maxversionspertrigger").map(_.trim.toInt)
    val tick = lower.get("triggeronly").exists(_.trim.toBoolean)
    new VersionedTableStreamSource(sqlContext, root, s, cdf, maxV,
      triggerOnly = tick)
  }
}
