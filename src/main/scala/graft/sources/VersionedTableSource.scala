package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 READ connector for [[VersionedTable]] — the
  * Spark-native spelling of a snapshot read:
  *
  * {{{
  *   spark.read.format("graft-versioned")
  *     .option("versionAsOf", 1)   // omit for latest
  *     .load(tableRoot)
  * }}}
  *
  * The provider does exactly ONE thing itself: resolve the requested
  * version's manifest to its immutable commit-dir list
  * ([[VersionedTable.dataDirs]]). Everything after that is delegated
  * to Spark's own `ParquetTable`, so the scan is the stock vectorized
  * parquet scan — columnar batches, predicate pushdown, column
  * pruning, partition coalescing, AQE — with zero bespoke read code
  * to maintain (the same delegation posture production table formats
  * take: the format owns VISIBILITY, the engine owns SCANNING).
  *
  * Snapshot isolation carries over: the file list is pinned at
  * `getTable` time, so commits or vacuums of OTHER versions that land
  * after the DataFrame is built never disturb it — the exact property
  * VersionedTableSpec pins for the programmatic path.
  *
  * Registered in META-INF/services so the short name works; the
  * fully-qualified class name (`format(classOf[VersionedTableSource]
  * .getName)`) works without registration.
  */
class VersionedTableSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  // schema comes from parquet footers, not user DDL
  override def supportsExternalMetadata(): Boolean = false

  private def resolved(options: CaseInsensitiveStringMap): ParquetTable = {
    val spark = SparkSession.active
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-versioned needs a table root: .load(<root>)"))
    val version = Option(options.get("versionAsOf")).map(_.trim.toInt)
    // timestampAsOf (epoch millis, or ISO-8601 instant/local-date-time
    // read as UTC): resolved to the newest version committed at or
    // before it — Delta's timestamp time travel
    val tsVersion = Option(options.get("timestampAsOf")).map { raw =>
      val s = raw.trim
      val millis = scala.util.Try(s.toLong).getOrElse {
        scala.util.Try(java.time.Instant.parse(s).toEpochMilli).getOrElse(
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      }
      VersionedTable.versionAt(spark, root, millis).getOrElse(
        throw new IllegalArgumentException(
          s"no version of $root committed at or before $s"))
    }
    require(version.isEmpty || tsVersion.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val v = version.orElse(tsVersion)
      .getOrElse(VersionedTable.latestVersion(spark, root))
    val dirs = VersionedTable.dataDirs(spark, root, Some(v))
    // an evolved version's `#schema:` pin rides through as the user
    // schema — footer inference over mixed-schema commit dirs would
    // nondeterministically pick a pre-evolution file's column set,
    // and the connector must read identically to VersionedTable.read
    ParquetTable(s"graft-versioned $root", spark, options, dirs,
      userSpecifiedSchema = VersionedTable.manifestSchema(spark, root, v),
      fallbackFileFormat = classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolved(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    resolved(new CaseInsensitiveStringMap(properties))
}
