package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-catalog surface for [[VersionedTable]] — the Spark-native
  * spelling of the whole table lifecycle, on PUBLIC connector APIs
  * only (`TableCatalog` / `SupportsNamespaces` / `SupportsDelete` /
  * `V1Write`):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *
  *   spark.sql("CREATE TABLE graft.docs (id BIGINT, text STRING)")
  *   spark.sql("INSERT INTO graft.docs SELECT ...")        // atomic append
  *   spark.sql("INSERT OVERWRITE graft.docs SELECT ...")   // full rewrite
  *   spark.sql("SELECT * FROM graft.docs VERSION AS OF 2") // time travel
  *   spark.sql("DELETE FROM graft.docs WHERE id < 100")    // stats-pruned CoW
  *   spark.sql("TRUNCATE TABLE graft.docs")
  * }}}
  *
  * Identifiers map to paths: `graft.ns.tbl` lives at
  * `<warehouse>/ns/tbl`, so the catalog holds NO state of its own —
  * the manifests ARE the metastore, exactly the posture a 100 TB
  * deployment wants (any session pointing a catalog at the warehouse
  * sees every table; there is no second source of truth to drift).
  *
  * Division of labor per operation:
  *  - reads delegate to Spark's own `ParquetTable` over the snapshot's
  *    manifest-resolved file list (same delegation as
  *    [[VersionedTableSource]] — the format owns visibility, the
  *    engine owns scanning);
  *  - `INSERT INTO` / `INSERT OVERWRITE` run through [[V1Write]]'s
  *    `InsertableRelation` into [[VersionedTable.append]] /
  *    `commit` — one atomic manifest rename per statement, optimistic
  *    against concurrent writers;
  *  - `DELETE FROM ... WHERE` converts the pushed `Filter`s to the
  *    engine predicate and runs [[VersionedTable.delete]] — the
  *    copy-on-write rewrite that touches only may-match commit dirs;
  *    an untranslatable predicate is REFUSED at analysis
  *    (`canDeleteWhere` false), never silently approximated;
  *  - `VERSION AS OF` / `TIMESTAMP AS OF` resolve through the
  *    `loadTable(ident, version|timestamp)` overloads; time-traveled
  *    tables are read-only (writes/deletes refuse loudly).
  *
  * SQL `UPDATE`/`MERGE` need `SupportsRowLevelOperations` (a
  * rewrite-plan contract this catalog does not implement); the
  * programmatic [[VersionedTable.update]] / `merge` cover those.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new Path(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse")))
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs = warehouse.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def tablePath(ident: Identifier): Path =
    (ident.namespace() :+ ident.name())
      .foldLeft(warehouse)((p, seg) => new Path(p, seg))

  private def isTable(p: Path): Boolean =
    fs.exists(new Path(p, "_manifests"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)((p, s) => new Path(p, s))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(st => st.isDirectory && isTable(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    new GraftSqlTable(ident.toString, p.toString, version = None)
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    new GraftSqlTable(ident.toString, p.toString,
      version = Some(version.trim.toInt))
  }

  // TableCatalog's timestamp overload carries MICROseconds since
  // epoch (the catalyst timestamp domain)
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val v = VersionedTable.versionAt(spark, p.toString, timestamp / 1000L)
      .getOrElse(throw new IllegalArgumentException(
        s"no version of $ident committed at or before timestamp " +
          s"${timestamp}us"))
    new GraftSqlTable(ident.toString, p.toString, version = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = {
    require(partitions.isEmpty,
      "graft tables cluster via cluster()/OPTIMIZE, not PARTITIONED BY")
    val p = tablePath(ident)
    if (isTable(p)) throw new TableAlreadyExistsException(ident)
    // version 0 = one empty parquet file carrying the declared schema
    // (SPARK-23271 guarantees the schema-bearing file lands), so the
    // table is immediately readable and every later write goes through
    // append's drift guard against this schema
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .coalesce(1)
    VersionedTable.init(spark, p.toString, empty)
    new GraftSqlTable(ident.toString, p.toString, version = None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; evolve additively via " +
        "VersionedTable.append(evolveSchema = true)")

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isTable(p)) return false
    fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier)
      : Unit = {
    val from = tablePath(oldIdent)
    val to = tablePath(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to)) sys.error(
      s"rename $oldIdent -> $newIdent failed")
  }

  // ---- SupportsNamespaces: directories under the warehouse ----

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse)
      .filter(st => st.isDirectory && !isTable(st.getPath))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val dir = namespace.foldLeft(warehouse)((p, s) => new Path(p, s))
      fs.exists(dir) && !isTable(dir)
    }

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    fs.mkdirs(namespace.foldLeft(warehouse)((p, s) => new Path(p, s)))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE")

  override def dropNamespace(namespace: Array[String], cascade: Boolean)
      : Boolean = {
    val dir = namespace.foldLeft(warehouse)((p, s) => new Path(p, s))
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty) sys.error(
      s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(dir, true)
  }
}

/** One catalog-resolved snapshot of a versioned table. Reads delegate
  * to Spark's `ParquetTable` over the manifest's file list (pinned at
  * load — concurrent commits never disturb a running query); writes
  * and deletes run the [[VersionedTable]] protocol. Time-traveled
  * loads (`version` set) are read-only. */
private[sources] class GraftSqlTable(ident: String, root: String,
    version: Option[Int])
    extends Table with SupportsRead with SupportsWrite
    with SupportsDelete {

  private def spark = SparkSession.active

  // dirs pinned at load time = snapshot isolation for SQL reads
  private lazy val inner: ParquetTable = {
    val v = version.getOrElse(VersionedTable.latestVersion(spark, root))
    require(v >= 0, s"table $ident has no committed version")
    val dirs = VersionedTable.dataDirs(spark, root, Some(v))
    ParquetTable(s"graft $ident", spark, CaseInsensitiveStringMap.empty(),
      dirs,
      userSpecifiedSchema = VersionedTable.manifestSchema(spark, root, v),
      fallbackFileFormat = classOf[ParquetFileFormat])
  }

  override def name(): String =
    ident + version.map(v => s"@v$v").getOrElse("")

  override def schema(): StructType = inner.schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = inner.newScanBuilder(options)

  private def requireWritable(what: String): Unit =
    require(version.isEmpty,
      s"$what on $name: a time-traveled snapshot is read-only — " +
        "RESTORE the table to this version instead")

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireWritable("write")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ow: Boolean): Unit = {
              val s = data.sparkSession
              val latest = VersionedTable.latestVersion(s, root)
              if (overwrite || ow)
                VersionedTable.commit(s, root, data, latest)
              else VersionedTable.append(s, root, data, latest)
            }
          }
      }
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    version.isEmpty && filters.forall(f => toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    requireWritable("DELETE")
    val cond = filters.foldLeft(lit(true)) { (acc, f) =>
      acc && toColumn(f).getOrElse(sys.error(
        s"unconvertible delete filter $f — canDeleteWhere lied"))
    }
    VersionedTable.delete(spark, root, cond)
  }

  // pushed v1 Filters → the engine's Column predicate; None =
  // untranslatable (refused at analysis via canDeleteWhere)
  private def toColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case sources.Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case sources.Not(c) => toColumn(c).map(not)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
