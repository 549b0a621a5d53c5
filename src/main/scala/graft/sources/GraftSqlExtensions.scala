package graft.sources

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** `SparkSessionExtensions` wiring for the versioned-table MAINTENANCE
  * statements SQL has no stock spelling for — the same extension
  * mechanism (and, deliberately, the same statement shapes) Delta
  * ships:
  *
  * {{{
  *   spark.sql.extensions = graft.sources.GraftSqlExtensions
  *
  *   OPTIMIZE graft.docs                           -- compact
  *   OPTIMIZE graft.docs ZORDER BY (a, b) [INTO 8 FILES]
  *   VACUUM graft.docs [RETAIN 24 HOURS] [KEEP 5 VERSIONS]
  *     [RESPECT CONSUMERS [MAX LAG 100]]           -- floor-widened keep
  *   RESTORE TABLE graft.docs TO VERSION AS OF 3
  *   ANALYZE TABLE graft.docs COMPUTE STATISTICS [FOR ALL COLUMNS
  *     | FOR COLUMNS a, b]                         -- NDV (re)pin
  *   CREATE MATERIALIZED VIEW graft.mv AS
  *     SELECT k, count(*) AS c FROM graft.docs GROUP BY k
  *   REFRESH MATERIALIZED VIEW graft.mv [FULL]     -- O(delta) fold
  *   ALTER MATERIALIZED VIEW graft.mv FOLLOW [STOP]-- per-commit stream
  *   OPTIMIZE graft.docs REFS                      -- fold file refs
  *   ALTER TABLE graft.docs CLUSTER BY (a, b)      -- range-cluster pin
  *   ALTER TABLE graft.docs CLUSTER BY NONE
  *   ALTER TABLE graft.docs SET CONSUMER FLOOR 'id' TO 3
  * }}}
  *
  * The injected parser intercepts EXACTLY these statement
  * shapes (anchored, case-insensitive) and delegates every other
  * string to Spark's parser untouched — `injectParser` composes, so
  * the extension is invisible to normal SQL. Each statement resolves
  * its identifier through the session's CatalogManager and refuses
  * loudly unless the catalog is a [[GraftCatalog]]; execution is the
  * corresponding programmatic [[VersionedTable]] operation (one
  * source of truth, two spellings).
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // CDF through pure SQL — Delta's TVF spelling plus a
    // collision-proof alias (TVF registration is name-keyed, so in a
    // mixed session where another extension also claims
    // `table_changes` the alias still reaches the graft feed):
    //   SELECT * FROM table_changes('cat.tbl', 2)        -- tail from v2
    //   SELECT * FROM table_changes('cat.tbl', 0, 5)     -- replay..v5
    Seq("table_changes", "graft_table_changes").foreach { name =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(GraftTableChanges.getClass.getName, name),
        GraftTableChanges.plan _))
    }
  }
}

/** `table_changes(table, startingVersion[, endingVersion])` — the SQL
  * table-valued spelling of [[VersionedTable.changeFeed]] (inclusive
  * version bounds, Delta's argument shape; versions only — graft
  * manifests are version-addressed, use `tbl$history` to map
  * timestamps). The vocabulary follows the table's CDC pin exactly as
  * the streaming seam does: with `graft.changeFeed.key` set the feed
  * speaks keyed pre/post images (served from commit-time change files
  * where materialized), otherwise plain insert/delete rows. Arguments
  * must be literals — the feed's version range shapes the PLAN, so it
  * is resolved once at analysis time, not per row. */
object GraftTableChanges {

  def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      "table_changes(table, startingVersion[, endingVersion]) takes " +
        s"2 or 3 arguments, got ${args.size}")
    val spark = SparkSession.active
    def litVal(e: Expression, what: String): Any = {
      require(e.foldable,
        s"table_changes: $what must be a literal, got ${e.sql}")
      val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      require(v != null, s"table_changes: $what must not be NULL")
      v
    }
    def intVal(e: Expression, what: String): Int =
      litVal(e, what) match {
        case i: Int => i
        case l: Long => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other => throw new IllegalArgumentException(
          s"table_changes: $what must be an integer version, got $other")
      }
    val name = litVal(args.head, "table name").toString
    val start = intVal(args(1), "startingVersion")
    val end = args.lift(2).map(intVal(_, "endingVersion"))
    val root = GraftSqlParser.resolveRoot(spark,
      GraftSqlParser.parts(name))
    val key = VersionedTable.changeFeedKey(spark, root)
    VersionedTable.changeFeed(spark, root, start, end, key)
      .queryExecution.analyzed
  }
}

/** Delegating parser: three maintenance statements, everything else
  * verbatim to Spark's parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText)
      // claim the statement ONLY when its target resolves to a graft
      // catalog — in a mixed session (graft + Delta extensions), an
      // OPTIMIZE/VACUUM/RESTORE aimed at another catalog must fall
      // through to the next parser instead of failing here
      .filter(cmd => GraftSqlParser.isGraftTarget(cmd.nameParts))
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): org.apache.spark.sql.types
    .DataType = delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  // identifiers: dotted parts, each a bare word or `backtick-quoted`
  private val Ident = """((?:(?:`[^`]+`|\w+)\.)*(?:`[^`]+`|\w+))"""

  private val OptimizeRe: Regex =
    (s"""(?is)\\s*OPTIMIZE\\s+$Ident""" +
      """(?:\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?)?\s*;?\s*""").r

  private val VacuumRe: Regex =
    (s"""(?is)\\s*VACUUM\\s+$Ident""" +
      """(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?""" +
      """(?:\s+KEEP\s+(\d+)\s+VERSIONS)?""" +
      """(?:\s+(RESPECT\s+CONSUMERS)(?:\s+MAX\s+LAG\s+(\d+))?)?""" +
      """(\s+DRY\s+RUN)?\s*;?\s*""").r

  private val RestoreRe: Regex =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Ident""" +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r

  private val AnalyzeRe: Regex =
    (s"""(?is)\\s*ANALYZE\\s+TABLE\\s+$Ident""" +
      """\s+COMPUTE\s+STATISTICS""" +
      """(?:\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+([\w`\s,]+?)))?""" +
      """\s*;?\s*""").r

  private val CreateMvRe: Regex =
    (s"""(?is)\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+$Ident""" +
      """\s+AS\s+(.+?)\s*;?\s*""").r

  private val RefreshMvRe: Regex =
    (s"""(?is)\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+$Ident""" +
      """(\s+FULL)?\s*;?\s*""").r

  private val AlterMvFollowRe: Regex =
    (s"""(?is)\\s*ALTER\\s+MATERIALIZED\\s+VIEW\\s+$Ident""" +
      """\s+FOLLOW(\s+STOP)?\s*;?\s*""").r

  private val AlterClusterRe: Regex =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ident""" +
      """\s+CLUSTER\s+BY\s+(?:(NONE)|(ZORDER\s+)?""" +
      """\(\s*([\w`\s,]+?)\s*\))\s*;?\s*""").r

  private val CompactRefsRe: Regex =
    (s"""(?is)\\s*OPTIMIZE\\s+$Ident\\s+REFS\\s*;?\\s*""").r

  private val ConsumerFloorRe: Regex =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ident""" +
      """\s+SET\s+CONSUMER\s+FLOOR\s+'([^']+)'\s+TO\s+(\d+)\s*;?\s*""").r

  private[sources] def parts(ident: String): Seq[String] =
    ident.split('.').toSeq.map(p =>
      if (p.startsWith("`") && p.endsWith("`")) p.drop(1).dropRight(1)
      else p)

  /** True when `nameParts` names a table under a registered
    * [[GraftCatalog]] — the parse-time claim check: statements aimed
    * anywhere else fall through to the delegate parser. Resolution
    * failures (unknown catalog, unqualified name) count as NOT ours. */
  private[sources] def isGraftTarget(nameParts: Seq[String]): Boolean =
    nameParts.length >= 2 && scala.util.Try(
      SparkSession.active.sessionState.catalogManager
        .catalog(nameParts.head)).toOption.exists(_.isInstanceOf[GraftCatalog])

  private[sources] def parseMaintenance(sqlText: String)
      : Option[LogicalPlan with GraftMaintenanceCommand] = sqlText match {
    case OptimizeRe(ident, zcolA, zcolB, nFiles) =>
      Some(GraftOptimizeCommand(parts(ident),
        Option(zcolA).map(a => (a, zcolB)),
        Option(nFiles).map(_.toInt)))
    case VacuumRe(ident, hours, keep, respect, maxLag, dryRun) =>
      val respectConsumers: Option[Option[Int]] =
        if (respect == null) None
        else Some(Option(maxLag).map(m => m.toIntOption.getOrElse(
          throw new IllegalArgumentException(
            s"MAX LAG $m is out of range — versions are Ints"))))
      if (dryRun != null)
        Some(GraftVacuumPreviewCommand(parts(ident),
          Option(hours).map(_.toDouble), Option(keep).map(_.toInt),
          respectConsumers))
      else Some(GraftVacuumCommand(parts(ident),
        Option(hours).map(_.toDouble), Option(keep).map(_.toInt),
        respectConsumers))
    case RestoreRe(ident, version) =>
      Some(GraftRestoreCommand(parts(ident), version.toInt))
    case AnalyzeRe(ident, all, colList) =>
      val cols =
        if (all != null || colList == null) Seq.empty
        else colList.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
      Some(GraftAnalyzeCommand(parts(ident), cols))
    case CreateMvRe(ident, query) =>
      Some(GraftCreateMaterializedViewCommand(parts(ident), query))
    case RefreshMvRe(ident, full) =>
      Some(GraftRefreshMaterializedViewCommand(parts(ident),
        full != null))
    case AlterMvFollowRe(ident, stop) =>
      Some(GraftMvFollowCommand(parts(ident), stop != null))
    case CompactRefsRe(ident) =>
      Some(GraftCompactRefsCommand(parts(ident)))
    case AlterClusterRe(ident, none, zorder, colList) =>
      val cols =
        if (none != null) Seq.empty
        else colList.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
      Some(GraftClusterByCommand(parts(ident), cols, zorder != null))
    case ConsumerFloorRe(ident, consumer, floor) =>
      // the regex admits any digit run; an out-of-Int-range floor must
      // refuse descriptively, not leak a raw NumberFormatException
      Some(GraftConsumerFloorCommand(parts(ident), consumer,
        floor.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"consumer floor $floor is out of range — versions are Ints " +
            s"(<= ${Int.MaxValue})"))))
    case _ => None
  }

  /** Like [[resolveRoot]] but for a table that need not exist yet
    * (CREATE MATERIALIZED VIEW's target). */
  private[sources] def resolveNewRoot(spark: SparkSession,
      nameParts: Seq[String]): String = {
    require(nameParts.length >= 2,
      s"qualify the view as <catalog>.<name>, got " +
        nameParts.mkString("."))
    spark.sessionState.catalogManager.catalog(nameParts.head) match {
      case g: GraftCatalog =>
        g.newTableRoot(org.apache.spark.sql.connector.catalog.Identifier
          .of(nameParts.tail.init.toArray, nameParts.last))
      case other => throw new IllegalArgumentException(
        s"${nameParts.head} is not a graft catalog " +
          s"(${other.getClass.getName})")
    }
  }

  /** Resolve `catalog.ns...tbl` to the table's filesystem root via
    * the registered [[GraftCatalog]]; loud refusal otherwise. */
  private[sources] def resolveRoot(spark: SparkSession,
      nameParts: Seq[String]): String = {
    require(nameParts.length >= 2,
      s"qualify the table as <catalog>.<table>, got " +
        nameParts.mkString("."))
    val cat = spark.sessionState.catalogManager.catalog(nameParts.head)
    cat match {
      case g: GraftCatalog =>
        val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
          nameParts.tail.init.toArray, nameParts.last)
        g.tableRoot(ident)
      case other => throw new IllegalArgumentException(
        s"${nameParts.head} is not a graft catalog " +
          s"(${other.getClass.getName}) — OPTIMIZE/VACUUM/RESTORE " +
          "apply to graft versioned tables only")
    }
  }
}

/** Marker for the maintenance commands: exposes the parsed target so
  * the parser can decide at parse time whether the statement is ours. */
sealed trait GraftMaintenanceCommand { def nameParts: Seq[String] }

/** `OPTIMIZE t` (compact the snapshot into one commit dir) or
  * `OPTIMIZE t ZORDER BY (a, b) [INTO n FILES]` (Z-order-cluster the
  * snapshot — [[VersionedTable.optimize]]); returns the committed
  * version. Default file count for ZORDER: the snapshot's current
  * data-file census (re-clustering keeps sizing), floor 1. */
case class GraftOptimizeCommand(nameParts: Seq[String],
    zorder: Option[(String, String)], nFiles: Option[Int])
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    val v = zorder match {
      case None => VersionedTable.compact(spark, root)
      case Some(cols) =>
        val n = nFiles.getOrElse(math.max(1,
          VersionedTable.statsByDir(spark, root).values.map(_.size).sum))
        VersionedTable.optimize(spark, root, cols, n)
    }
    Seq(Row(v.toLong))
  }
}

/** `VACUUM t [RETAIN h HOURS] [KEEP n VERSIONS]
  * [RESPECT CONSUMERS [MAX LAG m]]` — [[VersionedTable.vacuum]] with
  * Delta's retention spelling (default 1 hour, keep 1 version).
  * RESPECT CONSUMERS is the OPT-IN other half of the advisory floor
  * registry: the keep horizon widens so every registered floor stays
  * satisfiable, each honored up to at most `m` versions of lag (a
  * floor lagging further clamps — an abandoned consumer id must not
  * pin storage forever; omit MAX LAG only when every registered id
  * is curated). Plain VACUUM stays advisory-blind by design. The
  * status row reports the effective keep and the clamp census, so
  * the operator sees what the registry actually changed. */
case class GraftVacuumCommand(nameParts: Seq[String],
    retainHours: Option[Double], keepVersions: Option[Int],
    respectConsumers: Option[Option[Int]] = None)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("status", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    val requested = keepVersions.getOrElse(1)
    val (keep, status) = respectConsumers match {
      case None => (requested, "OK")
      case Some(maxLag) =>
        val (k, respected, clamped) = VersionedTable
          .consumerKeepVersions(spark, root, requested, maxLag)
        (k, s"OK keep=$k (respected $respected consumer floor(s), " +
          s"$clamped clamped by MAX LAG)")
    }
    VersionedTable.vacuum(spark, root,
      keepVersions = keep,
      retainMillis = retainHours.map(h => (h * 3600 * 1000).toLong)
        .getOrElse(3600L * 1000L))
    Seq(Row(status))
  }
}

/** `VACUUM t [...] DRY RUN` — what vacuum WOULD delete, one row per
  * aged-out unreferenced commit dir ([[VersionedTable.vacuumPreview]]);
  * deletes nothing. */
case class GraftVacuumPreviewCommand(nameParts: Seq[String],
    retainHours: Option[Double], keepVersions: Option[Int],
    respectConsumers: Option[Option[Int]] = None)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("commit_dir", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    // "dir" = the whole dir drops; "files" = the dir SURVIVES its
    // carried file refs and only the listed replaced files sweep;
    // "changes" = an aged-out/orphaned CDC change entry — without
    // the discriminator a DBA would read a file-level sweep row as
    // whole-dir data loss
    AttributeReference("scope", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    val requested = keepVersions.getOrElse(1)
    // the DRY RUN previews exactly what the destructive spelling
    // would do — including the consumer-widened keep horizon
    val keep = respectConsumers match {
      case None => requested
      case Some(maxLag) => VersionedTable
        .consumerKeepVersions(spark, root, requested, maxLag)._1
    }
    VersionedTable.vacuumPreview(spark, root,
      keepVersions = keep,
      retainMillis = retainHours.map(h => (h * 3600 * 1000).toLong)
        .getOrElse(3600L * 1000L)).collect().toSeq
  }
}

/** `RESTORE TABLE t TO VERSION AS OF v` — metadata-only roll-forward
  * ([[VersionedTable.restore]]); returns the new version. */
case class GraftRestoreCommand(nameParts: Seq[String], toVersion: Int)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    Seq(Row(VersionedTable.restore(spark, root, toVersion).toLong))
  }
}

/** `CREATE MATERIALIZED VIEW g.mv AS SELECT k..., agg(x) AS a...
  * FROM g.base [WHERE p] GROUP BY k...` — the warehouse spelling of
  * [[MaterializedView.create]]. The query is ANALYZED by Spark and
  * must be exactly one GROUP BY aggregate over one graft table with
  * at most one deterministic row filter — no JOIN/HAVING (a join
  * delta re-pairs against the other side's full history, which IS
  * the recompute). Supported aggregates: `count(*)`, `sum`, `avg`
  * (exact under every change type), `min`/`max`/
  * `approx_count_distinct` (insert-only — see [[MaterializedView]]).
  * Every aggregate needs an alias (it names the view column);
  * `count(DISTINCT x)` refuses, naming approx_count_distinct. The
  * view lands at the catalog's `<warehouse>/<name>` root as a
  * versioned table whose SERVED columns are materialized, so plain
  * `SELECT ... FROM g.mv` reads the aggregate (the `__mv_*`
  * accumulator columns ride behind them); `DROP TABLE g.mv` removes
  * it. Returns the base version the view reflects. */
case class GraftCreateMaterializedViewCommand(nameParts: Seq[String],
    query: String)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("base_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    import MaterializedView._

    val mvRoot = GraftSqlParser.resolveNewRoot(spark, nameParts)
    def refuse(why: String): Nothing = throw new IllegalArgumentException(
      "CREATE MATERIALIZED VIEW: " + why +
        " — the view must be one GROUP BY aggregate (count(*)/sum/avg/" +
        "min/max/approx_count_distinct, each aliased) over one graft " +
        "table with at most one deterministic WHERE")
    @scala.annotation.tailrec
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => unwrap(c)
      case other => other
    }
    def attrOf(e: Expression): String = e match {
      case a: AttributeReference => a.name
      case c: Cast => attrOf(c.child)
      case other => refuse(s"aggregate input must be a bare column, " +
        s"got ${other.sql}")
    }
    val analyzed = spark.sql(query).queryExecution.analyzed
    unwrap(analyzed) match {
      case Aggregate(groupingExprs, aggExprs, child, _) =>
        // one optional row FILTER between the aggregate and the table
        // is foldable (σ commutes with the signed fold — see
        // MaterializedView.create's where contract); anything else
        // (joins, projections, nested aggregates) refuses
        val (whereSql, relPlan) = unwrap(child) match {
          case org.apache.spark.sql.catalyst.plans.logical
            .Filter(cond, c) =>
            // strip qualifiers before rendering: `gext.mvbase.x`
            // would not re-parse against the bare base frame the
            // stored predicate is later applied to
            val bare = cond.transform {
              case a: AttributeReference => a.withQualifier(Seq.empty)
            }
            (Some(bare.sql), unwrap(c))
          case other => (None, other)
        }
        val rel = relPlan match {
          case r: DataSourceV2Relation => r
          case other => refuse(
            s"FROM must be a graft table (with at most one WHERE), " +
              s"got ${other.nodeName}")
        }
        val baseRoot = (rel.catalog, rel.identifier) match {
          case (Some(g: GraftCatalog), Some(id)) => g.tableRoot(id)
          case _ => refuse("the base table is not in a graft catalog")
        }
        val keys = groupingExprs.map {
          case a: AttributeReference => a.name
          case other => refuse(
            s"GROUP BY keys must be bare columns, got ${other.sql}")
        }
        val keySet = keys.map(_.toLowerCase).toSet
        val aggs = aggExprs.flatMap {
          case a: AttributeReference if keySet(a.name.toLowerCase) =>
            None // group key projected under its own name
          case Alias(ae: AggregateExpression, name) =>
            if (ae.isDistinct) refuse(
              s"'$name' aggregates DISTINCT — exact distinct counts " +
                "are not incrementally maintainable; use " +
                "approx_count_distinct")
            Some(ae.aggregateFunction match {
              case c: Count if c.children.forall(_.foldable) =>
                MvCount(name)
              case _: Count => refuse(
                s"'$name' is count(col) (non-null count) — spell it " +
                  "count(*) or sum(CASE WHEN col IS NOT NULL ...)")
              case s: Sum => MvSum(attrOf(s.child), name)
              case a: Average => MvAvg(attrOf(a.child), name)
              case m: Min => MvMin(attrOf(m.child), name)
              case m: Max => MvMax(attrOf(m.child), name)
              case h: HyperLogLogPlusPlus =>
                // the view maintains a DataSketches HLL at lgK 12
                // (±~1.6%); silently serving that for a tighter
                // requested precision would be a semantic lie
                if (h.relativeSD < 0.016) refuse(
                  s"'$name' requests approx_count_distinct at " +
                    s"relativeSD=${h.relativeSD}, tighter than the " +
                    "view's maintained sketch (~0.016 at lgK 12) — " +
                    "omit the precision argument")
                MvHllCount(attrOf(h.child), name)
              case other => refuse(
                s"'$name' uses ${other.prettyName}, which has no " +
                  "incremental accumulator here")
            })
          case other => refuse(s"output '${other.name}' is neither a " +
            "group key under its own name nor an aliased aggregate")
        }
        if (aggs.isEmpty) refuse("no aggregates in the SELECT list")
        // the served view is ALWAYS keys-then-aggregates; a SELECT
        // list that omits a group key (or reorders columns) would
        // silently diverge from the shape the view actually serves —
        // require every key to appear under its own name instead
        val projectedKeys = aggExprs.collect {
          case a: AttributeReference if keySet(a.name.toLowerCase) =>
            a.name.toLowerCase
        }.toSet
        val missingKeys = keys.filterNot(k => projectedKeys(k.toLowerCase))
        if (missingKeys.nonEmpty) refuse(
          s"every GROUP BY key must appear in the SELECT list under " +
            s"its own name (the view serves keys first, then " +
            s"aggregates, regardless of SELECT order); missing: " +
            missingKeys.mkString(", "))
        val v = MaterializedView.create(spark, mvRoot, baseRoot,
          keys, aggs, whereSql)
        Seq(Row(v.toLong))
      case other => refuse(s"query is ${other.nodeName}, not a GROUP " +
        "BY aggregate")
    }
  }
}

/** `REFRESH MATERIALIZED VIEW g.mv [FULL]` —
  * [[MaterializedView.refresh]] (the O(delta) change-feed fold) or,
  * with FULL, [[MaterializedView.fullRefresh]] (the recompute
  * recovery path). Returns the refresh report. */
case class GraftRefreshMaterializedViewCommand(nameParts: Seq[String],
    full: Boolean)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("from_base", LongType, nullable = false)(),
    AttributeReference("to_base", LongType, nullable = false)(),
    AttributeReference("mv_version", LongType, nullable = false)(),
    AttributeReference("refreshed",
      org.apache.spark.sql.types.BooleanType, nullable = false)(),
    AttributeReference("append_only",
      org.apache.spark.sql.types.BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    val r =
      if (full) MaterializedView.fullRefresh(spark, root)
      else MaterializedView.refresh(spark, root)
    Seq(Row(r.fromBase.toLong, r.toBase.toLong, r.mvVersion.toLong,
      r.refreshed, r.appendOnly))
  }
}

/** `ALTER MATERIALIZED VIEW g.mv FOLLOW [STOP]` — the SQL spelling
  * of [[graft.streaming.Streams.followMaterializedView]]: FOLLOW
  * starts the per-commit refresh stream (a `triggerOnly` Structured
  * Streaming query — zero-row batches, refresh reads the CDF plane)
  * and STOP ends it.
  *
  * Query-lifecycle ownership: the query registers in SPARK'S OWN
  * `StreamingQueryManager` (`spark.streams`) under a deterministic
  * name derived from the view's root — no registry of this
  * library's, so every surface a DBA already uses (`spark.streams
  * .active`, the streaming UI, `awaitAnyTermination`) sees and can
  * manage the follow, and the query dies with the session exactly
  * like any other unnamed-checkpoint stream. STOP resolves the name
  * through the same manager. Exactly-once needs no checkpoint here
  * (each refresh commits atomically with its watermark `#txn:`
  * marker, so a re-fired trigger no-ops). The intent is DURABLE even
  * though the query is not: FOLLOW arms a `_follow` marker in the
  * view root, STOP disarms it, and a restarted session re-arms every
  * marked view with one [[GraftCatalog.resumeFollows]] call — a
  * crashed warehouse session no longer silently stops following. A
  * second FOLLOW while one is active refuses, naming STOP; STOP with
  * none active refuses. */
case class GraftMvFollowCommand(nameParts: Seq[String], stop: Boolean)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("query_name", StringType, nullable = false)(),
    AttributeReference("query_id", StringType, nullable = false)(),
    AttributeReference("active",
      org.apache.spark.sql.types.BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    val name = GraftMvFollowCommand.queryNameFor(root)
    val existing = spark.streams.active.find(q => q.name == name)
    if (stop) {
      existing match {
        case Some(q) =>
          q.stop()
          // STOP (and only STOP — never a crash) clears the durable
          // follow intent, so a restarted session's resumeFollows
          // re-arms crashed follows but respects deliberate stops
          MaterializedView.disarmFollow(spark, root)
          Seq(Row(name, q.id.toString, false))
        case None if MaterializedView.followArmed(spark, root) =>
          // crashed follow: no query to stop, but the durable marker
          // is still armed — STOP means "stay stopped", so disarm it
          // directly instead of forcing the operator to FOLLOW (or
          // resumeFollows) a dead view just to stop it again
          MaterializedView.disarmFollow(spark, root)
          Seq(Row(name, "", false))
        case None => throw new IllegalStateException(
          s"no active FOLLOW for ${nameParts.mkString(".")} in this " +
            "session and no durable follow marker — start one with " +
            s"ALTER MATERIALIZED VIEW ${nameParts.mkString(".")} FOLLOW")
      }
    } else {
      existing.foreach(q => throw new IllegalStateException(
        s"${nameParts.mkString(".")} is already being followed by " +
          s"query ${q.id} — ALTER MATERIALIZED VIEW " +
          s"${nameParts.mkString(".")} FOLLOW STOP first"))
      val q = graft.streaming.Streams.followMaterializedView(
        spark, root, queryName = Some(name))
      // durable intent AFTER the successful start: a refused FOLLOW
      // must not leave a marker a later resume would act on
      MaterializedView.armFollow(spark, root)
      Seq(Row(name, q.id.toString, true))
    }
  }
}

object GraftMvFollowCommand {
  /** Deterministic per-root query name — what makes FOLLOW/STOP a
    * pure function of the view identity instead of a handle the
    * session would have to hold. */
  def queryNameFor(root: String): String =
    "graft-mv-follow-" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(new org.apache.hadoop.fs.Path(root).toString
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
}

/** `OPTIMIZE t REFS` — [[VersionedTable.compactRefs]]: fold ONLY the
  * file-granular manifest references (a DML history's fragmentation)
  * into one fresh dir at O(fragmented refs), whole dirs carried by
  * identity. Returns the committed version (unchanged when nothing
  * was fragmented). */
case class GraftCompactRefsCommand(nameParts: Seq[String])
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    Seq(Row(VersionedTable.compactRefs(spark, root).toLong))
  }
}

/** `ALTER TABLE t CLUSTER BY (c1, c2)` / `ALTER TABLE t CLUSTER BY
  * ZORDER (a, b)` / `ALTER TABLE t CLUSTER BY NONE` — the Databricks
  * liquid-clustering spelling over
  * [[VersionedTable.enableClustering]]/[[VersionedTable
  * .disableClustering]]: pin (or drop) range clustering as a table
  * property, so every engine-side write keeps the pinned columns'
  * file envelopes tight. Metadata-only; `OPTIMIZE t` after enabling
  * is the one-time migration of existing data. */
case class GraftClusterByCommand(nameParts: Seq[String],
    cols: Seq[String], zorder: Boolean = false)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    val v =
      if (cols.isEmpty) VersionedTable.disableClustering(spark, root)
      else VersionedTable.enableClustering(spark, root, cols, zorder)
    Seq(Row(v.toLong))
  }
}

/** `ALTER TABLE t SET CONSUMER FLOOR 'id' TO n` — the SQL spelling
  * of [[VersionedTable.publishConsumerFloor]]: record an advisory
  * "consumer <id> still needs version ≥ n" in the table's
  * `_consumers` registry, surfaced by `t$consumers` and counted by
  * `t$retention.consumers_behind`. */
case class GraftConsumerFloorCommand(nameParts: Seq[String],
    consumer: String, floor: Int)
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("consumer", StringType, nullable = false)(),
    AttributeReference("floor_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    VersionedTable.publishConsumerFloor(spark, root, consumer, floor)
    Seq(Row(consumer, floor.toLong))
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS | FOR COLUMNS
  * a, b]` — the DBA spelling over the NDV layer: (re)pins the sketch
  * column set ([[VersionedTable.enableNdvStats]], a fresh one-pass
  * backfill when the pin changes or pre-pin history left gaps) and
  * returns the optimizer's resulting view, one `$stats`-shaped row
  * per covered column. Row counts and min/max envelopes need no
  * ANALYZE — they are automatic at commit time; this statement only
  * governs the opt-in NDV sketches. */
case class GraftAnalyzeCommand(nameParts: Seq[String],
    cols: Seq[String])
    extends LeafRunnableCommand with GraftMaintenanceCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("min", StringType, nullable = true)(),
    AttributeReference("max", StringType, nullable = true)(),
    AttributeReference("null_count", LongType, nullable = true)(),
    AttributeReference("ndv", LongType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.resolveRoot(spark, nameParts)
    // FUSED and atomic: ONE grouped job over the snapshot re-sketches
    // the NDV family, the stored quantile pin (narrowed to surviving
    // eligible columns under schema evolution — logged) AND rebuilds
    // bloom sidecars when pinned; ONE manifest transition lands every
    // family's fresh sketches together. A failed ANALYZE leaves the
    // existing pins and sketches exactly as they were — the
    // half-applied window of the old sequential per-family repins
    // (NDV at base+1, quantiles failing at base+2) no longer exists,
    // and a dual-pinned 100 TB table pays one table read, not two.
    VersionedTable.repinStats(spark, root, cols)
    val envs = VersionedTable.columnEnvelopes(spark, root)
    val ndv = VersionedTable.tableNdv(spark, root)
      .map { case (k, v) => k.toLowerCase -> v }
    envs.toSeq.sortBy(_._1).map { case (name, cs) =>
      Row(name, cs.min.map(String.valueOf).orNull,
        cs.max.map(String.valueOf).orNull,
        cs.nullCount.map(Long.box).orNull,
        ndv.get(name.toLowerCase).map(Long.box).orNull)
    }
  }
}
