package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable

import graft.sources.VersionedTable

/** Metadata-only COUNT(*) for `graft-versioned` DSv2 scans — the
  * optimizer half of [[graft.sources.VersionedTable.rowCount]]
  * (Delta's stats-based count): an ungrouped, unfiltered
  * `count(*)`/`count(1)` over a graft-versioned relation whose
  * manifest stats cover EVERY file folds to a one-row LocalRelation,
  * so the query never touches storage — at 10^5 files the difference
  * between a manifest read and a cluster job.
  *
  * Strictly conservative match: global aggregate (no grouping), every
  * aggregate expression a non-distinct, unfiltered `Count(1)` (the
  * shape both `count(*)` and `count(1)` parse to), relation
  * un-filtered (a Filter above still matches the UNFILTERED child —
  * transformDown only fires on the Aggregate-over-relation shape, and
  * a Filter between them blocks it), and [[VersionedTable.rowCount]]
  * returns Some — any file without a recorded row count (pre-stats
  * commits) disables the rewrite rather than risking a wrong count.
  * The column-pruning Project the optimizer inserts between the two
  * is matched through when it projects no computed columns.
  */
case class VersionedCountRule() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if countsOnly(aggExprs) && relationOf(child).isDefined =>
      val rel = relationOf(child).get
      val root = rel.options.get("path")
      val version = Option(rel.options.get("versionAsOf")).map(_.trim.toInt)
      val spark = SparkSession.active
      scala.util.Try(VersionedTable.rowCount(spark, root, version))
        .toOption.flatten match {
        case None => agg
        case Some(n) =>
          LocalRelation(
            agg.output.map(_.asInstanceOf[
              org.apache.spark.sql.catalyst.expressions.AttributeReference]),
            Seq(InternalRow.fromSeq(aggExprs.map(_ => n))))
      }
  }

  // every output is count(1): non-distinct, unfiltered, Complete
  private def countsOnly(exprs: Seq[org.apache.spark.sql.catalyst
      .expressions.NamedExpression]): Boolean =
    exprs.nonEmpty && exprs.forall {
      case Alias(AggregateExpression(
        Count(Seq(Literal(1, _))), Complete, false, None, _), _) => true
      case _ => false
    }

  // the relation, looked through a pass-through Project (column
  // pruning inserts one); a Filter anywhere blocks the match
  private def relationOf(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan match {
      case r: DataSourceV2Relation if eligible(r) => Some(r)
      case Project(projectList, r: DataSourceV2Relation)
          if eligible(r) && projectList.forall(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
        Some(r)
      case _ => None
    }

  private def eligible(rel: DataSourceV2Relation): Boolean =
    (rel.table.isInstanceOf[ParquetTable] ||
      rel.table.isInstanceOf[graft.sources.SnapshotStatsTable]) &&
      rel.table.name.startsWith("graft-versioned ") &&
      rel.options.get("path") != null &&
      // timestampAsOf resolves to a version at getTable time, which
      // this rule cannot recover — only rewrite the two spellings
      // whose version is derivable here
      rel.options.get("timestampAsOf") == null
}
