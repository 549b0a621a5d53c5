package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** Manifest-stats FILE SKIPPING for `graft-versioned` DSv2 scans —
  * the optimizer half of [[graft.sources.DataSkipping]] (Delta's
  * PrepareDeltaScan posture): when a Filter sits on a graft-versioned
  * parquet relation, re-resolve the relation's commit dirs against
  * the table's `#file:` stats envelopes and swap in a relation over
  * only the files that MAY match. Runs in the operator-optimization
  * batch, i.e. AFTER predicate pushdown has collected the query's
  * filters against the relation and BEFORE V2ScanRelationPushDown
  * fixes the scan's file index — exactly the window where the file
  * list is still plan-editable.
  *
  * Safety:
  *  - the Filter node is KEPT above the pruned relation, so skipping
  *    only ever removes files the envelope PROVES irrelevant —
  *    unsupported predicates degrade to no pruning, never to wrong
  *    answers (the conservative [[graft.sources.DataSkipping.mayMatch]]
  *    contract);
  *  - pruning is resolved per COMMIT DIR against the table's LATEST
  *    manifest: dirs are immutable and carry their stats lines
  *    forward verbatim, so a dir's envelope is version-independent;
  *    a pinned-time-travel relation whose dirs were since rewritten
  *    simply finds no stats (absent from the latest manifest) and
  *    passes through unpruned;
  *  - an `__graft_skip_applied` marker option stops the fixed-point
  *    batch from re-pruning its own output.
  */
case class VersionedSkipRule() extends Rule[LogicalPlan] {

  private val Applied = "__graft_skip_applied"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, rel: DataSourceV2Relation)
        if eligible(rel) && cond.deterministic =>
      val pt = parquetOf(rel.table).get
      val spark = SparkSession.active
      val root = rel.options.get("path")
      val byDir = scala.util.Try(
        VersionedTable.statsByDir(spark, root)).getOrElse(Map.empty)
      if (byDir.isEmpty) f
      else {
        val dataPrefix = new org.apache.hadoop.fs.Path(root, "data")
        var prunedAny = false
        val newPaths = pt.paths.flatMap { p =>
          val dir = new org.apache.hadoop.fs.Path(p).getName
          byDir.get(dir) match {
            case None => Seq(p) // uncovered (pre-stats era) — keep whole
            case Some(files) =>
              val keep = files.filter(fs =>
                graft.sources.DataSkipping.mayMatch(fs, cond))
              if (keep.size < files.size) prunedAny = true
              keep.map(fs => new org.apache.hadoop.fs.Path(
                dataPrefix, fs.path).toString)
          }
        }
        if (!prunedAny) f
        else {
          val opts = new java.util.HashMap[String, String](rel.options)
          opts.put(Applied, "true")
          val newOptions = new CaseInsensitiveStringMap(opts)
          val pruned = ParquetTable(pt.name, spark, newOptions, newPaths,
            userSpecifiedSchema = Some(pt.schema),
            fallbackFileFormat = classOf[ParquetFileFormat])
          f.copy(child = rel.copy(table = pruned, options = newOptions))
        }
      }
  }

  // the path connector serves its ParquetTable wrapped in a
  // stats-reporting shell; the rule sees through either shape (the
  // rule's own pruned output is a bare ParquetTable)
  private def parquetOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[ParquetTable] = t match {
    case s: graft.sources.SnapshotStatsTable => Some(s.inner)
    case p: ParquetTable => Some(p)
    case _ => None
  }

  private def eligible(rel: DataSourceV2Relation): Boolean =
    parquetOf(rel.table).isDefined &&
      rel.table.name.startsWith("graft-versioned ") &&
      rel.options.get("path") != null &&
      !rel.options.containsKey(Applied)
}
