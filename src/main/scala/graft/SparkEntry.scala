package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryPack in the engine. Each pack owns one operator
  * family from SURVEY.md §2; a pack entry appears in `queries` (Spark
  * plan) and, when SQL-expressible, in `oracleSql` (DuckDB twin) so the
  * driver's hash-compare gates it.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Relational,
    GaQueries,
    PipelineQueries,
    StreamQueries,
    BehaviorQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q4JoinChain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
