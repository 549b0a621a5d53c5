package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Spark 4 moved `Dataset.ofRows` behind the classic implementation
  * (private[sql]): libraries that contribute their own LogicalPlan
  * nodes need this one-hop shim to wrap a constructed plan back into a
  * DataFrame — the same pattern as [[ColumnBridge]] for Expressions.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (the resolved child a
    * custom operator node builds on). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** A cloned session (shared SparkContext + catalog + temp views,
    * independent conf) — `cloneSession` is private[sql] in Spark 4,
    * reached through this bridge so a caller can run ONE query under a
    * divergent conf (e.g. the bucketed commit write, which must run
    * with AQE off) without touching the live session's settings. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
