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
}
