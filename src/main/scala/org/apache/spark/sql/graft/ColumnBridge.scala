package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ catalyst Expression bridge private[sql]
  * (Columns now wrap ColumnNodes for Connect compatibility). Extension
  * libraries that ship native Expressions need this one-hop shim — the
  * same pattern Spark connector/extension projects use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
