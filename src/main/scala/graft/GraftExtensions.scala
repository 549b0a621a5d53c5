package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.PopCountArray
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine's native
  * functions available to ANY session via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`), the standard way a
  * Spark-native library ships custom Catalyst expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("popcount_array"),
      new ExpressionInfo(classOf[PopCountArray].getName, "popcount_array"),
      (exprs: Seq[Expression]) => PopCountArray(exprs.head)))
  }
}
