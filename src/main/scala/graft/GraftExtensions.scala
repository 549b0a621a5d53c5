package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CmsEstimateCount, CosineSim, DotProduct, MinHashSignature, PopCountArray, SimHash64, ZOrderInterleave}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: makes the engine's native
  * functions available to ANY session via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`), the standard way a
  * Spark-native library ships custom Catalyst expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // planner extension: pure range-condition joins become binned
    // equi-joins (plans.RangeJoinRewrite) instead of nested loops
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite())
    // physical-operator extension: plans.ExactGroupedMedian logical
    // nodes execute as GroupedMedianExec (range-partitioned two-pass
    // prefix sums)
    e.injectPlannerStrategy(_ => graft.plans.GroupedMedianStrategy)
    e.injectFunction((
      new FunctionIdentifier("popcount_array"),
      new ExpressionInfo(classOf[PopCountArray].getName, "popcount_array"),
      (exprs: Seq[Expression]) => PopCountArray(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(arr, Literal(k: Int, IntegerType)) => MinHashSignature(arr, k)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(array<string>, k) requires a literal int k")
      }))
    e.injectFunction((
      new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrderInterleave].getName, "zorder2"),
      (exprs: Seq[Expression]) => ZOrderInterleave(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("cms_estimate_count"),
      new ExpressionInfo(classOf[CmsEstimateCount].getName, "cms_estimate_count"),
      (exprs: Seq[Expression]) => CmsEstimateCount(exprs(0), exprs(1))))
  }
}
