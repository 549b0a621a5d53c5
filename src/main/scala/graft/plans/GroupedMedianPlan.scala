package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.types.UTF8String

/** The exact grouped median as a FIRST-CLASS PHYSICAL OPERATOR — the
  * full custom-operator stack (LogicalPlan node → SparkStrategy →
  * SparkPlan) the extension ladder reserves for whole-operator
  * semantics, demonstrated on the one operator this engine already
  * argued built-ins cannot express scale-safely (ops.GroupedMedian's
  * Scaladoc: few groups × many near-unique values ⇒ every declarative
  * spelling funnels each group through one sort task).
  *
  * Where `ops.GroupedMedian` drops to the RDD API behind a function
  * call, this node participates in PLANNING: it declares its
  * distribution requirement (`OrderedDistribution` on (group, value))
  * so EnsureRequirements inserts the range-partitioning exchange + the
  * in-partition sort — the engine's own machinery builds the layout,
  * AQE sizes it, and EXPLAIN shows `GroupedMedianExec` like any
  * built-in operator. The exec then runs the same two-pass prefix-sum
  * walk over the sorted runs: pass 1 collects per-(partition, group)
  * row counts (#partitions × #groups longs — the documented few-groups
  * premise), the driver computes ⌈n/2⌉ target ranks and per-partition
  * prefix offsets, pass 2 emits the covering row per group. Median
  * values pass through UNTOUCHED, so the result hash-matches q23/q27's
  * oracle — one ground truth, three physical strategies.
  *
  * Registered via `GraftExtensions` (injectPlannerStrategy) or
  * imperatively through `GroupedMedianPlan.exactMedian`, which adds
  * the strategy to `spark.experimental.extraStrategies` on first use.
  */
case class ExactGroupedMedian(groupAttr: Attribute, valueAttr: Attribute,
    override val output: Seq[Attribute], child: LogicalPlan) extends UnaryNode {
  // median/n originate HERE, not in the child — declare them produced
  // so the analyzer's missing-attribute check accepts the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet -- child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object GroupedMedianStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ExactGroupedMedian(g, v, out, child) =>
      GroupedMedianExec(g, v, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GroupedMedianExec(groupAttr: Attribute, valueAttr: Attribute,
    override val output: Seq[Attribute], child: SparkPlan) extends UnaryExecNode {

  // ask the planner for the scale-safe layout: range partitioning on
  // (group, value) — boundaries split WITHIN groups, so the sort
  // parallelizes over all partitions with no per-group funnel — plus
  // the matching in-partition order
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet -- child.outputSet

  private def order: Seq[SortOrder] =
    Seq(SortOrder(groupAttr, Ascending), SortOrder(valueAttr, Ascending))
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputPartitioning: Partitioning = SinglePartition

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  /** Unsafe buffers are reused per task — anything held across rows
    * (map keys, the emitted median value) must be a defensive copy. */
  private def copied(v: Any): Any = v match {
    case s: UTF8String => s.copy()
    case x => x
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val gOrd = child.output.indexWhere(_.exprId == groupAttr.exprId)
    val vOrd = child.output.indexWhere(_.exprId == valueAttr.exprId)
    require(gOrd >= 0 && vOrd >= 0, "group/value column lost from child output")
    val gType = groupAttr.dataType
    val vType = valueAttr.dataType
    val rdd = child.execute().map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-(partition, group) row counts; sorted input ⇒
      // groups are contiguous runs, LinkedHashMap keeps their order
      val perPart: Array[(Int, Seq[(Any, Long)])] =
        rdd.mapPartitionsWithIndex { (i, it) =>
          val m = mutable.LinkedHashMap[Any, Long]()
          it.foreach { r =>
            val g = r.get(gOrd, gType) match {
              case s: UTF8String => s.copy()
              case x => x
            }
            m.update(g, m.getOrElse(g, 0L) + 1L)
          }
          Iterator((i, m.toSeq))
        }.collect()
      val totals = mutable.LinkedHashMap[Any, Long]()
      perPart.sortBy(_._1).foreach { case (_, gs) =>
        gs.foreach { case (g, c) => totals.update(g, totals.getOrElse(g, 0L) + c) }
      }
      // target rank ⌈n/2⌉ per group (q23's ROW_NUMBER spelling) and
      // each partition's per-group prefix offset
      val target: Map[Any, Long] =
        totals.map { case (g, n) => g -> ((n + 1L) / 2L) }.toMap
      val offsets: Map[(Int, Any), Long] = {
        val running = mutable.Map[Any, Long]()
        perPart.sortBy(_._1).flatMap { case (i, gs) =>
          gs.map { case (g, c) =>
            val off = running.getOrElse(g, 0L)
            running.update(g, off + c)
            ((i, g), off)
          }
        }.toMap
      }
      val bOffsets = sparkContext.broadcast(offsets)
      val bTarget = sparkContext.broadcast(target)
      val bTotals = sparkContext.broadcast(totals.toMap)
      // pass 2: each partition walks its sorted run with its offset and
      // emits the row whose cumulative range covers the target — at
      // most one row per (partition, group); eager, so the persisted
      // RDD can be released before returning
      val medians: Array[(Any, Any, Long)] =
        rdd.mapPartitionsWithIndex { (i, it) =>
          val cum = mutable.Map[Any, Long]()
          it.flatMap { r =>
            val g = r.get(gOrd, gType) match {
              case s: UTF8String => s.copy()
              case x => x
            }
            val before = cum.getOrElse(g, bOffsets.value.getOrElse((i, g), 0L))
            val after = before + 1L
            cum.update(g, after)
            val t = bTarget.value(g)
            if (before < t && t <= after) {
              val v = r.get(vOrd, vType) match {
                case s: UTF8String => s.copy()
                case x => x
              }
              Iterator.single((g, v, bTotals.value(g)))
            } else Iterator.empty
          }
        }.collect()
      // |groups| result rows, emitted as UnsafeRows on one partition
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val rows = medians.map { case (g, v, n) =>
        proj(new GenericInternalRow(Array[Any](g, v, n))).copy()
          .asInstanceOf[InternalRow]
      }
      sparkContext.parallelize(rows.toIndexedSeq, 1)
    } finally rdd.unpersist(blocking = false)
  }
}

object GroupedMedianPlan {

  /** (group, median, n) per group — `ops.GroupedMedian.exactMedian`
    * semantics, executed by the planner through [[GroupedMedianExec]].
    * Adds [[GroupedMedianStrategy]] to the session's extra strategies
    * on first use (a no-op when GraftExtensions already injected it). */
  def exactMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val child = org.apache.spark.sql.graft.PlanBridge.analyzed(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val g = attr(groupCol)
    val v = attr(valueCol)
    val out = Seq(g,
      AttributeReference("median", v.dataType, v.nullable)(),
      AttributeReference("n", LongType, nullable = false)())
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      ExactGroupedMedian(g, v, out, child))
  }

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupedMedianStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedMedianStrategy
}
