package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native Catalyst expression: probe a serialized Count-Min sketch for
  * a key's estimated count — the missing read half of the built-in
  * `count_min_sketch` aggregate (Spark ships the writer but no SQL
  * probe; estimates are otherwise driver-side only via the Java API).
  *
  * The sketch operand must be a CONSTANT per query — a literal or a
  * scalar-subquery result (the `Dataset.scalar()` spelling
  * ops.BloomPrune uses for its Bloom sketch, and the same contract
  * Spark's own BloomFilterMightContain enforces): it is deserialized
  * ONCE per task into a `@transient lazy val`, never per row. The key
  * operand is LongType — callers hash arbitrary keys with `xxhash64`
  * on BOTH the build and probe side, exactly the BloomPrune
  * discipline, so build/probe item encodings can never diverge.
  *
  * A NULL sketch or NULL key yields NULL. (An EMPTY build input is
  * not NULL: count_min_sketch serializes the empty sketch — unlike
  * BloomFilterAggregate — so estimates are 0, the correct count for a
  * corpus with no items.) Estimates carry the CMS one-sided
  * guarantee: never below the true count, above it by at most eps·N
  * with the configured confidence.
  *
  * Reference counterpart: none (SURVEY.md §2.3 extension surface).
  */
case class CmsEstimateCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // integral keys coerce to bigint like Spark built-ins; the binary
  // sketch operand additionally has to be constant-per-query, which
  // no cast rule can express — checked after the type coercion pass
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] = Seq(BinaryType, LongType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val typed = super.checkInputDataTypes()
    if (typed.isFailure) typed
    else left match {
      case e if e.foldable => TypeCheckResult.TypeCheckSuccess
      case _: PlanExpression[_] => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "the sketch input to cms_estimate_count must be a constant " +
          "or a scalar subquery (it is deserialized once per task)")
    }
  }

  // constant by contract (checked above): deserialize once, reuse for
  // every row of every batch this task evaluates
  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval(InternalRow.empty)
    if (bytes == null) null
    else CountMinSketch.readFrom(
      new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  override def eval(input: InternalRow): Any = {
    if (sketch == null) return null
    val v = right.eval(input)
    if (v == null) null
    else sketch.estimateCount(java.lang.Long.valueOf(v.asInstanceOf[Long]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (sketch == null) {
      // empty build side: the whole expression is constant NULL
      ev.copy(isNull = TrueLiteral,
        value = JavaCode.defaultLiteral(dataType))
    } else {
      val sk = ctx.addReferenceObj("cmsSketch", sketch,
        classOf[CountMinSketch].getName)
      val keyEval = right.genCode(ctx)
      ev.copy(code =
        code"""
           |${keyEval.code}
           |boolean ${ev.isNull} = ${keyEval.isNull};
           |long ${ev.value} = -1L;
           |if (!${ev.isNull}) {
           |  ${ev.value} = $sk.estimateCount(
           |    java.lang.Long.valueOf(${keyEval.value}));
           |}
         """.stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimateCount {
  /** Column wrapper: estimated count of `key` (a LongType hash) in the
    * constant/scalar-subquery `sketch`. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimateCount(
      ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
}
