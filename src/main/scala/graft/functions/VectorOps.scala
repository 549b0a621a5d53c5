package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector arithmetic over `array<float>` / `array<double>`
  * columns — the embedding hot path.
  *
  * The higher-order-function spelling
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) computes the same
  * values, but lambda-bearing expressions are NOT codegen-supported:
  * they run interpreted and break the WholeStageCodegen span around
  * the scan (the same finding PlanAuditSpec surfaced for q13's
  * fitness). These expressions keep similarity scoring fused: one
  * tight loop, no intermediate product array, float widening done
  * element-wise exactly like the `cast`+HOF chain, and the
  * accumulation order matches the sequential fold — results are
  * bit-identical to the HOF twins (asserted in VectorOpsSpec).
  */
private[functions] trait VectorBinaryOp extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Interpreted element read, widened to double. */
  protected def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Codegen element read, widened to double. */
  protected def elemCode(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Σ a(i)·b(i) over min(len) elements (zip_with semantics: the HOF
  * twin null-pads the shorter side, making those products null and the
  * fold null — we instead stop at the shorter length; callers in this
  * library always pass equal-length vectors). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryOp {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(x, i, fx) * elem(y, i, fy); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${elemCode(x, i, elemIsFloat(left))} *
         |    ${elemCode(y, i, elemIsFloat(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProduct = copy(left = l, right = r)

  override def prettyName: String = "dot_product"
}

/** cos(a, b) = a·b / (|a|·|b|); NULL for a zero-norm side (the
  * try_divide discipline — a direction-less vector cannot rank). */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryOp {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += elem(x, i, fx) * elem(y, i, fy); i += 1 }
    // norms over each side's FULL length, matching dot(a,a)/dot(b,b)
    var aa = 0.0
    i = 0
    while (i < x.numElements()) { val v = elem(x, i, fx); aa += v * v; i += 1 }
    var bb = 0.0
    i = 0
    while (i < y.numElements()) { val v = elem(y, i, fy); bb += v * v; i += 1 }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val v = ctx.freshName("v")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${elemCode(x, i, elemIsFloat(left))} *
         |    ${elemCode(y, i, elemIsFloat(right))};
         |}
         |double $aa = 0.0;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  double $v = ${elemCode(x, i, elemIsFloat(left))};
         |  $aa += $v * $v;
         |}
         |double $bb = 0.0;
         |for (int $i = 0; $i < $y.numElements(); $i++) {
         |  double $v = ${elemCode(y, i, elemIsFloat(right))};
         |  $bb += $v * $v;
         |}
         |double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CosineSim = copy(left = l, right = r)

  override def prettyName: String = "cosine_sim"
}

object VectorOps {

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register both for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
  }
}
