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

  // both guards match instead of casting: `nullable` can be queried
  // during analysis BEFORE checkInputDataTypes rejects a mistyped
  // plan, and an asInstanceOf here would surface a ClassCastException
  // in place of the intended clean type-check error
  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Whether a side's array may carry NULL slots. A null element makes
    * the whole result NULL — matching the HOF twin, where the
    * null product poisons the `aggregate` fold. The check is emitted
    * only when the schema admits nulls, so the
    * containsNull=false hot path stays a branch-free loop. */
  protected def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  /** Interpreted element read, widened to double. */
  protected def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Codegen element read, widened to double. */
  protected def elemCode(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  /** Codegen null-slot guard: breaks the loop with the hasNull flag
    * set; empty when the schema forbids null slots. */
  protected def nullGuard(arr: String, i: String, nullable: Boolean,
      hasNull: String): String =
    if (nullable) s"if ($arr.isNullAt($i)) { $hasNull = true; break; }" else ""
}

/** Σ a(i)·b(i) over min(len) elements (zip_with semantics: the HOF
  * twin null-pads the shorter side, making those products null and the
  * fold null — we instead stop at the shorter length; callers in this
  * library always pass equal-length vectors). A NULL element in the
  * read range yields NULL (the HOF twin's poisoned fold). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryOp {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += elem(x, i, fx) * elem(y, i, fy)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val hasNull = ctx.freshName("hasNull")
      // when neither schema admits null slots the guards are empty and
      // hasNull is statically false — emit the plain assignment (and
      // never touch ev.isNull, which is a literal for non-nullable ev)
      val finish =
        if (elemNullable(left) || elemNullable(right))
          s"if ($hasNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }"
        else s"${ev.value} = $acc;"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${nullGuard(x, i, elemNullable(left), hasNull)}
         |  ${nullGuard(y, i, elemNullable(right), hasNull)}
         |  $acc += ${elemCode(x, i, elemIsFloat(left))} *
         |    ${elemCode(y, i, elemIsFloat(right))};
         |}
         |$finish
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProduct = copy(left = l, right = r)

  override def prettyName: String = "dot_product"
}

/** cos(a, b) = a·b / (|a|·|b|); NULL for a zero-norm side (the
  * try_divide discipline — a direction-less vector cannot rank) and
  * for any NULL element on either side (the HOF twin's poisoned
  * fold — norms are dot(a,a)/dot(b,b), so a null slot nulls them). */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryOp {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (elemIsFloat(left), elemIsFloat(right))
    // norms run each side's FULL length (matching dot(a,a)/dot(b,b)),
    // so a null slot ANYWHERE in either array poisons the result
    var i = 0
    while (i < x.numElements()) { if (x.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < y.numElements()) { if (y.isNullAt(i)) return null; i += 1 }
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    i = 0
    while (i < n) { dot += elem(x, i, fx) * elem(y, i, fy); i += 1 }
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
      val hasNull = ctx.freshName("hasNull")
      // null-slot scans emitted only for sides whose schema admits
      // null elements; ev.isNull always exists (nullable = true)
      val scanX =
        if (elemNullable(left))
          s"""for (int $i = 0; $i < $x.numElements() && !$hasNull; $i++) {
             |  if ($x.isNullAt($i)) $hasNull = true;
             |}""".stripMargin
        else ""
      val scanY =
        if (elemNullable(right))
          s"""for (int $i = 0; $i < $y.numElements() && !$hasNull; $i++) {
             |  if ($y.isNullAt($i)) $hasNull = true;
             |}""".stripMargin
        else ""
      s"""
         |boolean $hasNull = false;
         |$scanX
         |$scanY
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${elemCode(x, i, elemIsFloat(left))} *
         |      ${elemCode(y, i, elemIsFloat(right))};
         |  }
         |  double $aa = 0.0;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    double $v = ${elemCode(x, i, elemIsFloat(left))};
         |    $aa += $v * $v;
         |  }
         |  double $bb = 0.0;
         |  for (int $i = 0; $i < $y.numElements(); $i++) {
         |    double $v = ${elemCode(y, i, elemIsFloat(right))};
         |    $bb += $v * $v;
         |  }
         |  double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |  if ($denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
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
