package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/
  * NFKD) of a string column. Scraped corpora mix composed and
  * decomposed encodings of the SAME text ("é" as U+00E9 vs
  * e + U+0301): exact dedup, token statistics, and every
  * hash-family near-dup path treat those as different bytes unless
  * the pipeline canonicalizes first — normalization is the standard
  * first stage of web-scale text curation. Spark ships no built-in
  * for it; this wraps `java.text.Normalizer` as a codegen'd
  * expression so the hot path stays inside whole-stage codegen.
  *
  * The form operand must be a foldable string naming a
  * `Normalizer.Form` (validated at analysis, not per row). NULL text
  * yields NULL.
  *
  * Reference counterpart: none (SURVEY.md §2.3 extension surface).
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType

  // non-string arguments coerce to string like Spark built-ins; the
  // form additionally has to be a foldable, valid Normalizer.Form
  // name, checked after the type coercion pass
  override def inputTypes: Seq[org.apache.spark.sql.graft.TypeBridge.AbstractType] = Seq(StringType, StringType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val typed = super.checkInputDataTypes()
    if (typed.isFailure) typed
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      "unicode_normalize form must be a literal string")
    else scala.util.Try(Normalizer.Form.valueOf(
      right.eval().asInstanceOf[UTF8String].toString)) match {
      case scala.util.Success(_) => TypeCheckResult.TypeCheckSuccess
      case scala.util.Failure(_) => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be one of " +
          s"${Normalizer.Form.values.mkString(", ")}, got ${right.eval()}")
    }
  }

  @transient private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(s: Any, f: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(s.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("nfForm", form,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(), $fRef));""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UnicodeNormalize {
  /** Column wrapper: normalize `text` to the given Unicode form. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(
      ColumnBridge.expression(text),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(form))))
}
