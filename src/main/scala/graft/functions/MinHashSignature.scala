package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: k-hash MinHash signature of a shingle
  * set in ONE pass over the input.
  *
  * Hash family: each shingle is xxHash64'd ONCE (seed 42, the built-in
  * `xxhash64` discipline); family member i re-mixes that 64-bit base
  * with `XXH64.hashLong(base, i+1)` — a few multiply/rotate steps
  * instead of re-hashing the string bytes k times. Hashing the hash is
  * the standard one-permutation-style family construction: the base
  * hash is uniform on 64 bits, so the k re-mixes are k independent
  * uniform functions of the shingle, which is all MinHash requires.
  * Versus the higher-order-function spelling (k separate
  * `array_min(transform(...))` passes, each concatenating "#i" onto
  * every shingle and re-hashing the full string), this is one pass,
  * zero per-shingle allocation, and k cheap mixes per shingle.
  *
  * Empty input arrays yield Long.MaxValue sentinels (deterministic;
  * no two real signatures collide with it on a band).
  *
  * Reference counterpart: none (SURVEY.md §2.3 extension surface).
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "signature length k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j + 1L)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.addMutableState("long[]", "minhashMins",
        v => s"$v = new long[$k];")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $base = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($arr.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashLong($base, $j + 1L);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  /** Column-API entry point. */
  def minhashSignature(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), k))
}
