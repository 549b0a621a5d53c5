package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The engine's `zorder2(a, b)` transform as a CATALOG function —
  * what lets the DSv2 write seams (`RequiresDistributionAndOrdering`
  * on the SQL row-level replace write and on the streaming epoch
  * write) demand an ordering BY THE MORTON KEY itself, so a
  * zorder-pinned table keeps its two-dimensional locality through
  * paths where the engine never touches the physical write. The
  * evaluation is the same bit-interleave
  * [[graft.functions.ZOrderInterleave]] computes on the engine-side
  * write path (spec-pinned), so reader expectations and writer
  * placement can never drift. */
object GraftZOrder {

  val FunctionName = "zorder2"

  /** Binds `(a, b)` for any integral-ish pair — Spark casts the
    * inputs to the declared LongType lanes. */
  class Unbound extends UnboundFunction {
    override def name(): String = FunctionName
    override def description(): String =
      "zorder2(a, b): 62-bit Morton interleave of the low 31 bits " +
        "of each side — the key zorder-clustered graft tables are " +
        "laid out by"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"zorder2 takes (a, b), got ${inputType.simpleString}")
      Bound()
    }
  }

  case class Bound() extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] =
      Array(LongType, LongType)
    override def resultType(): DataType = LongType
    override def name(): String = FunctionName
    override def canonicalName(): String = s"graft.$FunctionName"
    // the MAGIC METHOD (ScalarFunction.MAGIC_METHOD_NAME): Spark
    // compiles a direct Invoke on this signature — the per-row sort
    // key of a zorder DML/epoch write stays codegen'd instead of
    // boxing through produceResult reflection
    def invoke(a: Long, b: Long): Long =
      graft.functions.ZOrderInterleave.interleave(a, b)
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else graft.functions.ZOrderInterleave.interleave(
        input.getLong(0), input.getLong(1))
  }
}
