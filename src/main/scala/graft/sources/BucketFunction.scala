package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.functions.{hash, lit, pmod}
import org.apache.spark.sql.types._

/** The engine's `bucket(n, col)` partition transform function — the
  * one agreement that makes storage-partitioned joins sound: the
  * WRITER assigns each row to bucket `pmod(murmur3(key, seed=42), n)`
  * by routing the commit through `df.repartition(n, col(key))` (whose
  * `HashPartitioning.partitionIdExpression` is exactly that formula,
  * and whose task index becomes the `part-NNNNN-` file-name prefix),
  * and the READER reports the same function through the catalog's
  * `FunctionCatalog` seam so Spark can prove two co-bucketed tables
  * share a partitioning and plan their join WITHOUT a shuffle
  * (`KeyGroupedPartitioning` — the mechanism Iceberg's storage
  * partitioned joins ride, re-derived here at commit-dir-file
  * granularity).
  *
  * Consistency is by construction, not by convention: both tables'
  * rows were placed by the same Spark `HashPartitioning` formula, so
  * equal keys land in equal bucket ids no matter which table, which
  * session, or which cluster wrote them — the property that makes the
  * shuffle provably removable at 100 TB, where the join shuffle IS
  * the dominant cost.
  */
object GraftBucket {

  val FunctionName = "bucket"

  /** Writer-side bucket id of `key` — MUST equal the partition index
    * `repartition(n, key)` sends the row to (both are
    * `pmod(murmur3_hash(key, 42), n)`); spec-pinned against the bound
    * V2 function so the two can never drift. */
  def idColumn(key: Column, n: Int): Column = pmod(hash(key), lit(n))

  /** Bucket id of the file `part-NNNNN-<uuid>.parquet` Spark's file
    * writer produced for shuffle partition NNNNN, or None for any
    * other name (a file this format's bucketing write path did not
    * produce — the scan must then not claim a bucketed layout). */
  def fileBucket(fileName: String): Option[Int] = {
    val m = FilePattern.findPrefixMatchOf(fileName)
    m.map(_.group(1).toInt)
  }

  private val FilePattern = "part-(\\d+)-".r

  /** The unbound catalog function: binds `(int n, <key>)` for every
    * key type Spark's murmur3 hash covers. */
  class Unbound extends UnboundFunction {
    override def name(): String = FunctionName
    override def description(): String =
      "bucket(n, col): pmod(murmur3_hash(col, 42), n) — the transform " +
        "graft bucketed tables are laid out by"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket's first argument is the int bucket count, got " +
          inputType.fields(0).dataType.simpleString)
      Bound(inputType.fields(1).dataType)
    }
  }

  /** Bound scalar: evaluates the exact writer-side formula. Spark only
    * needs it for partitioning-compatibility proofs (canonicalName +
    * numBuckets equality across the join), but the evaluation is real
    * and spec-pinned to [[idColumn]]. */
  case class Bound(keyType: DataType)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = FunctionName
    override def canonicalName(): String = s"graft.$FunctionName"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Integer = {
      val n = input.getInt(0)
      // a NULL key leaves the murmur3 fold at its seed — identical to
      // Murmur3Hash's eval over a null child, so NULL-keyed rows land
      // where repartition() put them
      val h =
        if (input.isNullAt(1)) 42L
        else Murmur3HashFunction.hash(input.get(1, keyType), keyType, 42L)
      val i = h.toInt % n
      if (i < 0) i + n else i
    }
  }
}
