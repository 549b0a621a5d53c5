package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scans stay fully declarative so Catalyst pushes filters and prunes
  * columns into the vectorized parquet reader — at 100 TB the scan is
  * the dominant cost and pushdown/pruning is the first-order win.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader only accepts as a raw long (spark.sql.legacy.parquet.nanosAsLong,
    * set by our session builders). Re-derive a proper TimestampType via
    * integer division (`div`, not `/` — epoch-nanos exceed double's 53-bit
    * mantissa) so downstream windows/watermarks see a real timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** A named bundle of driver-checkable queries: `queries` produce the
  * Spark result, `oracle` holds the equivalent DuckDB SQL (omitted for
  * non-SQL-expressible ops → driver falls back to a rows-only check).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
