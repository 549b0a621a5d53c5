package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scans stay fully declarative so Catalyst pushes filters and prunes
  * columns into the vectorized parquet reader — at 100 TB the scan is
  * the dominant cost and pushdown/pruning is the first-order win.
  */
object Tables {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Schema-drift guard: parquet written with isAdjustedToUTC=false
    * (e.g. pandas/pyarrow `timestamp[us]` without a zone) arrives as
    * TIMESTAMP_NTZ, which Spark rejects in `unix_micros`, watermarks
    * (`withWatermark` requires TIMESTAMP), and time-window functions.
    * Every session builder pins spark.sql.session.timeZone=UTC, so
    * casting NTZ→TIMESTAMP preserves the stored micros exactly; this
    * makes the engine tolerant of either encoding at the one source
    * boundary instead of failing in every event-time operator.
    *
    * The micros-preserving property holds ONLY under a UTC session —
    * any other zone silently shifts every event time at the cast. The
    * invariant is asserted exactly where it is relied on (and only
    * when an NTZ column is actually present), so an external caller
    * embedding Tables with a non-UTC session fails loudly instead of
    * reading shifted timestamps. */
  private def requireUtc(df: DataFrame): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"TIMESTAMP_NTZ normalization requires spark.sql.session.timeZone" +
        s"=UTC (got '$tz') — the NTZ->TIMESTAMP cast preserves stored " +
        "micros only under UTC; set the session timezone before reading")
  }

  def normalizeNtz(df: DataFrame): DataFrame = {
    val ntzCols = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    if (ntzCols.nonEmpty) requireUtc(df)
    ntzCols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** Event-time normalization shared by the batch and streaming event
    * readers. Handles every encoding the driver's generator has shipped:
    *   - TIMESTAMP(NANOS) parquet, which Spark's vectorized reader only
    *     accepts as a raw long (spark.sql.legacy.parquet.nanosAsLong, set
    *     by our session builders) — re-derived via integer division
    *     (`div`, not `/`: epoch-nanos exceed double's 53-bit mantissa);
    *   - timestamp[us] without zone (TIMESTAMP_NTZ) — cast, see
    *     [[normalizeNtz]];
    *   - proper TIMESTAMP — passed through.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        requireUtc(df)
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(apply(s, d, "events"))
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
