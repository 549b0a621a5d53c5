package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Schema-drift canary: loads every testdata table through the Tables
  * boundary and asserts the NORMALIZED types the rest of the engine
  * assumes. The driver regenerates /root/testdata between rounds and
  * has already shipped the same logical column under three encodings
  * (TIMESTAMP(NANOS) read as long, timestamp[us] without zone =
  * TIMESTAMP_NTZ, proper TIMESTAMP). When that happens again, this
  * suite fails in ONE obvious place instead of 13 scattered operator
  * tests — and names the column that drifted.
  */
class SchemaCanarySpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private def typeOf(table: String, col: String): DataType =
    Tables(spark, dir, table).schema(col).dataType

  private def assertType(table: String, col: String, expected: DataType): Unit = {
    val actual =
      if (table == "events") Tables.events(spark, dir).schema(col).dataType
      else typeOf(table, col)
    assert(actual == expected,
      s"$table.$col drifted: engine assumes $expected, testdata now yields $actual " +
        "(check Tables.normalizeNtz / Tables.normalizeEventTs)")
  }

  test("events: ts is TIMESTAMP (watermark-eligible), keys are BIGINT") {
    assertType("events", "ts", TimestampType)
    assertType("events", "event_id", LongType)
    assertType("events", "user_id", LongType)
    assertType("events", "event_type", StringType)
    assertType("events", "value", DoubleType)
  }

  test("events stream source: ts is TIMESTAMP on the streaming schema too") {
    val st = graft.streaming.Streams.eventsStream(spark, dir)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == TimestampType,
      s"streaming ts drifted to ${st.schema("ts").dataType}")
  }

  test("no table surfaces TIMESTAMP_NTZ after normalization, at any SF") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // all three SFs: the driver regenerates them independently, and a
    // schema read is parquet-footer-only — no data scan even at sf0.1
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1").map(sf); t <- tables) {
      val df = if (t == "events") Tables.events(spark, d) else Tables(spark, d, t)
      val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
      assert(ntz.isEmpty, s"$d/$t still exposes TIMESTAMP_NTZ columns: ${ntz.mkString(",")}")
      if (t == "events")
        assert(df.schema("ts").dataType == TimestampType, s"$d events.ts drifted")
    }
  }

  test("temporal columns the relational queries depend on are TIMESTAMP or DATE") {
    for ((t, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val dt = typeOf(t, c)
      assert(dt == TimestampType || dt == DateType,
        s"$t.$c drifted to $dt — date arithmetic in the relational pack will break")
    }
  }

  test("key and measure columns hold their declared types") {
    assertType("lineitem", "l_orderkey", LongType)
    assertType("lineitem", "l_quantity", DoubleType)
    assertType("lineitem", "l_extendedprice", DoubleType)
    assertType("lineitem", "l_returnflag", StringType)
    assertType("orders", "o_orderkey", LongType)
    assertType("orders", "o_custkey", LongType)
    assertType("orders", "o_totalprice", DoubleType)
    assertType("customer", "c_custkey", LongType)
    assertType("documents", "doc_id", LongType)
    assertType("documents", "text", StringType)
    val emb = typeOf("embeddings", "embedding")
    assert(emb == ArrayType(FloatType, containsNull = true) ||
      emb == ArrayType(FloatType, containsNull = false) ||
      emb == ArrayType(DoubleType, containsNull = true) ||
      emb == ArrayType(DoubleType, containsNull = false),
      s"embeddings.embedding drifted to $emb — ANN ops assume a numeric array")
  }
}
