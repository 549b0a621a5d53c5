package graft.streaming

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  test("streaming tumbling counts equal the batch twin") {
    val streamed = Streams.tumblingCounts(Streams.eventsStream(spark, dir))
    val got = Streams.runToMemory(spark, streamed, "t_tumbling",
      OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = Streams.tumblingCounts(Tables.events(spark, dir))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming session windows equal the batch twin") {
    val streamed = Streams.sessionCounts(Streams.eventsStream(spark, dir))
    val got = Streams.runToMemory(spark, streamed, "t_session",
      OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
        r.getLong(2), r.getLong(3))).toSet
    val batch = Streams.sessionCounts(Tables.events(spark, dir))
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming sliding windows equal the batch twin") {
    val streamed = Streams.slidingCounts(Streams.eventsStream(spark, dir))
    val got = Streams.runToMemory(spark, streamed, "t_sliding",
      OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = Streams.slidingCounts(Tables.events(spark, dir))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == batch)
    // sliding 2h/1h: total window-rows ~= 2x tumbling rows
    assert(got.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark drops duplicate event ids") {
    val s = Streams.eventsStream(spark, dir)
    // duplicate the stream by unioning it with itself: every event_id
    // arrives twice within the watermark horizon
    val doubled = s.union(s)
    val deduped = Streams.dedupEvents(doubled)
    val got = Streams.runToMemory(spark, deduped, "t_dedup")
    val n = got.count()
    val distinctIds = Tables.events(spark, dir)
      .select("event_id").distinct().count()
    assert(n == distinctIds, s"expected $distinctIds deduped rows, got $n")
  }

  test("mapGroupsWithState per-user running totals match batch groupBy") {
    import SparkSpec.session.implicits._
    val typed = Streams.eventsStream(spark, dir)
      .selectExpr("event_id", "unix_micros(ts) AS tsMicros", "user_id",
        "event_type", "value").as[Event]
    val streamed = Streams.userRunningTotals(typed)
    val got = Streams.runToMemory(spark, streamed.toDF(), "t_state",
      OutputMode.Update())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.events(spark, dir).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == batch)
  }
}
