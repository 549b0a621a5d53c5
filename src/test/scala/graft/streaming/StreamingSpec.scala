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

  test("a Kafka-shaped JSON payload stream decodes to the same results as the file source") {
    // the source seam's portability proof without a broker: serialize
    // the file stream into the wire payload (a `value` column of JSON
    // — exactly what a Kafka consumer frame carries), decode through
    // decodeJsonEvents, and run a transform — results must equal the
    // batch twin bit for bit, so every transform is provably
    // source-agnostic and the ONLY Kafka-specific piece left is the
    // connector jar.
    val wire = Streams.encodeJsonEvents(Streams.eventsStream(spark, dir))
    val streamed = Streams.tumblingCounts(Streams.decodeJsonEvents(wire))
    val got = Streams.runToMemory(spark, streamed, "t_kafka_shape",
      OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = Streams.tumblingCounts(Tables.events(spark, dir))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
    // a malformed payload decodes to a NULL row, never an exception
    import spark.implicits._
    val junk = Seq("{not json", """{"event_id": 7}""").toDF("value")
    val decoded = Streams.decodeJsonEvents(junk).collect()
    assert(decoded.length == 2)
    assert(decoded.exists(_.isNullAt(0)), "unparsable payload -> NULL row")
    assert(decoded.exists(r => !r.isNullAt(0) && r.getLong(0) == 7L),
      "partial payload keeps the fields it has")
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

  test("stream-stream interval join equals the batch twin") {
    val streamed = Streams.intervalJoin(
      Streams.eventsStream(spark, dir), Streams.eventsStream(spark, dir))
    val got = Streams.runToMemory(spark, streamed, "t_interval")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.ops.Tables.events(spark, dir)
    val batch = Streams.intervalJoin(ev, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("LEFT OUTER interval join: matches equal batch; null rows emitted below the watermark horizon") {
    val streamed = Streams.intervalJoinOuter(
      Streams.eventsStream(spark, dir), Streams.eventsStream(spark, dir))
    val got = Streams.runToMemory(spark, streamed, "t_interval_outer")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.ops.Tables.events(spark, dir)
    val batch = Streams.intervalJoinOuter(ev, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // matched rows behave exactly like the inner join: equal sets
    assert(got.filter(_._2 >= 0) == batch.filter(_._2 >= 0))
    // unmatched (sentinel) rows: a bounded stream can only declare a
    // purchase unmatched once the watermark passes its window, so the
    // final watermark horizon (1 h delay + 1 h window) withholds the
    // tail — below that horizon the null rows must agree exactly
    val maxUs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val horizonUs = maxUs - 2L * 3600L * 1000000L
    def nullsBelow(s: Set[(Long, Long)], pUs: Map[Long, Long]) =
      s.filter(x => x._2 < 0 && pUs(x._1) < horizonUs)
    val pUs = Streams.intervalJoinOuter(ev, ev)
      .select("pid", "p_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nullsBelow(got, pUs) == nullsBelow(batch, pUs))
    assert(nullsBelow(batch, pUs).nonEmpty,
      "fixture must contain unmatched purchases below the horizon")
    // and the stream never invents a null row the batch lacks
    assert(got.filter(_._2 < 0).subsetOf(batch.filter(_._2 < 0)))
  }

  test("append mode across micro-batches: watermark advances, closed windows emit once") {
    import java.nio.file.Files
    val tmpRoot = Files.createTempDirectory("graft-multibatch")
    val tmp = tmpRoot.toFile.getAbsolutePath
    val ev = Tables.events(spark, dir)
    val schema = ev.schema
    // five time-ordered files: each micro-batch (maxFilesPerTrigger=1)
    // carries strictly later events, so the event-time watermark
    // advances batch over batch — the condition append mode needs
    // before it may emit anything at all
    val rows = ev.orderBy("ts").collect()
    val per = math.max(1, rows.length / 5 + 1)
    rows.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val stage = s"$tmp/stage$i"
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toIndexedSeq, 1), schema)
        .write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$tmp/batch-$i.parquet")
      Files.move(part.toPath, dst.toPath)
      // pin ingestion order (FileStreamSource orders by mtime)
      dst.setLastModified(1000000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "batch-*.parquet")
      .parquet(tmp)
    val q = Streams.tumblingCounts(src).writeStream
      .format("memory").queryName("t_multibatch")
      .outputMode(OutputMode.Append())
      .start()
    q.processAllAvailable()
    val nonEmptyBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    val got = spark.table("t_multibatch").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
    val batch = Streams.tumblingCounts(ev).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(nonEmptyBatches >= 3, s"wanted multiple micro-batches, got $nonEmptyBatches")
    // append emits only after the watermark has advanced past a window:
    // non-empty output is itself proof of cross-batch watermark motion
    assert(got.nonEmpty, "no window ever closed — watermark did not advance")
    assert(got.length == got.map(_._1).distinct.length, "a window emitted twice")
    got.foreach { case (k, v) =>
      assert(batch(k) == v, s"window $k: append-mode $v != batch ${batch(k)}")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
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
    // mode parity: the batch twin (plain dropDuplicates — Spark has no
    // batch spelling of WithinWatermark) keeps the same id set
    val batchIds = Streams.dedupEvents(Tables.events(spark, dir))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val streamIds = got.select("event_id").collect().map(_.getLong(0)).toSet
    assert(batchIds == streamIds, "batch twin and streaming dedup diverge")
  }

  test("stream-static enrichment equals the batch twin") {
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def shape(df: org.apache.spark.sql.DataFrame) =
      Streams.enrichEvents(df.select(col("event_id"), col("user_id")),
        dim, "user_id", "c_custkey")
        .select(col("event_id"),
          coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
    val got = Streams.runToMemory(spark,
      shape(Streams.eventsStream(spark, dir)), "t_enrich")
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    val batch = shape(Tables.events(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
    assert(batch.nonEmpty && got == batch)
  }

  test("stream-static novelty anti-join equals the batch twin") {
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    def corpus = Tables.events(spark, dir).filter(col("ts") < cut)
    def shape(df: org.apache.spark.sql.DataFrame) =
      Streams.novelEvents(
        df.filter(col("ts") >= cut)
          .select(col("event_id"), col("user_id"), col("event_type")),
        corpus, Seq("user_id", "event_type"))
    val got = Streams.runToMemory(spark,
      shape(Streams.eventsStream(spark, dir)), "t_novel")
      .collect().map(_.getLong(0)).sorted.toSeq
    val batch = shape(Tables.events(spark, dir))
      .collect().map(_.getLong(0)).sorted.toSeq
    // the fixture must exercise both outcomes: some events novel, some
    // filtered by the seen-key corpus
    val total = Tables.events(spark, dir).filter(col("ts") >= cut).count()
    assert(batch.nonEmpty && batch.size < total)
    assert(got == batch)
  }

  test("as-of enrichment picks the latest version at-or-before each event") {
    import SparkSpec.session.implicits._
    // versions for user 1 at t=10 (v=100) and t=20 (v=200); user 2 none
    val dim = Seq((1L, 10L, 100.0), (1L, 20L, 200.0))
      .toDF("dim_user", "dim_ts", "prof_value")
    val ev = Seq((0L, 1L, 5L), (1L, 1L, 10L), (2L, 1L, 15L),
      (3L, 1L, 20L), (4L, 1L, 99L), (5L, 2L, 50L))
      .toDF("event_id", "user_id", "ts")
    val got = Streams.asofEnrich(ev, dim, "user_id", "dim_user", "ts", "dim_ts")
      .select("event_id", "prof_value").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0L).isEmpty, "before the first version: NULL")
    assert(got(1L).contains(100.0), "at a version's own timestamp it applies")
    assert(got(2L).contains(100.0))
    assert(got(3L).contains(200.0), "a new version supersedes at its ts")
    assert(got(4L).contains(200.0), "open-ended last interval")
    assert(got(5L).isEmpty, "user with no versions stays NULL (left join)")
  }

  test("stream-static as-of enrichment equals the batch twin") {
    val dim = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("dim_user"), col("ts").as("dim_ts"),
        col("event_id").as("dim_event"), col("value").as("prof_value"))
    def shape(df: org.apache.spark.sql.DataFrame) =
      Streams.asofEnrich(df.select(col("event_id"), col("user_id"), col("ts")),
        dim, "user_id", "dim_user", "ts", "dim_ts",
        tieBreak = Seq("dim_event"))
        .select(col("event_id"),
          coalesce(unix_micros(col("asof_ts")), lit(-1L)).as("asof_us"),
          coalesce(col("prof_value"), lit(-1.0)).as("prof_value"))
    val got = Streams.runToMemory(spark,
      shape(Streams.eventsStream(spark, dir)), "t_asof")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val batch = shape(Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(batch.nonEmpty && got == batch)
    assert(batch.exists(_._2 >= 0), "fixture must enrich at least one event")
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

  test("flatMapGroupsWithState milestones accumulate across micro-batches to the batch set") {
    import SparkSpec.session.implicits._
    // split events over 4 files and trigger one file per micro-batch,
    // so milestone state genuinely carries across triggers (streaming
    // the single source file would collapse to one batch)
    val chunked = java.nio.file.Files
      .createTempDirectory("graft-milestones").toString
    Tables.events(spark, dir)
      .selectExpr("event_id", "unix_micros(ts) AS tsMicros", "user_id",
        "event_type", "value")
      .repartition(4).write.mode("overwrite").parquet(chunked)
    val typedStream = spark.readStream
      .schema(spark.read.parquet(chunked).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(chunked).as[Event]
    val got = Streams.runToMemory(spark,
        Streams.userMilestones(typedStream).toDF(), "t_milestones",
        OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchTyped = spark.read.parquet(chunked).as[Event]
    val batch = Streams.userMilestones(batchTyped)
      .collect().map(m => (m.user_id, m.milestone)).toSet
    assert(batch.nonEmpty && got == batch)
    // milestones are cumulative-count crossings: per user they must be
    // exactly every multiple of 10 up to the user's event count
    val counts = Tables.events(spark, dir).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = counts.flatMap { case (u, n) =>
      (1L to n / 10).map(k => (u, k * 10)) }.toSet
    assert(got == expected)
  }

  test("streaming CDC sink: micro-batched changesets fold to the batch merge") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-upsert").toFile.getAbsolutePath
    val snapDir = s"$root/snapshot"
    Seq((1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L))
      .toDF("id", "body", "sz").write.parquet(snapDir)
    // three time-ordered changeset files → three micro-batches:
    // b0 updates 2, b1 deletes 3 + inserts 9, b2 re-updates 2 (later
    // batch must win over b0's update)
    val batches = Seq(
      Seq((2L, "beta-v2", 21L, "U")),
      Seq((3L, "", 0L, "D"), (9L, "iota", 90L, "U")),
      Seq((2L, "beta-v3", 22L, "U")))
    val csSchema = batches.head.toDF("id", "body", "sz", "op").schema
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = s"$root/stage$i"
      rows.toDF("id", "body", "sz", "op").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$root/cs-$i.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
    val src = spark.readStream.schema(csSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "cs-*.parquet")
      .parquet(root)
    Streams.runUpsertSink(spark, src, snapDir, "id",
      checkpointDir = Some(s"$root/ckpt"))
    val got = spark.read.parquet(snapDir).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "alpha", 10L), (2L, "beta-v3", 22L),
      (9L, "iota", 90L)), got.toString)
    // no residue from the swap discipline
    assert(!new java.io.File(s"$snapDir._merge_tmp").exists())
    assert(!new java.io.File(s"$snapDir._merge_old").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming versioned append: each micro-batch is one atomic version") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-vappend").toFile.getAbsolutePath
    val table = s"$root/tbl"
    val batches = Seq(
      Seq((1L, "a"), (2L, "b")),
      Seq((3L, "c")),
      Seq((4L, "d"), (5L, "e")))
    val schema = batches.head.toDF("id", "body").schema
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = s"$root/stage$i"
      rows.toDF("id", "body").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$root/in-$i.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "in-*.parquet")
      .parquet(root)
    Streams.runVersionedAppendSink(spark, src, table,
      checkpointDir = Some(s"$root/ckpt"))
    // three micro-batches -> versions 0..2; latest = full union
    assert(graft.sources.VersionedTable.latestVersion(spark, table) == 2)
    assert(graft.sources.VersionedTable.read(spark, table).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
    // time travel: version 1 is the first two batches only
    assert(graft.sources.VersionedTable.read(spark, table, Some(1))
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // file reuse: one commit dir per batch, no rewrites
    assert(new java.io.File(table, "data").list().length == 3)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("versioned append batch is idempotent per batchId — crash replay appends nothing") {
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-vreplay").toFile.getAbsolutePath
    val table = s"$root/tbl"
    val b0 = Seq(1L -> "a").toDF("id", "body")
    val b1 = Seq(2L -> "b").toDF("id", "body")
    Streams.versionedAppendBatch(spark, table, b0, batchId = 0L)
    Streams.versionedAppendBatch(spark, table, b1, batchId = 1L)
    // crash between commit and checkpoint advance: the restarted query
    // re-delivers batch 1 — the txn marker recognizes it committed
    Streams.versionedAppendBatch(spark, table, b1, batchId = 1L)
    assert(graft.sources.VersionedTable.latestVersion(spark, table) == 1,
      "replayed batch must not mint a new version")
    assert(graft.sources.VersionedTable.read(spark, table).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"),
      "replayed batch must not duplicate rows")
    // a genuinely new batch still appends
    Streams.versionedAppendBatch(spark, table,
      Seq(3L -> "c").toDF("id", "body"), batchId = 2L)
    assert(graft.sources.VersionedTable.read(spark, table).count() == 3)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming curation ingest: each batch curates against the GROWN " +
      "corpus; replays re-curate nothing; uninitialized roots fail loudly") {
    import spark.implicits._
    import java.nio.file.Files
    def words(prefix: String, n: Int) =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val root = Files.createTempDirectory("graft-ingest-sink").toFile.getAbsolutePath
    val table = s"$root/tbl"
    val bench = Seq(0L -> words("bench", 25)).toDF("doc_id", "text")
    // streaming into an uninitialized table is refused
    new java.io.File(s"$root/empty-src").mkdirs()
    intercept[IllegalArgumentException](
      Streams.runIngestSink(spark,
        spark.readStream.schema(bench.schema).parquet(s"$root/empty-src"),
        table, bench))
    graft.sources.VersionedTable.init(spark, table,
      Seq(100L -> words("alpha", 25)).toDF("doc_id", "text"))
    // batch 0: a fresh doc + a near re-crawl of the SEED doc
    Streams.ingestBatch(spark, table,
      Seq(200L -> words("delta", 25),
          201L -> (words("alpha", 25) + " extra0")).toDF("doc_id", "text"),
      bench, batchId = 0L)
    // batch 1: a near-dup of BATCH 0's survivor (only a grown-corpus
    // read can catch it) + a fresh doc
    Streams.ingestBatch(spark, table,
      Seq(300L -> (words("delta", 25) + " extra1"),
          301L -> words("omega", 25)).toDF("doc_id", "text"),
      bench, batchId = 1L)
    def ids = graft.sources.VersionedTable.read(spark, table)
      .select("doc_id").as[Long].collect().toSet
    assert(graft.sources.VersionedTable.latestVersion(spark, table) == 2)
    assert(ids == Set(100L, 200L, 301L), s"corpus after 2 batches: $ids")
    // crash replay of batch 1: txn marker short-circuits the funnel
    Streams.ingestBatch(spark, table,
      Seq(300L -> (words("delta", 25) + " extra1"),
          301L -> words("omega", 25)).toDF("doc_id", "text"),
      bench, batchId = 1L)
    assert(graft.sources.VersionedTable.latestVersion(spark, table) == 2 &&
      ids == Set(100L, 200L, 301L), "replay must not re-curate or append")
    // time travel: v1 is the corpus as of batch 0
    assert(graft.sources.VersionedTable.read(spark, table, Some(1))
      .select("doc_id").as[Long].collect().toSet == Set(100L, 200L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming MV follow: the followed view equals the " +
    "batch-refreshed view after arbitrary append/rewrite " +
    "interleavings, and a restart replays idempotently") {
    import graft.sources.{MaterializedView => MV, VersionedTable => VT}
    import org.apache.spark.sql.{DataFrame, Row}
    import SparkSpec.session.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mv_follow")
    try {
      val base = tmp.resolve("base").toString
      val mv = tmp.resolve("mv").toString
      val ck = tmp.resolve("ck").toString
      VT.init(spark, base,
        Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "x"))
      VT.enableChangeFeed(spark, base, "id")
      MV.create(spark, mv, base, Seq("k"),
        Seq(MV.MvCount("cnt"), MV.MvSum("x", "sum_x"),
          MV.MvAvg("x", "avg_x")))
      def expect(): Seq[Row] = VT.read(spark, base).groupBy("k")
        .agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
          avg(col("x")).as("avg_x"))
        .orderBy("k").collect().toSeq
      def served(): Seq[Row] =
        MV.read(spark, mv).orderBy("k").collect().toSeq
      val q = Streams.followMaterializedView(spark, mv, Some(ck))
      try {
        q.processAllAvailable()
        assert(served() == expect(), "initial drain")
        // APPEND → one trigger, O(delta) fold
        VT.append(spark, base,
          Seq((3L, "a", 30L), (4L, "c", 40L)).toDF("id", "k", "x"),
          VT.latestVersion(spark, base))
        q.processAllAvailable()
        assert(served() == expect(), "after append")
        // REWRITE (keyed merge: update + delete) — the follow must
        // fold it, NOT die on the snapshot stream's append-only rule
        VT.merge(spark, base,
          Seq((2L, "b", 25L, "U"), (4L, "c", 40L, "D"))
            .toDF("id", "k", "x", "op"), "id")
        q.processAllAvailable()
        assert(served() == expect(), "after keyed rewrite")
        assert(!served().exists(_.getString(0) == "c"),
          "an emptied group leaves the followed view")
        // plain DELETE (content-diff rewrite) interleaved with an
        // append before the next drain: one trigger may fold both
        VT.delete(spark, base, col("x") === 30L)
        VT.append(spark, base,
          Seq((5L, "d", 50L)).toDF("id", "k", "x"),
          VT.latestVersion(spark, base))
        q.processAllAvailable()
        assert(served() == expect(), "after delete+append")
      } finally q.stop()
      assert(MV.watermark(spark, mv) == VT.latestVersion(spark, base))
      // RESTART from the same checkpoint: nothing pending → no new
      // fold; then a checkpoint-LESS follow re-fires the initial
      // batch and the watermark no-ops it (refresh's idempotency is
      // the exactly-once, not the checkpoint)
      val mvVer = VT.latestVersion(spark, mv)
      val q2 = Streams.followMaterializedView(spark, mv, Some(ck))
      try q2.processAllAvailable() finally q2.stop()
      val q3 = Streams.followMaterializedView(spark, mv, None)
      try q3.processAllAvailable() finally q3.stop()
      assert(VT.latestVersion(spark, mv) == mvVer,
        "replayed triggers must no-op on the watermark, not re-fold")
      assert(served() == expect(), "after restarts")
      // a lagging restart CATCHES UP: move the base while no follow
      // runs, then restart from the checkpoint
      VT.append(spark, base,
        Seq((6L, "a", 60L)).toDF("id", "k", "x"),
        VT.latestVersion(spark, base))
      val q4 = Streams.followMaterializedView(spark, mv, Some(ck))
      try {
        q4.processAllAvailable()
        assert(served() == expect(), "catch-up after lagging restart")
      } finally q4.stop()
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("streaming MV follow: an insert-only view REFUSES a rewrite " +
    "batch loudly — the stream fails with the fullRefresh recipe, " +
    "never serves a silently stale extreme") {
    import graft.sources.{MaterializedView => MV, VersionedTable => VT}
    import SparkSpec.session.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mv_follow_io")
    try {
      val base = tmp.resolve("base").toString
      val mv = tmp.resolve("mv").toString
      VT.init(spark, base,
        Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("id", "k", "x"))
      MV.create(spark, mv, base, Seq("k"),
        Seq(MV.MvCount("cnt"), MV.MvMax("x", "max_x")))
      VT.delete(spark, base, col("x") === 20L) // evicts the max
      val q = Streams.followMaterializedView(spark, mv, None)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("fullRefresh")),
        s"the failure must name the recovery, got: ${messages(e)}")
      // the view is UNCHANGED — still the pre-delete aggregate at the
      // old watermark, never a half-fold
      assert(MV.watermark(spark, mv) == 0)
      assert(MV.read(spark, mv).orderBy("k").collect().toSeq ==
        Seq(org.apache.spark.sql.Row("a", 2L, 20L)))
      // fullRefresh + a fresh follow recovers
      MV.fullRefresh(spark, mv)
      val q2 = Streams.followMaterializedView(spark, mv, None)
      try q2.processAllAvailable() finally q2.stop()
      assert(MV.read(spark, mv).orderBy("k").collect().toSeq ==
        Seq(org.apache.spark.sql.Row("a", 1L, 10L)))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
