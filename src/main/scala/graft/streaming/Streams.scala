package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A (user, running aggregate) row emitted by the stateful stream. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** A milestone row: emitted when a user's cumulative event count
  * crosses a multiple of the configured stride. */
case class UserMilestone(user_id: Long, milestone: Long)

/** Input event row for typed stateful processing. */
case class Event(event_id: Long, tsMicros: Long, user_id: Long,
    event_type: String, value: Double)

/** Structured Streaming skeleton over the `events` table (SURVEY.md
  * §1.4/§2.3). The reference's closest capability is the "incremental"
  * SGA — reducer-held state flushed per task
  * (/root/reference/src/edu/illinois/incr_ga/IncMapReduce.java:241-325);
  * here that capability is expressed with watermarked windowed
  * aggregation and `mapGroupsWithState`.
  *
  * Every transform is written against a plain DataFrame so the SAME
  * code runs in batch (driver's oracle gate, via `StreamQueries`) and
  * streaming (readStream → memory sink, exercised in StreamingSpec):
  * incremental execution is Spark's job, not the operator author's.
  */
object Streams {

  // ---------------------------------------------------------------
  // Source seam. Every transform below consumes a PLAIN DataFrame of
  // canonical event rows (event_id, ts TIMESTAMP, user_id,
  // event_type, value) — nothing downstream knows or cares which
  // source produced the frame, so the operator set is source-agnostic
  // by construction. A source is one function SparkSession → frame:
  //   - eventsStream      file source (parquet dir) — the local gate
  //   - kafkaEvents       Kafka source — the production landing zone
  //   - decodeJsonEvents  payload → canonical rows, the ONLY step
  //                       that differs between wire sources; tested
  //                       locally by round-tripping the file source
  //                       through to_json (StreamingSpec), no broker
  //                       needed
  // kafkaEvents compiles against stock Spark but needs the
  // spark-sql-kafka-0-10 connector on the classpath at RUNTIME (not
  // in this container — the standard `--packages
  // org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>` when
  // deployed). That's a connector jar, not a code change: the decode
  // and every transform are already exercised through the seam.
  // ---------------------------------------------------------------

  /** Wire-payload schema: the JSON a producer puts on the bus. The
    * event time travels as epoch MICROS (int64) — a locale-proof
    * encoding that `timestamp_micros` re-derives exactly, the same
    * discipline Tables.events applies to the parquet nanos column. */
  val payloadSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))

  /** Decode a wire-shaped frame — anything with a `value` payload
    * column (Kafka's contract: value BINARY, plus key/topic/offset
    * metadata we drop) — into canonical event rows. Malformed
    * payloads decode to all-NULL rows (from_json's PERMISSIVE mode);
    * filter on event_id downstream when the bus is untrusted. */
  def decodeJsonEvents(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), payloadSchema).as("e"))
      .select(col("e.event_id"), timestamp_micros(col("e.ts_us")).as("ts"),
        col("e.user_id"), col("e.event_type"), col("e.value"))

  /** The producer half of the bus contract: canonical event rows →
    * one JSON `value` column per row, event time as epoch MICROS —
    * exactly what [[decodeJsonEvents]] reverses, so encode∘decode is
    * identity on the canonical schema (StreamingSpec proves it
    * brokerlessly). Feed the result to the Kafka sink
    * (`writeStream.format("kafka")` wants a `value` column — this is
    * it; add a `key` column upstream for partition affinity). */
  def encodeJsonEvents(events: DataFrame): DataFrame =
    events.select(to_json(struct(col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("user_id"),
      col("event_type"), col("value"))).as("value"))

  /** Kafka source → canonical events: subscribe, decode, done — every
    * transform in this object runs unchanged on the result. Needs the
    * spark-sql-kafka connector jar at runtime (see the seam note). */
  def kafkaEvents(spark: SparkSession, bootstrapServers: String,
      topic: String, startingOffsets: String = "earliest"): DataFrame =
    decodeJsonEvents(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load())

  /** File-source stream of the events table. Schema comes from the
    * batch reader; ts is normalized by the same shared helper as
    * Tables.events (nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the test tables are single parquet FILES; the streaming file
    // source wants a directory, so stream the parent dir with a glob
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.ops.Tables.normalizeEventTs(raw)
  }

  /** Watermark when streaming; identity in batch (same code path runs
    * under the driver's batch oracle gate). */
  private def watermarked(df: DataFrame, wm: String): DataFrame =
    if (df.isStreaming) df.withWatermark("ts", wm) else df

  /** Tumbling 1-hour windows with a watermark: late data beyond
    * `watermark` is dropped, state is bounded — the knob that makes
    * windowed aggregation run forever at scale. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    watermarked(events, watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // sum in DECIMAL so the addition is exact/order-independent, but
      // surface DOUBLE: decimal output columns canonicalize differently
      // across the oracle engines' client stacks (round-1 driver gate)
      .agg(count(lit(1)).as("c"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("v"))
      .select(col("w.start").as("w_start"), col("event_type"), col("c"), col("v"))

  /** Sliding windows (2h width, 1h slide): each event lands in 2
    * windows. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    watermarked(events, watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("w_start"), col("event_type"), col("c"))

  /** Session windows: a session closes after `gap` of user inactivity.
    * State per (user, open session) only — bounded by the watermark. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    watermarked(events, watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("c"))

  /** Stream-stream interval join: each purchase joined to the SAME
    * user's clicks in the window [purchase - within, purchase] —
    * attribution, the canonical two-stream join. The interval bound +
    * watermarks on BOTH sides are what let Spark expire join state:
    * a click older than (watermark + within) can never match a future
    * purchase and is dropped from the state store. Pass the same
    * DataFrame twice for the batch twin; pass two readStream instances
    * when streaming. */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame,
      withinMinutes: Int = 60, watermark: String = "1 hour"): DataFrame = {
    val p = watermarked(purchases, watermark)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = watermarked(clicks, watermark)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    p.join(c, expr(
        s"""c_user = p_user AND
           |c_ts >= p_ts - INTERVAL $withinMinutes MINUTES AND
           |c_ts <= p_ts""".stripMargin))
      .select(col("pid"), col("cid"), col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  /** LEFT OUTER stream-stream interval join: like `intervalJoin`, but
    * purchases with NO click in the window surface with a −1 sentinel
    * (attribution-gap visibility — the rows an inner join silently
    * hides). A fundamentally different state machine than inner: an
    * unmatched purchase can only be declared unmatched once the
    * watermark has passed its window, so outer rows emit with
    * watermark latency, and purchases inside the final watermark
    * horizon of a bounded stream never emit their null row (the
    * StreamingSpec parity asserts equality BELOW that horizon; the
    * batch twin — which the oracle gates — has no horizon and emits
    * everything). */
  def intervalJoinOuter(purchases: DataFrame, clicks: DataFrame,
      withinMinutes: Int = 60, watermark: String = "1 hour"): DataFrame = {
    val p = watermarked(purchases, watermark)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = watermarked(clicks, watermark)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    p.join(c, expr(
        s"""c_user = p_user AND
           |c_ts >= p_ts - INTERVAL $withinMinutes MINUTES AND
           |c_ts <= p_ts""".stripMargin), "left_outer")
      .select(col("pid"), coalesce(col("cid"), lit(-1L)).as("cid"),
        col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"),
        coalesce(unix_micros(col("c_ts")), lit(-1L)).as("c_us"))
  }

  /** Exactly-once-style dedup on event_id with bounded state: duplicate
    * ids arriving within the watermark horizon are dropped. Batch twin
    * is a plain dropDuplicates (dropDuplicatesWithinWatermark is
    * streaming-only — unlike the window aggregates, Spark has no
    * batch spelling of it). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-static enrichment: each event joined (left) to a static
    * dimension — the canonical "decorate the stream with reference
    * data" pattern. Stateless and append-safe: in streaming mode Spark
    * re-plans the static side per micro-batch (picking up dim file
    * changes) and broadcasts it; identical code runs in batch under
    * the oracle gate. The explicit broadcast marks the intent — a
    * stream must never shuffle per micro-batch to meet a dim that fits
    * in memory. */
  def enrichEvents(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")
      .drop(dimKey)

  /** Stream-static NOVELTY pass-through: keep only events whose key
    * tuple the settled corpus has never seen — the streaming face of
    * `pipeline.Dedup.novelKeys` and the gatekeeper of an incremental
    * ingest topology ("only genuinely new (user, action) combos flow
    * downstream"). The seen-key set is the static side of a broadcast
    * LEFT ANTI join: stream-static anti is STATELESS and append-safe
    * (no watermark, no state store), and Spark re-plans the static
    * side each micro-batch, so a corpus refresh is picked up at the
    * next batch. Identical code runs in batch under the oracle gate.
    * When the distinct seen-key set outgrows a broadcast, the scale
    * spelling is Dedup.novelKeys' inverted Bloom prune applied per
    * micro-batch via foreachBatch — same result, corpus never
    * shuffled. */
  def novelEvents(events: DataFrame, corpus: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val aliased = keyCols.map(k => s"__graft_seen_$k")
    val seen = corpus
      .select(keyCols.zip(aliased).map { case (k, a) => col(k).as(a) }: _*)
      .distinct()
    val cond = keyCols.zip(aliased)
      .map { case (k, a) => col(k) === col(a) }.reduce(_ && _)
    events.join(broadcast(seen), cond, "left_anti")
  }

  /** Stream-static AS-OF enrichment: decorate each event with the most
    * recent dim version at-or-before the event's timestamp — the
    * slowly-changing-dimension lookup every feature pipeline needs
    * ("which profile/rate/config was in force when this event
    * happened"). Spark has no asof join, and a stream-side per-event
    * argmax would demand stateful aggregation; instead the STATIC side
    * is closed into half-open validity intervals [valid_from,
    * valid_until) with one lead() window (batch-side, |dim|-sized), so
    * "latest version ≤ ts" becomes STATELESS interval containment:
    * each event matches at most one interval, the join is a broadcast
    * stream-static LEFT join — append-safe, no watermark, no state —
    * and identical code runs in batch under the oracle gate
    * (cf. ops.AsOf for the batch-batch spelling). Version-time ties
    * are totalized by `tieBreak`, making the interval set — and hence
    * the output — deterministic on any engine. Events with no version
    * at-or-before keep NULL enrichment. The dim's version time is
    * returned as `asof_ts`; other dim column names must not collide
    * with event columns (select/rename the dim first). */
  def asofEnrich(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String,
      eventTs: String, dimTs: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(dimTs) +: tieBreak.map(col)).map(_.asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(dimKey)).orderBy(ord: _*)
    val closed = dim
      .withColumn("__valid_until", lead(col(dimTs), 1).over(w))
      .withColumnRenamed(dimTs, "asof_ts")
      .withColumnRenamed(dimKey, "__dim_key")
    events.join(broadcast(closed),
        col(eventKey) === col("__dim_key") &&
          col(eventTs) >= col("asof_ts") &&
          (col("__valid_until").isNull || col(eventTs) < col("__valid_until")),
        "left")
      .drop("__dim_key", "__valid_until")
  }

  /** Custom state: per-user running totals via mapGroupsWithState —
    * the direct Spark twin of the reference's reducer-held HashMap
    * state (IncMapReduce.java:241-325), with managed fault-tolerant
    * state instead of task-lifetime memory. */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserTotals(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Custom MULTI-ROW state: flatMapGroupsWithState — the general form
    * of mapGroupsWithState, emitting zero-to-many rows per group per
    * trigger. Fires a row each time a user's cumulative event count
    * crosses a multiple of `every` ("user hit 10/20/30 events" — the
    * alerting/progress shape where one input row can release several
    * output rows and most release none).
    *
    * Milestones are defined on COUNT CROSSINGS, deliberately: a count
    * is order-independent, so the emitted set is a pure function of
    * the input multiset — identical whether the rows arrive in one
    * batch (the oracle-gated twin) or dribble across micro-batches
    * (StreamingSpec parity), and immune to Spark's unspecified
    * within-group iteration order. State per user is ONE long. */
  def userMilestones(events: Dataset[Event], every: Int = 10): Dataset[UserMilestone] = {
    require(every > 0, s"milestone stride must be positive, got $every")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserMilestone](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          ((before / every + 1) to (after / every))
            .map(m => UserMilestone(uid, m * every)).iterator
      }
  }

  /** Streaming CDC apply — the MERGE sink: each micro-batch of change
    * rows (snapshot columns + an op column, U/D) is applied to a
    * parquet snapshot directory with `Merge.applyChangeset`, so the
    * directory always holds the current upserted state. foreachBatch
    * is Spark's documented idempotent-sink pattern: the batch is a
    * plain DataFrame, the merge is the SAME code the batch path runs,
    * and the swap is Io.compact's crash-safe tmp→old→live rename
    * discipline (a crash between renames leaves the data intact under
    * `._merge_old`). Within a batch, `versionCol` collapses multiple
    * ops per key latest-wins; ACROSS batches, later batches win by
    * construction.
    *
    * At 100 TB the snapshot rewrite is the cost — production systems
    * put a log-structured table format (Delta/Iceberg/Hudi) here; this
    * is the engine-native spelling of the same contract, and the
    * per-batch work is one broadcast anti join + append. Blocks until
    * the source drains (the test-harness contract, like runToMemory).
    */
  def runUpsertSink(spark: SparkSession, changes: DataFrame,
      snapshotDir: String, keyCol: String, opCol: String = "op",
      versionCol: Option[String] = None,
      checkpointDir: Option[String] = None): Unit = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    val writer = changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val live = new org.apache.hadoop.fs.Path(snapshotDir)
        val fs = live.getFileSystem(hadoop)
        val next = graft.pipeline.Merge.applyChangeset(
          spark.read.parquet(snapshotDir), batch, keyCol, opCol,
          versionCol = versionCol)
        val tmp = new org.apache.hadoop.fs.Path(snapshotDir + "._merge_tmp")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        next.write.mode("overwrite").parquet(tmp.toString)
        val old = new org.apache.hadoop.fs.Path(snapshotDir + "._merge_old")
        if (fs.exists(old)) fs.delete(old, true)
        require(fs.rename(live, old), s"could not move $snapshotDir aside")
        require(fs.rename(tmp, live), s"could not publish $snapshotDir")
        fs.delete(old, true)
        ()
      }
    val q = checkpointDir
      .map(writer.option("checkpointLocation", _))
      .getOrElse(writer)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming APPEND sink into the versioned table format: each
    * micro-batch commits as one atomic version via
    * `sources.VersionedTable.append` — O(batch) I/O per commit (only
    * the batch's files are written; the manifest references prior
    * commit dirs), concurrent readers see whole versions only, and
    * the version history doubles as an ingest audit log (time travel
    * = "the table as of batch N"). This supersedes the raw-parquet
    * swap for the pure-ingest topology the same way the versioned
    * MERGE supersedes runUpsertSink's snapshot rewrite.
    *
    * Exactly-once, both directions: the expected-version handshake
    * makes a lost rename race fail the batch loudly (no silent DROP),
    * and the batch id rides the manifest as a `#txn:` marker — atomic
    * with the commit — so a batch REPLAYED after a crash between the
    * commit and the checkpoint advancing recognizes itself already
    * committed and no-ops (no silent DUPLICATION; Delta's
    * txnAppId/txnVersion pattern). `writerId = None` is the legacy
    * one-writer-per-table topology (anonymous markers, latest-version
    * check). With `writerId = Some(w)` the marker is keyed (w, batch)
    * and the replay check scans past OTHER writers' commits
    * (`VersionedTable.lastCommittedTxn`), so two streaming topologies
    * can append to ONE table root with interleaved commits and each
    * stays exactly-once. Blocks until the source drains (the
    * test-harness contract, like runToMemory). */
  def runVersionedAppendSink(spark: SparkSession, rows: DataFrame,
      tableRoot: String, checkpointDir: Option[String] = None,
      writerId: Option[String] = None): Unit = {
    val writer = rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        versionedAppendBatch(spark, tableRoot, batch, batchId, writerId)
      }
    val q = checkpointDir
      .map(writer.option("checkpointLocation", _))
      .getOrElse(writer)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** One micro-batch of [[runVersionedAppendSink]], idempotent per
    * `batchId`: Structured Streaming replays at most the LAST
    * unacknowledged batch after a restart. Anonymous (single-writer)
    * mode compares against the latest committed `#txn:` marker — a
    * complete duplicate check when this is the only writer; with
    * `writerId`, the check is this writer's newest marker ANYWHERE in
    * the manifest chain, which stays complete when other writers'
    * commits land in between. Factored out so the crash-replay path
    * is directly testable. */
  private[graft] def versionedAppendBatch(spark: SparkSession,
      tableRoot: String, batch: DataFrame, batchId: Long,
      writerId: Option[String] = None): Unit = {
    import graft.sources.VersionedTable
    val v = VersionedTable.latestVersion(spark, tableRoot)
    val alreadyCommitted = writerId match {
      case Some(w) => VersionedTable.lastCommittedTxn(spark, tableRoot, w)
        .contains(batchId)
      case None => VersionedTable.committedTxn(spark, tableRoot)
        .contains(batchId)
    }
    // first batch initializes; later batches append optimistically —
    // unless this writer's txn marker already records the batch,
    // i.e. we are a post-crash replay of a committed batch
    if (v < 0)
      VersionedTable.init(spark, tableRoot, batch, txn = Some(batchId),
        txnAppId = writerId)
    else if (!alreadyCommitted)
      VersionedTable.append(spark, tableRoot, batch, v, txn = Some(batchId),
        txnAppId = writerId)
  }

  /** Streaming CURATION ingest — the full incremental funnel as a
    * sink: each micro-batch runs `Curation.ingest` (quality gate,
    * exact + near dedup, decontamination) against the table's CURRENT
    * state and commits the survivors as one atomic version. Because
    * the corpus is re-read at the latest version per batch, batch N+1
    * dedups against everything batch N landed — continuous crawl
    * ingestion with monotone corpus growth, where the version history
    * IS the curation audit log (v_k = the corpus after batch k; time
    * travel reproduces any training snapshot).
    *
    * The table must be initialized with the seed corpus
    * (`VersionedTable.init`) before the stream starts — a curation
    * funnel needs a corpus to curate against, so an uninitialized
    * root fails loudly rather than silently treating batch 1 as
    * trusted. Idempotent per batchId via the `#txn:` manifest marker
    * (checked BEFORE the funnel runs — a crash replay re-curates
    * nothing). `bench` is the fixed decontamination set. Blocks until
    * the source drains (the runToMemory harness contract). */
  def runIngestSink(spark: SparkSession, rows: DataFrame,
      tableRoot: String, bench: DataFrame,
      checkpointDir: Option[String] = None,
      minTokens: Int = 20, nearThreshold: Double = 0.7): Unit = {
    require(graft.sources.VersionedTable.latestVersion(spark, tableRoot) >= 0,
      s"ingest table $tableRoot must be initialized with the seed corpus " +
        "before streaming into it")
    val writer = rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, tableRoot, batch, bench, batchId,
          minTokens, nearThreshold)
      }
    val q = checkpointDir
      .map(writer.option("checkpointLocation", _))
      .getOrElse(writer)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** One micro-batch of [[runIngestSink]], factored out so the
    * grown-corpus and crash-replay paths are directly testable. */
  private[graft] def ingestBatch(spark: SparkSession, tableRoot: String,
      batch: DataFrame, bench: DataFrame, batchId: Long,
      minTokens: Int = 20, nearThreshold: Double = 0.7): Unit = {
    import graft.sources.VersionedTable
    if (!VersionedTable.committedTxn(spark, tableRoot).contains(batchId)) {
      val v = VersionedTable.latestVersion(spark, tableRoot)
      val corpus = VersionedTable.read(spark, tableRoot, Some(v))
      val surv = graft.pipeline.Curation.ingest(batch, corpus, bench,
        minTokens = minTokens, nearThreshold = nearThreshold)
      VersionedTable.append(spark, tableRoot, surv, v, txn = Some(batchId))
    }
  }

  /** STREAMING MATERIALIZED-VIEW FOLLOW — the glue that turns
    * [[graft.sources.MaterializedView.refresh]] into a continuously
    * maintained view: a Structured Streaming query over the base's
    * versioned stream whose ONLY job is to call `refresh` once per
    * micro-batch. The stream is the TRIGGER, not the data path:
    *
    *  - offsets ARE base versions ([[graft.sources
    *    .VersionedTableMicroBatchStream]]), so a micro-batch fires
    *    exactly when the base commits — no polling loop to write, and
    *    `Trigger.AvailableNow`/`processAllAvailable` drain semantics
    *    come free;
    *  - the batch carries NO DATA (`triggerOnly`: the source plans
    *    zero partitions per batch). `refresh` reads the change feed
    *    off the CDF plane itself (signed fold, decimal-exact,
    *    O(delta)), so streaming the rows would read the same delta
    *    twice — and the data-less batch also means the snapshot
    *    stream's append-only restriction never applies, making the
    *    follow exactly as rewrite-tolerant as `refresh` is:
    *    SUM/COUNT/AVG views fold rewrite ranges through CDC files or
    *    the snapshot diff; INSERT-ONLY views (MIN/MAX/HLL) hit
    *    refresh's loud refusal, which FAILS THE QUERY — the correct
    *    outcome (run fullRefresh, restart the follow) rather than a
    *    silently stale extreme.
    *
    * Exactly-once is the WATERMARK's, not the checkpoint's: every
    * refresh commits atomically with its `#txn:graft-mv:<baseV>`
    * marker, so a replayed trigger (crash before the stream
    * checkpoint advanced, a checkpoint-less restart re-firing the
    * initial batch) finds the watermark current and no-ops. The
    * stream checkpoint is therefore OPTIONAL — pass one to avoid
    * re-triggering from the initial offset at restart, not for
    * correctness. The returned query runs until stopped; use
    * `processAllAvailable()` to drain synchronously. */
  def followMaterializedView(spark: SparkSession, mvRoot: String,
      checkpointDir: Option[String] = None,
      queryName: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val base = graft.sources.MaterializedView
      .definition(spark, mvRoot).base
    val writer = spark.readStream.format("graft-versioned-stream")
      .option("triggerOnly", "true")
      .load(base)
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        graft.sources.MaterializedView.refresh(spark, mvRoot): Unit
      }
    val named = queryName.map(writer.queryName).getOrElse(writer)
    checkpointDir.map(named.option("checkpointLocation", _))
      .getOrElse(named)
      .start()
  }

  /** Run any of the above on a stream into an in-memory table and block
    * until the file source drains — the synchronous harness used by
    * tests and demos. Returns the materialized result. */
  def runToMemory(spark: SparkSession, streamed: DataFrame,
      queryName: String, outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
