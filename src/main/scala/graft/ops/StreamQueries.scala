package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.Streams

/** Batch twins of the streaming transforms (Streams.scala) on the
  * driver's oracle gate: identical operator code runs over the batch
  * events table here and over readStream in StreamingSpec — Spark's
  * incremental execution is the only difference.
  */
object StreamQueries extends QueryPack {

  def tumbling(s: SparkSession, d: String): DataFrame =
    Streams.tumblingCounts(Tables.events(s, d))
      .orderBy("w_start", "event_type")

  def sliding(s: SparkSession, d: String): DataFrame =
    Streams.slidingCounts(Tables.events(s, d))
      .orderBy("w_start", "event_type")

  def session(s: SparkSession, d: String): DataFrame =
    Streams.sessionCounts(Tables.events(s, d))
      .orderBy("user_id", "w_start")

  def interval(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    Streams.intervalJoin(ev, ev).orderBy("pid", "cid")
  }

  // the outer variant: purchases without an attributable click surface
  // with -1 sentinels instead of vanishing
  def intervalOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    Streams.intervalJoinOuter(ev, ev).orderBy("pid", "cid")
  }

  // exactly-once dedup: same dropDuplicatesWithinWatermark code path
  // the stream runs (StreamingSpec), executed as its batch twin here
  def dedup(s: SparkSession, d: String): DataFrame =
    Streams.dedupEvents(Tables.events(s, d))
      .select(org.apache.spark.sql.functions.col("event_id"))
      .orderBy("event_id")

  // stream-static enrichment: events decorated with the customer dim
  // (left join keeps dim-less events visible; segment coalesced so
  // both engines sort identically)
  def enrich(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Streams.enrichEvents(
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type")),
      Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
      "user_id", "c_custkey")
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
      .orderBy("event_id")
  }

  // stream-static AS-OF enrichment: each event decorated with the
  // user's most recent signup at-or-before its timestamp (the
  // slowly-changing-dimension lookup), spelled as STATELESS interval
  // containment — the static side is closed into [asof_ts, next)
  // validity intervals so the stream join needs no watermark or state
  // (Streams.asofEnrich); -1 sentinels keep never-signed-up events
  // visible and the sort total
  def asof(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(s, d)
    val dim = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("dim_user"), col("ts").as("dim_ts"),
        col("event_id").as("dim_event"), col("value").as("prof_value"))
    Streams.asofEnrich(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      dim, "user_id", "dim_user", "ts", "dim_ts",
      tieBreak = Seq("dim_event"))
      .select(col("event_id"), col("user_id"),
        coalesce(unix_micros(col("asof_ts")), lit(-1L)).as("asof_us"),
        coalesce(col("prof_value"), lit(-1.0)).as("prof_value"))
      .orderBy("event_id")
  }

  private def typedEvents(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d)
      .selectExpr("event_id", "unix_micros(ts) AS tsMicros", "user_id",
        "event_type", "value")
      .as[graft.streaming.Event]
  }

  // mapGroupsWithState running totals, executed on its batch path: the
  // gate checks the per-user event COUNTS (exact longs); the double
  // total is iteration-order-dependent and stays spec-gated
  def runningTotals(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Streams.userRunningTotals(typedEvents(s, d)).toDF()
      .select(col("user_id"), col("n_events"))
      .orderBy("user_id")
  }

  // flatMapGroupsWithState multi-row emission: milestone rows at every
  // 10th cumulative event per user — count crossings are
  // order-independent, so the full emitted set is exactly
  // SQL-expressible and hash-gated
  def milestones(s: SparkSession, d: String): DataFrame =
    Streams.userMilestones(typedEvents(s, d), every = 10).toDF()
      .orderBy("user_id", "milestone")

  // stream-static novelty: post-cut events pass through only when the
  // pre-cut corpus never saw their (user, action) combo — stateless
  // broadcast anti join, same Streams code the readStream path runs
  def novel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(s, d)
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    Streams.novelEvents(
      ev.filter(col("ts") >= cut)
        .select(col("event_id"), col("user_id"), col("event_type")),
      ev.filter(col("ts") < cut),
      Seq("user_id", "event_type"))
      .orderBy("event_id")
  }

  // the ONE gate that runs a REAL streaming query (every other
  // stream_* row is the batch twin of code StreamingSpec streams):
  // a versioned table is built, a Structured Streaming query tails it
  // through the DSv2 `graft-versioned-stream` source (snapshot
  // micro-batch, then a live append's delta micro-batch), and the
  // drained memory sink must equal the table's content — offsets,
  // delta resolution, and the parquet delegation all hash-gated
  // against DuckDB recomputing the same rows from the raw documents.
  def tableTail(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Round-20 re-basing (LifecycleFixtures): the streaming tail —
    // table build, snapshot micro-batch, live append, delta
    // micro-batch — runs ONCE per session; the drained sink persists
    // to the fixture dir and the per-call body SERVES it (bench rows
    // measure serve cost, not stream start/stop; the epoch-write
    // cost is ScaleBench's stream decade row).
    val out = LifecycleFixtures(s, d, "stail") { tmpRoot =>
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
      val root = tmpRoot.resolve("tbl").toString
      graft.sources.VersionedTable.init(s, root,
        base.filter(col("doc_id") < 150))
      val q = s.readStream.format("graft-versioned-stream").load(root)
        .writeStream.format("memory").queryName("stream_table_tail_mem")
        .outputMode("append").start()
      try {
        q.processAllAvailable() // snapshot micro-batch
        graft.sources.VersionedTable.append(s, root,
          base.filter(col("doc_id") >= 150 && col("doc_id") < 300),
          expectedVersion = 0)
        q.processAllAvailable() // the append's delta micro-batch
      } finally q.stop()
      // persist the drained sink: a memory table is session-scoped,
      // the fixture is application-scoped
      val o = tmpRoot.resolve("out").toString
      s.table("stream_table_tail_mem").write.parquet(o)
      o
    }
    s.read.parquet(out)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
      .localCheckpoint(true)
  }

  // the capstone REAL streaming topology: versioned log in, versioned
  // log out — one table's change-feed stream (readChangeFeed DSv2
  // mode) relayed into a catalog table via writeStream.toTable (the
  // txn-marker streaming sink), across TWO micro-batches (snapshot
  // replay, then a live append's delta). The sink table's content is
  // hash-gated against DuckDB recomputing feed rows + commit
  // provenance from the raw documents — source offsets, change
  // tagging, the streaming write's atomic append, and the catalog
  // read-back all in one oracle row.
  def tableSink(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Round-20 re-basing (LifecycleFixtures): the relay topology —
    // upstream build, CDF stream start, two micro-batches, streaming
    // toTable sink — runs ONCE per session; per-call the body is the
    // catalog READ-BACK of the sunk table (bench rows measure serve
    // cost). The catalog registration is session conf over an
    // application-wide cache, so it re-registers per call (the
    // spj_join precedent).
    val (cat, wh) = LifecycleFixturesKV(s, d, "ssink") { tmpRoot =>
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
      val up = tmpRoot.resolve("up").toString
      val ck = tmpRoot.resolve("ck").toString
      val c = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
      val w = tmpRoot.resolve("wh").toString
      s.conf.set(s"spark.sql.catalog.$c",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$c.warehouse", w)
      graft.sources.VersionedTable.init(s, up,
        base.filter(col("doc_id") < 150))
      s.sql(s"CREATE TABLE $c.sink (doc_id BIGINT, lang STRING, " +
        "text STRING, change_kind STRING, `_commit_version` BIGINT)")
      val q = s.readStream.format("graft-versioned-stream")
        .option("readChangeFeed", "true").load(up)
        .writeStream.option("checkpointLocation", ck)
        .toTable(s"$c.sink")
      try {
        q.processAllAvailable() // v0 replay micro-batch
        graft.sources.VersionedTable.append(s, up,
          base.filter(col("doc_id") >= 150 && col("doc_id") < 300),
          expectedVersion = 0)
        q.processAllAvailable() // v1's delta micro-batch
      } finally q.stop()
      (c, w)
    }
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"SELECT doc_id, lang, md5(text) AS text_md5, " +
      s"change_kind, `_commit_version` FROM $cat.sink ORDER BY doc_id")
      .localCheckpoint(true)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_table_tail" -> tableTail _,
    "stream_table_sink" -> tableSink _,
    "stream_novel" -> novel _,
    "stream_running_totals" -> runningTotals _,
    "stream_milestones" -> milestones _,
    "stream_enrich" -> enrich _,
    "stream_asof" -> asof _,
    "stream_tumbling" -> tumbling _,
    "stream_sliding" -> sliding _,
    "stream_session" -> session _,
    "stream_interval_join" -> interval _,
    "stream_interval_outer" -> intervalOuter _,
    "stream_dedup" -> dedup _,
  )

  override def oracle: Map[String, String] = Map(
    // the streamed tail of the versioned table == its content
    "stream_table_tail" ->
      """SELECT doc_id, lang, md5(text) AS text_md5
        |FROM documents WHERE doc_id < 300
        |ORDER BY doc_id""".stripMargin,
    // the relayed change feed: every row an insert, tagged with the
    // upstream commit that produced it (v0 = the initial snapshot,
    // v1 = the live append)
    "stream_table_sink" ->
      """SELECT doc_id, lang, md5(text) AS text_md5,
        |  'insert' AS change_kind,
        |  CAST(CASE WHEN doc_id < 150 THEN 0 ELSE 1 END AS BIGINT)
        |    AS _commit_version
        |FROM documents WHERE doc_id < 300
        |ORDER BY doc_id""".stripMargin,
    "stream_novel" ->
      """WITH seen AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00')
        |SELECT event_id, user_id, event_type FROM events
        |ANTI JOIN seen USING (user_id, event_type)
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "stream_running_totals" ->
      """SELECT user_id, COUNT(*) AS n_events FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_milestones" ->
      """WITH c AS (
        |  SELECT user_id, COUNT(*) // 10 AS k FROM events GROUP BY user_id),
        |m AS (
        |  SELECT user_id, 10 * unnest(range(1, k + 1)) AS milestone FROM c)
        |SELECT user_id, CAST(milestone AS BIGINT) AS milestone FROM m
        |ORDER BY user_id, milestone""".stripMargin,
    "stream_enrich" ->
      """SELECT event_id, user_id, event_type,
        |  COALESCE(c_mktsegment, 'NONE') AS segment
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,
    "stream_dedup" ->
      """SELECT DISTINCT event_id FROM events ORDER BY event_id""",
    // the dim filter lives in the CTE, never the ON clause (an
    // ON-clause left-side filter would null-extend instead of filter);
    // version-time ties totalized by event_id on both engines
    "stream_asof" ->
      """WITH dim AS (
        |  SELECT user_id AS dim_user, CAST(ts AS TIMESTAMP) AS dim_ts,
        |    value AS prof_value,
        |    LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS v_until
        |  FROM events WHERE event_type = 'signup')
        |SELECT e.event_id, e.user_id,
        |  COALESCE(epoch_us(d.dim_ts), -1) AS asof_us,
        |  COALESCE(d.prof_value, -1.0) AS prof_value
        |FROM events e LEFT JOIN dim d ON e.user_id = d.dim_user
        |  AND CAST(e.ts AS TIMESTAMP) >= d.dim_ts
        |  AND (d.v_until IS NULL OR CAST(e.ts AS TIMESTAMP) < d.v_until)
        |ORDER BY event_id""".stripMargin,
    "stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
        |  COUNT(*) AS c,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_sliding" ->
      """WITH starts AS (
        |  SELECT event_type, unnest([
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)),
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS w_start
        |  FROM events)
        |SELECT w_start, event_type, COUNT(*) AS c
        |FROM starts GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_interval_join" ->
      """SELECT p.event_id AS pid, c.event_id AS cid, p.user_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) AS p_us,
        |  epoch_us(CAST(c.ts AS TIMESTAMP)) AS c_us
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 60 MINUTE
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |ORDER BY pid, cid""".stripMargin,
    "stream_interval_outer" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
        |    CAST(ts AS TIMESTAMP) AS p_ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS cid, user_id,
        |    CAST(ts AS TIMESTAMP) AS c_ts FROM events
        |  WHERE event_type = 'click')
        |SELECT pid, COALESCE(cid, -1) AS cid, p.user_id,
        |  epoch_us(p_ts) AS p_us, COALESCE(epoch_us(c_ts), -1) AS c_us
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c_ts >= p_ts - INTERVAL 60 MINUTE AND c_ts <= p_ts
        |ORDER BY pid, cid""".stripMargin,
    "stream_session" ->
      """WITH x AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER
        |        (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER
        |        (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |y AS (SELECT user_id, ts,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT MIN(ts) AS w_start, MAX(ts) + INTERVAL 30 MINUTE AS w_end,
        |  user_id, COUNT(*) AS c
        |FROM y GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin,
  )
}
