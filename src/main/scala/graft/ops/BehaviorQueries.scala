package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-behavior analytics (ops.Behavior) on the driver's oracle
  * gate: ordered funnel, cohort retention, rolling anomaly flags —
  * all exact arithmetic, all hash-gated against DuckDB twins.
  */
object BehaviorQueries extends QueryPack {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  def funnel(s: SparkSession, d: String): DataFrame =
    Behavior.funnel(ev(s, d), Seq("view", "click", "purchase"))
      .orderBy("step_idx")

  def retention(s: SparkSession, d: String): DataFrame =
    Behavior.retention(ev(s, d))
      .orderBy("cohort_day", "day_offset")

  // k=2 trailing-7-day flags; boolean surfaced as BIGINT 0/1 (the
  // gate's canonicalizer has no boolean precedent)
  def anomaly(s: SparkSession, d: String): DataFrame =
    Behavior.anomalyDays(ev(s, d), k = 2L, window = 7)
      .withColumn("is_anomaly", col("is_anomaly").cast("long"))
      .orderBy("key", "day")

  def resample(s: SparkSession, d: String): DataFrame =
    Behavior.resampleHourly(ev(s, d))
      .orderBy("key", "hour_ts")

  // 24 h gap — the synthetic stream is sparse (median inter-event gap
  // ~7 h), so a day-gap yields real multi-event sessions (~8 events
  // each at sf0.01); production web sessions use the 30 min default
  def sessionizeQ(s: SparkSession, d: String): DataFrame =
    Behavior.sessionize(ev(s, d), gapSeconds = 86400L)
      .orderBy("user_id", "session_idx")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_funnel" -> funnel _,
    "events_retention" -> retention _,
    "events_anomaly" -> anomaly _,
    "events_resample" -> resample _,
    "events_sessionize" -> sessionizeQ _,
  )

  override def oracle: Map[String, String] = Map(
    // strictly-after cascade; equal timestamps never advance the
    // funnel (Behavior.funnel's portable-strictness contract)
    "events_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
        |    (SELECT COUNT(*) FROM s1) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
        |ORDER BY step_idx""".stripMargin,
    "events_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |cohorts AS (SELECT u, MIN(d) AS cohort_day FROM active GROUP BY u)
        |SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
        |  CAST(d - cohort_day AS BIGINT) AS day_offset,
        |  COUNT(*) AS active_users
        |FROM active JOIN cohorts USING (u)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // dense per-key hourly grid; DECIMAL-exact hour sums surfaced as
    // DOUBLE; forward fill = last-non-null over the total hour order
    "events_resample" ->
      """WITH hourly AS (
        |  SELECT event_type AS key,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
        |    COUNT(*) AS c,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT key, MIN(hour_ts) AS lo, MAX(hour_ts) AS hi
        |  FROM hourly GROUP BY key),
        |grid AS (
        |  SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |    AS hour_ts
        |  FROM bounds)
        |SELECT g.key, g.hour_ts, COALESCE(h.c, 0) AS c,
        |  last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.key
        |    ORDER BY g.hour_ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM grid g LEFT JOIN hourly h
        |  ON g.key = h.key AND g.hour_ts = h.hour_ts
        |ORDER BY g.key, g.hour_ts""".stripMargin,
    // the cross-multiplied integer spelling of |x − mean| > k·stddev
    // over the trailing 7 closed days (current day excluded); rows
    // without a gap-free full window are filtered on both sides
    "events_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type AS key,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT key, day, x,
        |    SUM(x) OVER w AS s, SUM(x * x) OVER w AS sq,
        |    COUNT(x) OVER w AS n,
        |    LAG(day, 7) OVER (PARTITION BY key ORDER BY day) AS day7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY key ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT key, CAST(day AS BIGINT) AS day, x,
        |  CAST((n*x - s)*(n*x - s)*(n - 1) > 4*(n*sq - s*s)*n
        |    AS BIGINT) AS is_anomaly
        |FROM r WHERE n = 7 AND day - day7 = 7
        |ORDER BY key, day""".stripMargin,
    // gaps-and-islands on the exact (unix_micros, event_id) order;
    // CASE's ELSE catches the NULL lag like Spark's otherwise()
    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, t, us,
        |    CASE WHEN us - LAG(us) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id)
        |      <= 86400000000 THEN 0 ELSE 1 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, t, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  MIN(t) AS session_start, MAX(t) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
  )
}
