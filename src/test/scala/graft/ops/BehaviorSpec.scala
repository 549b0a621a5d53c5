package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (user, type, ts-second) — u1 clean completion; u2's click TIES the
  // view timestamp (must NOT advance); u3's first click precedes its
  // view (must be ignored, later click counts); u4 stalls at view;
  // u5 never views at all
  private lazy val funnelEvents = Seq(
    (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3),
    (2L, "view", 1), (2L, "click", 1), (2L, "purchase", 5),
    (3L, "click", 1), (3L, "view", 2), (3L, "click", 3), (3L, "purchase", 4),
    (4L, "view", 7),
    (5L, "click", 1), (5L, "purchase", 2),
  ).map { case (u, t, sec) =>
    (u, t, ts(f"2024-01-01 00:00:$sec%02d"))
  }.toDF("user_id", "event_type", "ts")

  test("funnel counts strictly-ordered prefix completions") {
    val got = Behavior.funnel(funnelEvents, Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .select("step_idx", "step", "users")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "view", 4L), (2L, "click", 2L),
      (3L, "purchase", 2L)))
  }

  test("funnel: an equal-timestamp step never advances") {
    // u2 in isolation: click at the same instant as view
    val got = Behavior.funnel(funnelEvents.filter($"user_id" === 2L),
      Seq("view", "click")).orderBy("step_idx")
      .select("users").as[Long].collect().toSeq
    assert(got === Seq(1L, 0L))
  }

  test("funnel: single step equals distinct-user count of that type") {
    val got = Behavior.funnel(funnelEvents, Seq("click"))
      .select("users").as[Long].head()
    assert(got === 4L) // u1 u2 u3 u5
  }

  test("retention cohorts by first-active day, exact cell counts") {
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay // 19723
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (1L, "2024-01-04 10:00:00"),
      (2L, "2024-01-02 01:00:00"), (2L, "2024-01-02 23:00:00"), // same day
      (2L, "2024-01-03 01:00:00"),
      (3L, "2024-01-04 12:00:00"),
    ).map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    val got = Behavior.retention(ev).orderBy("cohort_day", "day_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (d0, 0L, 1L), (d0, 1L, 1L), (d0, 3L, 1L),
      (d0 + 1, 0L, 1L), (d0 + 1, 1L, 1L),
      (d0 + 3, 0L, 1L)))
  }

  test("anomalyDays flags a planted spike and nothing else") {
    // one key: days 0..9 at 10 events/day, day 10 spikes to 30
    val rows = for {
      day <- 0 to 10
      n = if (day == 10) 30 else 10
      i <- 1 to n
    } yield ("err", ts(f"2024-01-${day + 1}%02d 00:00:${i % 60}%02d"), i)
    val ev = rows.toDF("event_type", "ts", "i")
    val got = Behavior.anomalyDays(ev, k = 2L, window = 7)
      .orderBy("day").select("day", "x", "is_anomaly")
      .as[(Long, Long, Boolean)].collect().toSeq
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    // first full gap-free trailing window exists from day 7 on
    assert(got.map(_._1) === Seq(d0 + 7, d0 + 8, d0 + 9, d0 + 10))
    assert(got.map(_._3) === Seq(false, false, false, true))
  }

  test("resampleHourly fills gaps with zero counts and forward-fills values") {
    val ev = Seq(
      ("a", "2024-01-01 00:10:00", 1.5), ("a", "2024-01-01 00:50:00", 2.5),
      ("a", "2024-01-01 01:10:00", 3.0),
      ("a", "2024-01-01 04:10:00", 7.0), // hours 2,3 are gaps
      ("b", "2024-01-01 10:10:00", 1.0), // independent bounds per key
    ).map { case (k, t, v) => (k, ts(t), v) }
      .toDF("event_type", "ts", "value")
    val got = Behavior.resampleHourly(ev).orderBy("key", "hour_ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(got === Array(
      ("a", "2024-01-01 00:00:00.0", 2L, 4.0),
      ("a", "2024-01-01 01:00:00.0", 1L, 3.0),
      ("a", "2024-01-01 02:00:00.0", 0L, 3.0), // gap: c=0, value carried
      ("a", "2024-01-01 03:00:00.0", 0L, 3.0),
      ("a", "2024-01-01 04:00:00.0", 1L, 7.0),
      ("b", "2024-01-01 10:00:00.0", 1L, 1.0)), got.mkString(","))
  }

  test("anomalyDays: a gap in the trailing days disqualifies the row") {
    // days 0..5 and 7..13 present, day 6 missing: day 13's trailing 7
    // ROWS span days 5..12 (8 calendar days) — must be filtered
    val rows = for {
      day <- (0 to 5) ++ (7 to 13)
      i <- 1 to 10
    } yield ("err", ts(f"2024-01-${day + 1}%02d 00:00:${i % 60}%02d"))
    val ev = rows.toDF("event_type", "ts")
    val d0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val days = Behavior.anomalyDays(ev, k = 2L, window = 7)
      .select("day").as[Long].collect().toSet
    assert(!days.contains(d0 + 13))
    assert(days.contains(d0 + 14) === false) // no such day at all
  }

  // u1: events at t=0s, 10s, 25s, then 100s (gap 75 > 30 opens session
  // 2); u2: one event; u3: two events exactly 30s apart (boundary gap
  // is ≤, same session) and a third at the SAME timestamp as the
  // second (ties order by event_id, gap 0, same session)
  private lazy val sessionEvents = Seq(
    (1L, 1L, 0), (2L, 1L, 10), (3L, 1L, 25), (4L, 1L, 100),
    (5L, 2L, 50),
    (6L, 3L, 0), (7L, 3L, 30), (8L, 3L, 30),
  ).map { case (e, u, sec) =>
    (e, u, java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong)))
  }.toDF("event_id", "user_id", "ts")

  test("sessionize: gap opens a session, boundary gap and ties do not") {
    val got = Behavior.sessionize(sessionEvents, gapSeconds = 30L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 3L, 25000000L), // 0,10,25 — gaps 10,15 ≤ 30
      (1L, 2L, 1L, 0L), // 100 — gap 75 > 30
      (2L, 1L, 1L, 0L),
      (3L, 1L, 3L, 30000000L), // 30s boundary gap merges; tie merges
    ), s"got $got")
  }

  test("sessionize: session bounds are the member min/max timestamps") {
    val exp = sessionEvents.filter($"user_id" === 1L && $"event_id" <= 3L)
      .agg(min($"ts"), max($"ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    val r = Behavior.sessionize(sessionEvents, gapSeconds = 30L)
      .filter($"user_id" === 1L && $"session_idx" === 1L)
      .select($"session_start", $"session_end")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    assert(r === exp)
  }

  test("sessionize plan: one exchange on the user key, reused by both windows and the aggregate") {
    val plan = Behavior.sessionize(sessionEvents, gapSeconds = 30L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("ReusedExchange") &&
        !l.contains("BroadcastExchange"))
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
