package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-behavior analytics (SURVEY.md §2.3 extension; no reference
  * counterpart — the reference has no event surface at all). The three
  * classic product-analytics shapes over an event stream: ordered
  * funnels, cohort retention, and rolling anomaly flags. Each is
  * spelled in exact arithmetic (integer counts, epoch-day indexes,
  * strict timestamp comparisons) so a DuckDB oracle hash-gates it.
  */
object Behavior {

  /** Ordered funnel: for each prefix of `steps`, how many users
    * completed the whole prefix in STRICT temporal order — step k's
    * event must be strictly later than the user's earliest valid
    * step-(k−1) completion. Equal timestamps do NOT advance the funnel
    * (strictly-after is deterministic and engine-portable, where a
    * tie-break on ids would need an int64-overflowing composite key).
    *
    * Semantics: t₁(u) = min ts of a step-1 event; tₖ(u) = min ts of a
    * step-k event with ts > tₖ₋₁(u). The earliest-completion choice is
    * the standard greedy argument: taking the minimum valid timestamp
    * at every step dominates any other witness, so a user is counted
    * iff ANY strictly-ordered witness sequence exists.
    *
    * At 100 TB: each step is one filtered-scan → join-on-user →
    * partial+final min aggregate. Every shuffle in the cascade hashes
    * on the user key, so stage k's aggregate output is already
    * partitioned for stage k+1's join — Catalyst reuses the
    * partitioning and only the (much smaller) per-step event slices
    * move. The per-user frontier is |users who reached k| rows,
    * shrinking monotonically down the funnel.
    *
    * Output: (step_idx, step, users) — one row per step, exact counts.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._

    val ofType = (t: String) =>
      events.filter(col(typeCol) === t)
        .select(col(userCol).as("u"), col(tsCol).as("t"))

    // frontier(k): one row per user who reached step k, with the
    // earliest completion time
    val first = ofType(steps.head).groupBy($"u").agg(min($"t").as("ft"))
    val frontiers = steps.tail.scanLeft(first) { (frontier, step) =>
      ofType(step).join(frontier, "u")
        .filter($"t" > $"ft")
        .groupBy($"u").agg(min($"t").as("ft"))
    }

    val counts = frontiers.zip(steps).zipWithIndex.map {
      case ((f, step), i) =>
        f.agg(count(lit(1)).as("users"))
          .select(lit(i + 1L).as("step_idx"), lit(step).as("step"),
            $"users")
    }
    counts.reduce(_.union(_))
  }

  /** Cohort retention: users are cohorted by their first-ever active
    * day; for every (cohort, day-offset) cell, how many of that
    * cohort's users were active again `offset` days later. THE
    * product-analytics retention triangle, and for a training-data
    * engine the same shape answers "how much of source X's day-0
    * corpus re-appears in later crawls".
    *
    * Days are epoch-day BIGINTs (no DATE column reaches the gate —
    * engines canonicalize DATE differently). Exact counts only.
    *
    * At 100 TB: one partial+final distinct over (user, day) collapses
    * the event volume to active-user-days; everything after moves only
    * those narrow rows — the first-day aggregate exchanges on the user
    * key and its output is reused partition-for-partition by the join
    * (only the active side re-hashes); the final (cohort, offset)
    * aggregate is |cohorts|×|offsets| rows.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    val active = events
      .select(col(userCol).as("u"),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .distinct()
    val cohorts = active.groupBy($"u").agg(min($"d").as("cohort_day"))
    active.join(cohorts, "u")
      .groupBy($"cohort_day", ($"d" - $"cohort_day").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Hourly resample with gap-fill and forward fill: the (key, hour)
    * grid is made DENSE — hours with no events appear with count 0 —
    * and the per-hour value sum is forward-filled across gaps, so
    * every downstream window/join sees a regular time series (the
    * resample step under any rate/trend computation; rolling stats on
    * a sparse series silently skip the empty hours that ARE the
    * signal).
    *
    * Determinism: counts are exact; the hourly value sum runs in
    * DECIMAL before surfacing DOUBLE (order-independent), and the
    * forward fill is last-non-null over the total (key, hour) order.
    *
    * At 100 TB: the hourly aggregate collapses the event volume FIRST
    * (partial+final); the grid is |keys|×|hours| narrow rows, and the
    * forward-fill window runs over that aggregate, never the raw
    * events (the q23 pre-aggregation discipline).
    */
  def resampleHourly(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val hourly = events
      .groupBy(col(keyCol).as("key"),
        date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(count(lit(1)).as("c"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("__v"))
    val grid = hourly.groupBy($"key")
      .agg(min($"hour_ts").as("__lo"), max($"hour_ts").as("__hi"))
      .select($"key", explode(sequence($"__lo", $"__hi",
        expr("interval 1 hour"))).as("hour_ts"))
    val w = Window.partitionBy($"key").orderBy($"hour_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("key", "hour_ts"), "left")
      .select($"key", $"hour_ts", coalesce($"c", lit(0L)).as("c"),
        last($"__v", ignoreNulls = true).over(w).as("v_filled"))
  }

  /** Rolling anomaly flags: for each (key, day) count, flag days whose
    * count deviates from the TRAILING `window`-day mean by more than
    * `k` sample standard deviations. The flag is computed entirely in
    * cross-multiplied int64 arithmetic — no float mean/stddev ever
    * materializes — so the boolean hash-gates in any engine:
    *
    *   (n·x − s)² · (n−1) > k² · (n·sq − s²) · n
    *
    * where s/sq/n are the trailing window's sum, sum-of-squares and
    * size (current day excluded — a spike must not defend itself).
    * Intermediate magnitude: with daily counts ≤ c, the left side is
    * ≤ (n·c)²·n — int64-safe for c up to ~10⁷ at n=7; swap the sums to
    * DECIMAL(38,0) beyond that.
    *
    * At 100 TB the input collapses to |keys|×|days| rows after one
    * partial+final count aggregate, so the trailing window runs over
    * the aggregate, never the raw events (the q23 pre-aggregation
    * discipline).
    */
  def anomalyDays(events: DataFrame, k: Long = 3L, window: Int = 7,
      keyCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(window >= 2, s"window=$window needs >= 2 trailing days")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val daily = events
      .groupBy(col(keyCol).as("key"),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(count(lit(1)).as("x"))

    val w = Window.partitionBy($"key").orderBy($"day")
      .rowsBetween(-window, -1)
    val flagged = daily
      .withColumn("s", sum($"x").over(w))
      .withColumn("sq", sum($"x" * $"x").over(w))
      .withColumn("n", count($"x").over(w))
      .withColumn("day_back", lag($"day", window).over(
        Window.partitionBy($"key").orderBy($"day")))
    // guard: need a full trailing window of actual prior days (ROWS
    // frames count rows, not days — a key dark for a week would
    // otherwise smuggle stale days into the baseline)
    val full = flagged.filter($"n" === window &&
      $"day" - $"day_back" === window)
    val dev = $"n" * $"x" - $"s"
    val varN = $"n" * $"sq" - $"s" * $"s" // n·(n−1)·sample-variance
    full.select($"key", $"day", $"x",
      (dev * dev * ($"n" - 1L) > lit(k * k) * varN * $"n")
        .as("is_anomaly"))
  }

  /** Gap-based BATCH sessionization — the batch twin of the streaming
    * session windows (streaming/Streams session op): consecutive
    * events of one user belong to the same session while the gap
    * between them is ≤ `gapSeconds`; a larger gap opens a new session
    * (gaps-and-islands, the standard spelling). Ordering is pinned to
    * the exact int64 (unix_micros, `idCol`) pair so equal timestamps
    * sessionize deterministically in both engines — timestamp
    * comparison alone would leave the lag() witness engine-dependent.
    *
    * At 100 TB: the two windows and the closing aggregate all run on
    * the SAME user-key hash partitioning (one exchange total, Catalyst
    * reuses it); per-task state is one lag value — parallelism is the
    * user-key space, the natural sharding for event data. No global
    * sort, no driver state.
    *
    * Output: (user, session_idx, session_start, session_end,
    * n_events, duration_us) — session_idx is 1-based in first-event
    * order, duration an exact µs BIGINT. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(gapSeconds > 0, s"session gap must be positive, got $gapSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val w = Window.partitionBy(col(userCol)).orderBy($"__us", col(idCol))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__brk",
        when($"__us" - lag($"__us", 1).over(w) <= gapSeconds * 1000000L,
          lit(0L)).otherwise(lit(1L)))
      .withColumn("session_idx", sum($"__brk").over(w))
      .groupBy(col(userCol), $"session_idx")
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max($"__us") - min($"__us")).as("duration_us"))
  }
}
