package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise feature normalization (SURVEY.md §2.3 extension; no
  * reference counterpart). Training pipelines normalize per-stratum —
  * "token-length z-score within each language" — because raw feature
  * scales differ wildly across strata; a global mean would let one
  * dominant language define "normal" for all of them.
  *
  * Determinism discipline: the group moments are computed as EXACT
  * integer sums (sum, sum of squares, count — all BIGINT, overflow-free
  * for 32-bit features at gate scale; swap to DECIMAL(38,0) sums at
  * 100 TB where Σx² outgrows int64), and only then folded into doubles
  * through a FIXED IEEE expression tree:
  * mean = s/n, var = (sq − s·s/n)/(n−1), z = (x − mean)/√var.
  * Every step is a single correctly-rounded IEEE-754 operation on
  * identical inputs, so any engine spelling this formula bit-matches —
  * which is what lets the DuckDB oracle hash-gate a DOUBLE output.
  *
  * At 100 TB: one partial+final aggregation over the corpus (the
  * moments), then the per-group moment table — |groups| rows — joins
  * back by BROADCAST; the corpus is scanned twice but never shuffled.
  */
object Normalize {

  /** The exact-integer-moments discipline only holds for integral
    * inputs — `cast("long")` on a DOUBLE column would silently
    * truncate and normalize the wrong numbers, so the integer
    * assumption is CHECKED, not documented. */
  private def requireIntegral(df: DataFrame, c: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"column '$c' must be integral for exact-integer normalization, " +
        s"got $dt — pre-scale floats to integers (or widen this op to " +
        "DECIMAL moments) before normalizing")
  }

  /** Append `z` — the within-group z-score of integer `valueCol` —
    * using sample (n−1) variance. Groups with fewer than 2 rows or
    * zero variance yield NULL z (no meaningful scale), mirroring
    * SQL's NULLIF guard; rows with a NULL group key are kept (LEFT
    * join) with z NULL. */
  def zscoreByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    requireIntegral(df, valueCol)
    val v = col(valueCol).cast("long")
    val moments = df.groupBy(col(groupCol))
      .agg(sum(v).as("__s"), sum(v * v).as("__sq"),
        count(v).as("__n"))
    val s = col("__s").cast("double")
    val n = col("__n").cast("double")
    val varS = (col("__sq").cast("double") - s * s / n) /
      (col("__n") - lit(1L)).cast("double")
    df.join(broadcast(moments), Seq(groupCol), "left")
      .withColumn("z",
        when(col("__n") > 1L && varS > 0.0,
          (v.cast("double") - s / n) / sqrt(varS)))
      .drop("__s", "__sq", "__n")
  }

  /** Append `clipped` — `valueCol` winsorized to its within-group
    * [loQ, hiQ] exact discrete quantiles — the outlier-robust
    * alternative to z-scoring (a feature pipeline clips before
    * scaling so a single 10 MB document doesn't define the tail).
    * Quantile semantics are exactQuantiles' rank ⌈q·n⌉, identical to
    * DuckDB's quantile_disc, so the output hash-gates. Every input row
    * is preserved (the limits join is a LEFT join, matching
    * zscoreByGroup which likewise never drops rows): NULL values yield
    * NULL clipped; rows whose group has NO limits row — groups with no
    * non-null value, and NULL group keys (equality joins don't match
    * NULL) — pass through with `clipped` = the UNCLIPPED value, since
    * Spark's greatest/least ignore the NULL bounds. "No limits" means
    * "nothing to clip against", not "discard the row".
    *
    * At 100 TB: the limits table is |groups| rows (computed by the
    * range-partitioned two-pass prefix-sum machinery — no per-group
    * sort funnel) and joins back by BROADCAST; the corpus is never
    * shuffled. */
  def winsorizeByGroup(df: DataFrame, groupCol: String, valueCol: String,
      loQ: Double = 0.1, hiQ: Double = 0.9): DataFrame = {
    require(loQ < hiQ, s"loQ=$loQ must be < hiQ=$hiQ")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol))
    val lims = graft.ops.GroupedMedian
      .exactQuantiles(vals, groupCol, valueCol, Seq(loQ, hiQ))
      .groupBy(groupCol)
      .agg(max(when(col("q") === loQ, col("value"))).as("__lo"),
        max(when(col("q") === hiQ, col("value"))).as("__hi"))
    df.join(broadcast(lims), Seq(groupCol), "left")
      .withColumn("clipped",
        when(col(valueCol).isNotNull,
          greatest(col("__lo"), least(col("__hi"), col(valueCol)))))
      .drop("__lo", "__hi")
  }

  /** Append `robust_z` — the within-group ROBUST z-score
    * (x − median) / MAD — the outlier-immune twin of zscoreByGroup: a
    * handful of 10 MB documents shifts a mean and explodes a stddev,
    * but moves neither the median nor the median absolute deviation.
    * Both statistics are exact discrete order statistics (rank ⌈q·n⌉ —
    * `GroupedMedian.exactQuantiles`, computed WITHOUT a per-group sort
    * funnel), both integers for an integer `valueCol`, so the only
    * float op is the final single correctly-rounded division —
    * (x − med) stays exact int64 — and the DOUBLE output hash-gates
    * against DuckDB's quantile_disc spelling.
    *
    * Groups whose MAD is 0 (more than half the values identical) yield
    * NULL robust_z — no meaningful scale, same contract as
    * zscoreByGroup's zero-variance guard. LEFT joins keep every row:
    * NULL values, NULL group keys, and limitless groups pass through
    * with robust_z NULL.
    *
    * At 100 TB: two |groups|-row statistic tables broadcast back; the
    * corpus is scanned for the deviation pass and the final append but
    * never shuffled. */
  def robustScaleByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    requireIntegral(df, valueCol)
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol))
    val med = graft.ops.GroupedMedian
      .exactQuantiles(vals, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("value").cast("long").as("__med"))
    val devs = vals.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol),
        abs(col(valueCol).cast("long") - col("__med")).as("__dev"))
    val mad = graft.ops.GroupedMedian
      .exactQuantiles(devs, groupCol, "__dev", Seq(0.5))
      .select(col(groupCol), col("value").cast("long").as("__mad"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .join(broadcast(mad), Seq(groupCol), "left")
      .withColumn("robust_z",
        when(col(valueCol).isNotNull && col("__mad") > 0L,
          (col(valueCol).cast("long") - col("__med")).cast("double") /
            col("__mad").cast("double")))
      .drop("__med", "__mad")
  }

  /** Append `pct_rank` — the within-group PERCENT_RANK of `valueCol`
    * ((#strictly-smaller values)/(n−1); single-row groups rank 0, SQL
    * semantics) — computed by the range-partitioned prefix-sum
    * machinery (`GroupedMedian.percentileRanks`) instead of a
    * PERCENT_RANK window, which would funnel each group through ONE
    * sort task. The per-distinct-value rank relation joins back on
    * (group, value) as a plain hash join — it is corpus-sized for
    * near-unique columns, so unlike the winsorize/robust statistic
    * tables it is NOT broadcast. The single division is the only
    * float op, so the DOUBLE hash-gates against the window spelling.
    * NULL values keep their rows with NULL pct_rank (LEFT join). */
  def percentileRankByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val ranks = graft.ops.GroupedMedian
      .percentileRanks(df, groupCol, valueCol)
      .withColumnRenamed("value", valueCol)
    df.join(ranks, Seq(groupCol, valueCol), "left")
      .withColumn("pct_rank",
        when(col("n") > 1L,
          col("before").cast("double") / (col("n") - 1L).cast("double"))
          .when(col("n") === 1L, lit(0.0)))
      .drop("before", "n")
  }

  /** Per-group Pearson correlation of two integer columns — "does doc
    * length track token count within each language" and every other
    * feature-vs-feature sanity check a curation pipeline runs. Spark's
    * `corr` aggregate accumulates doubles in partition order, so its
    * low bits are partitioning-dependent and can never hash-gate; this
    * spelling accumulates the five EXACT integer sums (the zscore
    * discipline — int64 is ample at gate scale, swap to DECIMAL(38,0)
    * at 100 TB) and folds them through a fixed IEEE tree:
    * r = (n·sxy − sx·sy) / (√(n·sxx − sx²)·√(n·syy − sy²)), every
    * step one correctly-rounded op on identical inputs in any engine.
    * Rows with a NULL in either column are excluded (SQL corr
    * semantics); groups with n < 2 or zero variance on either side
    * yield NULL r. One partial+final aggregate — the corpus never
    * shuffles. */
  def corrByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    requireIntegral(df, xCol)
    requireIntegral(df, yCol)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val sums = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
    // exact int64 pieces, then one fixed double tree
    val dx = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val dy = col("n") * col("__syy") - col("__sy") * col("__sy")
    val num = col("n") * col("__sxy") - col("__sx") * col("__sy")
    sums.select(col(groupCol), col("n"),
      when(col("n") > 1L && dx > 0L && dy > 0L,
        num.cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))).as("r"))
  }
}
