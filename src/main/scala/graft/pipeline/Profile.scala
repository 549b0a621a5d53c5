package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling and constraint auditing (SURVEY.md §2.3 extension;
  * no reference counterpart). Before a 100 TB corpus is worth
  * training on it has to be worth TRUSTING: completeness/cardinality
  * profiles and rule-based validation are the standard first audit
  * (the Deequ/TFDV capability class), and both reduce to aggregation
  * shapes Spark executes as ONE partial+final pass — profiling a
  * corpus costs one scan, never one scan per column.
  *
  * Determinism discipline: every statistic is an exact integer count
  * or a string min/max under binary collation — no doubles anywhere —
  * so the DuckDB oracle hash-gates each output row.
  */
object Profile {

  /** Integer-exact bucketing is only exact on integral inputs — and
    * the formula's intermediate product must not wrap, so it runs in
    * DECIMAL(38,0): (v − lo) ≤ 2⁶⁴ is 20 digits, ×buckets stays far
    * under 38, and `div` (integral division) lands back in int64. The
    * value column is referenced ONLY through the pre-bound fixed name
    * `__v`, so column names needing backticks can never break the
    * parse. Callers bind __v/__lo/__hi before applying. */
  private def bucketExpr(buckets: Int): Column =
    expr(s"least(${buckets - 1}, " +
      s"((__v - __lo) * $buckets) div (__hi - __lo + 1))")

  private def requireIntegral(df: DataFrame, c: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"column '$c' must be integral for integer-exact bucketing, got $dt")
  }

  /** Per-column profile: one output row per profiled column with
    * non-null count, null count, exact distinct count, and min/max
    * rendered as strings (one schema for any column type). ALL columns
    * profile in a single aggregate — one corpus scan; the distinct
    * counts expand to the standard Expand-based multi-distinct plan.
    * At 100 TB swap `countDistinct` for approx_count_distinct when an
    * estimate suffices — the frame shape is unchanged. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row to (col_name, stats...) — stack is
    // a generator, so this stays one job with no shuffle after the agg
    val stackArgs = cols.map(c =>
      s"'$c', __n_$c, __nulls_$c, __distinct_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.selectExpr(s"stack(${cols.length}, $stackArgs) AS " +
      "(col_name, n_values, n_nulls, n_distinct, min_val, max_val)")
  }

  /** Rule-based constraint audit: `rowRules` are named boolean
    * predicates evaluated per row (a NULL predicate counts as a
    * violation — "not known to hold" fails an audit); `uniqueCols`
    * adds a uniqueness rule per column (violations = rows − distinct
    * values, counting every row beyond the first of a duplicate key).
    * Returns (rule, n_rows, n_violations), one row per rule.
    *
    * All row rules share ONE aggregate (one corpus scan); each
    * uniqueness rule is its own exact-distinct aggregate. The audit
    * never fails the job — it REPORTS, and the caller decides the
    * threshold (gate-on-zero, alert-on-rate, …). */
  def validate(df: DataFrame, rowRules: Seq[(String, Column)],
      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueCols.nonEmpty, "no rules given")
    val spark = df.sparkSession
    val rowPart: Option[DataFrame] = if (rowRules.isEmpty) None else {
      val aggs = count(lit(1)).as("__n") +: rowRules.zipWithIndex.map {
        case ((_, pred), i) =>
          count(when(!coalesce(pred, lit(false)), lit(1))).as(s"__v_$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = rowRules.zipWithIndex.map { case ((name, _), i) =>
        s"'$name', __n, __v_$i"
      }.mkString(", ")
      Some(one.selectExpr(s"stack(${rowRules.length}, $stackArgs) AS " +
        "(rule, n_rows, n_violations)"))
    }
    val uniqueParts = uniqueCols.map { c =>
      df.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - countDistinct(col(c))).as("n_violations"))
        .select(lit(s"${c}_unique").as("rule"), col("n_rows"),
          col("n_violations"))
    }
    (rowPart.toSeq ++ uniqueParts).reduce(_.unionByName(_))
  }

  /** Per-group equi-width histogram of an integer column with
    * data-derived global [min, max] bounds: bucket i covers
    * [lo + i·W, lo + (i+1)·W) for W = ⌈(hi − lo + 1)/buckets⌉-ish via
    * the exact integer formula b = min(buckets−1, ((v − lo)·buckets)
    * div (hi − lo + 1)) — exact integer arithmetic (the product is
    * widened through DECIMAL(38,0) so a full-int64 value range cannot
    * wrap it), so the bucketing is engine-exact (no float edges that
    * could flip a boundary value across engines). Two passes: a 1-row bounds aggregate broadcast
    * back (cross join with a literal-sized side), then one
    * (group, bucket) count — the corpus never shuffles wide. */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    requireIntegral(df, valueCol)
    // bounds ride as DECIMAL(38,0) so the denominator (hi − lo + 1)
    // cannot wrap either — a full-int64 range spans 2⁶⁴ > Long.Max
    val bounds = df.filter(col(valueCol).isNotNull)
      .agg(min(col(valueCol)).cast("decimal(38,0)").as("__lo"),
        max(col(valueCol)).cast("decimal(38,0)").as("__hi"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("__v", col(valueCol).cast("decimal(38,0)"))
      .withColumn("bucket", bucketExpr(buckets))
      .drop("__v")
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col(valueCol)).cast("long").as("bucket_min"),
        max(col(valueCol)).cast("long").as("bucket_max"))
  }

  /** Distribution drift between two corpus slices, per group: the
    * total-variation distance between the two sides' bucketed value
    * distributions — THE monitoring statistic for "did this week's
    * crawl change shape" / "does the dedup output still look like the
    * input". Buckets use the equi-width integer formula over SHARED
    * global bounds (both sides bucket identically); TVD is computed
    * entirely in exact integers —
    *
    *   TVD = Σ_buckets |ca·tb − cb·ta| / (2·ta·tb)
    *
    * — the numerator is an order-independent int64 sum (no per-bucket
    * float division ever happens), and the single final division is
    * one correctly-rounded op, so the DOUBLE hash-gates cross-engine.
    * Int64 headroom: counts·totals ≤ ~3·10⁹ per term at gate scale;
    * swap the sum to DECIMAL(38,0) beyond ~10⁹-row sides.
    *
    * At 100 TB: one union scan → (group, bucket, side) counts —
    * partial+final — then |groups|×buckets narrow rows; the corpus
    * never shuffles wide. Returns (group, n_a, n_b, tvd); groups with
    * an empty side yield NULL tvd (nothing to compare). */
  def distributionDrift(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    requireIntegral(a, valueCol)
    requireIntegral(b, valueCol)
    val side = (df: DataFrame, s: Int) =>
      df.select(col(groupCol), col(valueCol))
        .filter(col(valueCol).isNotNull)
        .withColumn("__side", lit(s))
    val union = side(a, 0).unionByName(side(b, 1))
    val bounds = union
      .agg(min(col(valueCol)).cast("decimal(38,0)").as("__lo"),
        max(col(valueCol)).cast("decimal(38,0)").as("__hi"))
    val counted = union.crossJoin(broadcast(bounds))
      .withColumn("__v", col(valueCol).cast("decimal(38,0)"))
      .withColumn("__bucket", bucketExpr(buckets))
      .groupBy(col(groupCol), col("__bucket"))
      .agg(count(when(col("__side") === 0, 1)).as("__ca"),
        count(when(col("__side") === 1, 1)).as("__cb"))
    // per-group totals as a window over the tiny counted relation
    // (|groups|×buckets rows) — constant within a group, so max picks
    // them back out of the final aggregate
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    counted
      .withColumn("__ta", sum(col("__ca")).over(w))
      .withColumn("__tb", sum(col("__cb")).over(w))
      .groupBy(col(groupCol))
      .agg(max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"),
        sum(abs(col("__ca") * col("__tb") - col("__cb") * col("__ta")))
          .as("__num"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          col("__num").cast("double") /
            (lit(2L) * col("n_a") * col("n_b")).cast("double"))
          .as("tvd"))
  }

  /** Per-group EQUI-DEPTH histogram: bucket boundaries are the group's
    * own exact discrete quantiles at i/buckets (rank ⌈q·n⌉ —
    * `GroupedMedian.exactQuantiles`, so no per-group sort funnel
    * computes them), and a value lands in the FIRST bucket whose upper
    * boundary covers it: bucket(v) = |{i : bᵢ < v}| + 1, identical to
    * min{i : v ≤ bᵢ} for the non-decreasing boundary array. Ties and
    * duplicate boundaries resolve the same way in any engine — pure
    * integer comparisons, so the (group, bucket) counts hash-gate
    * against DuckDB's quantile_disc spelling. Equal-width histograms
    * (above) starve on heavy-tailed features — doc lengths pile into
    * bucket 0 and the tail is unreadable; equi-depth pins each bucket
    * at ~n/buckets rows by construction.
    *
    * At 100 TB: the boundary table is |groups|×buckets rows, broadcast
    * back; the corpus is scanned once for the assignment and the final
    * aggregate is (group, bucket)-sized. */
  def histogramEquiDepth(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 4): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val qs = (1 to buckets).map(_.toDouble / buckets)
    val vals = df.filter(col(valueCol).isNotNull)
    val bounds = graft.ops.GroupedMedian
      .exactQuantiles(vals, groupCol, valueCol, qs)
      .groupBy(groupCol)
      .agg(array_sort(collect_list(struct(col("q"), col("value"))))
        .as("__qb"))
      .select(col(groupCol),
        transform(col("__qb"), x => x("value")).as("__bs"))
    vals.join(broadcast(bounds), Seq(groupCol))
      .withColumn("bucket",
        (size(filter(col("__bs"), b => b < col(valueCol))) + 1)
          .cast("long"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Snapshot DIFF — the governance question between two corpus
    * versions ("what did this release change"): per-group counts of
    * added / removed / changed / unchanged keys, where "changed"
    * compares a caller-chosen fingerprint column (e.g. md5 of the
    * content) null-safely. One FULL OUTER join on the key + a small
    * aggregate: at 100 TB the join is the only exchange and
    * co-locates if both snapshots are bucketed by the key (the q30
    * discipline); the output is |groups|·4 rows. Changed/added rows
    * attribute to the NEW version's group (a doc that switched
    * language counts under where it landed). Pairs naturally with
    * `sources.VersionedTable` time travel: diff(read(v-1), read(v)). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      fpCol: String, groupCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("__ko"), col(fpCol).as("__fo"),
      col(groupCol).as("__go"))
    val n = newSnap.select(col(keyCol).as("__kn"), col(fpCol).as("__fn"),
      col(groupCol).as("__gn"))
    o.join(n, col("__ko") === col("__kn"), "full_outer")
      .select(
        coalesce(col("__gn"), col("__go")).as(groupCol),
        when(col("__ko").isNull, lit("added"))
          .when(col("__kn").isNull, lit("removed"))
          .when(col("__fo") <=> col("__fn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .groupBy(col(groupCol), col("status"))
      .agg(count(lit(1)).as("n"))
  }
}
