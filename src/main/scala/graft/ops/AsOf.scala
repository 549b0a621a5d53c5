package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each left row, the latest right row with
  * the same key and right timestamp <= left timestamp. The classic
  * spelling is a range join (quadratic blowup) or a per-row subquery;
  * the scale shape used here is union + ONE window pass:
  *
  *   1. union the two sides (right rows tagged side=0, left side=1) —
  *      narrow;
  *   2. one shuffle on `key`, sort by (ts, side, right cols);
  *   3. `last(value, ignoreNulls) OVER (... ROWS UNBOUNDED PRECEDING
  *      .. CURRENT ROW)` carries the most recent right values forward
  *      onto every left row;
  *   4. keep the left rows.
  *
  * Exactly one exchange, cost O(n log n) in partition size, skew
  * bounded by key cardinality — the same plan a hand-written
  * merge-as-of would produce, but expressed declaratively so Catalyst
  * owns the sort and AQE owns the partitioning. Ties: a right row at
  * ts == left ts IS matched (inclusive, side 0 sorts first). Callers
  * should pre-reduce the right side to one row per (key, ts) — among
  * equal-ts right rows the sort order (and thus the match) would
  * otherwise be theirs to define.
  *
  * No reference counterpart (SURVEY.md §2.3 extension surface); the
  * window mechanics reuse op 9's sliding-frame machinery
  * (/root/reference/src/edu/illinois/ga/MapReduce.java:203-232).
  */
object AsOf {

  /** @param rightVals right-side columns to carry onto matched left
    *                   rows (may include `rightTs`); emitted under
    *                   their original names, NULL when no right row
    *                   precedes the left row. Must be non-null in the
    *                   right data: `last(_, ignoreNulls)` is taken per
    *                   column, so a NULL in one value column would let
    *                   that column fall back to an older right row. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame =
    join(left, right, key, leftTs, rightTs, rightVals, forward = false)

  /** The FORWARD direction: for each left row, the EARLIEST right row
    * with the same key and right ts >= left ts — "what happened next"
    * (next click after a purchase, next error after a deploy). Same
    * union + one-window machinery, ts sort reversed; a right row at
    * ts == left ts IS matched (inclusive), mirroring asofJoin. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame =
    join(left, right, key, leftTs, rightTs, rightVals, forward = true)

  private def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      forward: Boolean): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val lCols = left.columns.toSeq
    val conflict = rightVals.toSet.intersect(lCols.toSet -- Seq(key))
    require(conflict.isEmpty, s"right value columns collide with left: $conflict")

    val rTyped = rightVals.map(c => c -> right.schema(c).dataType)
    // left rows: own columns + null right slots
    val lSide = left.select(
      lCols.map(F.col) ++
        rTyped.map { case (c, t) => F.lit(null).cast(t).as(s"__r_$c") } ++
        Seq(F.lit(1).as("__side"), F.col(leftTs).as("__ts")): _*)
    // right rows: null left columns (key kept) + right values
    val rSide = right.select(
      lCols.map(c => if (c == key) F.col(key).as(c)
        else F.lit(null).cast(left.schema(c).dataType).as(c)) ++
        rTyped.map { case (c, _) => F.col(c).as(s"__r_$c") } ++
        Seq(F.lit(0).as("__side"), F.col(rightTs).as("__ts")): _*)

    // forward reverses ONLY the ts ordering: at equal __ts the right
    // row (side 0) still sorts before the left row, so the inclusive
    // boundary match holds in both directions
    val tsOrder = if (forward) F.col("__ts").desc else F.col("__ts").asc
    val w = Window.partitionBy(key)
      .orderBy(Seq(tsOrder, F.col("__side").asc) ++
        rightVals.map(c => F.col(s"__r_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .select(lCols.map(F.col) ++ rTyped.map { case (c, _) =>
        F.last(F.col(s"__r_$c"), ignoreNulls = true).over(w).as(c)
      } :+ F.col("__side"): _*)
      .filter(F.col("__side") === 1)
      .drop("__side")
  }
}
