package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe point-in-interval (range) join — an operator family
  * Spark's planner has no shuffle strategy for: a non-equi predicate
  * like `lo <= v AND v <= hi` plans as BroadcastNestedLoopJoin (build
  * side must fit in memory, probe is O(|points|·|intervals|) work) or
  * a cartesian product. Both die at 100 TB.
  *
  * The standard fix is binning (the same trick behind interval joins
  * in genomics engines and stream interval joins): pick a bin width W,
  * replicate each interval into every bin it overlaps
  * (⌊lo/W⌋..⌊hi/W⌋ — (len/W)+2 replicas), map each point to its one
  * bin ⌊v/W⌋, equi-join on the bin key, and re-check the exact range
  * predicate on the co-located candidates. The join becomes a plain
  * hash-partitioned equi-join: shuffles scale linearly, bin skew is
  * visible/saltable like any key skew, and the residual filter keeps
  * the semantics exact.
  *
  * Choose W on the order of the TYPICAL interval length: W ≫ len
  * wastes nothing but packs many intervals per bin (bigger candidate
  * lists); W ≪ len multiplies interval replicas. Cost is insensitive
  * within an order of magnitude either way (RangeJoinSpec asserts
  * result invariance across widths).
  *
  * No reference counterpart (SURVEY.md §2.3 extension); the as-of join
  * (ops.AsOf) covers the temporal "latest ≤ t" cousin.
  */
object RangeJoin {

  /** Inner join of `points` × `intervals` on
    * `lo <= point <= hi` (both ends inclusive). Returns all columns of
    * both inputs (names must not collide). Intervals with lo > hi
    * match nothing and are dropped up front (Spark's `sequence` would
    * otherwise step BACKWARD through ⌊lo/W⌋..⌊hi/W⌋ and fabricate
    * bins). Null points/bounds never match, as in the theta-join
    * spelling. Bounds must be FINITE: a ±Infinity bound would ask for
    * an unbounded bin sequence (Spark's `sequence` refuses loudly
    * rather than silently dropping the row — an interval that matches
    * "everything" belongs in a cross join, not a range join). */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "inputs must not already carry a __bin column")
    // fail-fast on the documented no-collision contract: without this,
    // a shared column name surfaces much later as an ambiguous-reference
    // AnalysisException from the residual filter
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must not share column names; overlapping: " +
        points.columns.toSet.intersect(intervals.columns.toSet).mkString(", "))
    val pb = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__bin", floor(col(pointCol) / binWidth))
    val ib = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
