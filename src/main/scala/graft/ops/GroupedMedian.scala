package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Exact per-group order statistics WITHOUT a per-group sort funnel —
  * the operator Spark's built-ins cannot express scale-safely when
  * groups are few and values are many.
  *
  * The declarative spellings both hit a wall at 100 TB: a Window
  * partitioned by the group column funnels every row of a group
  * through ONE sort task (3 groups ⇒ 3 tasks for the whole table —
  * q23's shape, already softened by pre-aggregation but still bounded
  * by 3-way parallelism when the value column is near-unique), and
  * approx_percentile trades exactness away. The classic answer is
  * distributed order statistics via prefix sums:
  *
  *  1. partial+final `groupBy(group, value).count()` — skew-free,
  *     shrinks ties, narrows rows;
  *  2. `repartitionByRange(group, value)` + in-partition sort — the
  *     sort parallelizes over ALL partitions (range boundaries split
  *     WITHIN a group), no per-group funnel anywhere;
  *  3. pass 1: per-(partition, group) count totals — #partitions ×
  *     #groups longs to the driver (the "few groups" premise makes
  *     this tiny);
  *  4. driver: global n per group, target rank ⌈q·n⌉ for EACH
  *     requested quantile, and each partition's per-group prefix
  *     offset;
  *  5. pass 2: each partition walks its sorted run with its offset and
  *     emits the row whose cumulative range covers a target — at most
  *     |quantiles| rows per (partition, group).
  *
  * Two passes over the aggregated relation (persisted between them,
  * released before returning); the result — |quantiles| rows per
  * group — is built eagerly, so no lazy recompute can observe the
  * unpersisted RDD. Values are compared only through the range
  * partitioner's ordering; the value column's type passes through
  * untouched, so the result hash-matches the declarative spelling
  * (q27 vs q23's oracle) and DuckDB's `quantile_disc` (identical
  * ⌈q·n⌉ rank semantics, probed empirically: n=4 q=.5→rank 2,
  * n=5 q=.9→rank 5, n=10 q=.1→rank 1).
  */
object GroupedMedian {

  /** (group, q, value, n) for each group × requested quantile
    * fraction; `value` keeps `valueCol`'s type, rank semantics = the
    * max(1, ⌈q·n⌉)-th value in ascending order (DuckDB
    * `quantile_disc`; q=0.5 degenerates to exactMedian's ⌈n/2⌉).
    * NULL values are EXCLUDED before ranking — quantile_disc ignores
    * them, and a NULL sorts first under Spark's range partitioner, so
    * counting it would shift every rank and could emit NULL as a
    * "value" (the percentileRanks contract, applied here too). Groups
    * whose values are all NULL produce no rows. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must lie in (0, 1], got $qs")
    require(qs.distinct.size == qs.size,
      s"duplicate quantile fractions would emit duplicate (group, q) rows, got $qs")
    val spark = df.sparkSession
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .repartitionByRange(col(groupCol), col(valueCol))
      .sortWithinPartitions(groupCol, valueCol)
    val rdd = agg.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-(partition, group) totals; LinkedHashMap keeps the
      // in-partition group order (sorted ⇒ groups are contiguous runs)
      val perPart: Array[(Int, Seq[(Any, Long)])] =
        rdd.mapPartitionsWithIndex { (i, it) =>
          val m = mutable.LinkedHashMap[Any, Long]()
          it.foreach { r =>
            val g = r.get(0)
            m.update(g, m.getOrElse(g, 0L) + r.getLong(2))
          }
          Iterator((i, m.toSeq))
        }.collect()
      val totals = mutable.Map[Any, Long]()
      perPart.foreach { case (_, gs) =>
        gs.foreach { case (g, c) => totals.update(g, totals.getOrElse(g, 0L) + c) }
      }
      // target ranks per group: max(1, ⌈q·n⌉) — the same naive double
      // ceil DuckDB applies, so borderline products agree cross-engine
      val target: Map[Any, Seq[(Double, Long)]] = totals.map { case (g, n) =>
        g -> qs.map(q => q -> math.max(1L, math.ceil(q * n).toLong))
      }.toMap
      // prefix offset of group g at partition i = counts in partitions < i
      val offsets: Map[(Int, Any), Long] = {
        val running = mutable.Map[Any, Long]()
        perPart.sortBy(_._1).flatMap { case (i, gs) =>
          gs.map { case (g, c) =>
            val off = running.getOrElse(g, 0L)
            running.update(g, off + c)
            ((i, g), off)
          }
        }.toMap
      }
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val bTarget = spark.sparkContext.broadcast(target)
      val bTotals = spark.sparkContext.broadcast(totals.toMap)
      // pass 2: emit the covering row per (group, target) — eager: the
      // result is |groups| × |qs| rows
      val quantileRows: Array[Row] = rdd.mapPartitionsWithIndex { (i, it) =>
        val cum = mutable.Map[Any, Long]()
        it.flatMap { r =>
          val g = r.get(0)
          val c = r.getLong(2)
          val before = cum.getOrElse(g, bOffsets.value.getOrElse((i, g), 0L))
          val after = before + c
          cum.update(g, after)
          bTarget.value(g).collect {
            case (q, t) if before < t && t <= after =>
              Row(g, q, r.get(1), bTotals.value(g))
          }
        }
      }.collect()
      val schema = StructType(Seq(
        agg.schema(groupCol),
        StructField("q", DoubleType, nullable = false),
        StructField("value", agg.schema(valueCol).dataType),
        StructField("n", LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(quantileRows.toIndexedSeq, 1), schema)
    } finally rdd.unpersist(blocking = false)
  }

  /** (group, median, n) for each group; `median` keeps `valueCol`'s
    * type, rank semantics = the ⌈n/2⌉-th value in ascending order
    * (identical to q23's ROW_NUMBER spelling) — the q=0.5 member of
    * `exactQuantiles`. */
  def exactMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    exactQuantiles(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("value").as("median"), col("n"))

  /** Per-DISTINCT-value percentile ranks: (group, value, before, n)
    * where `before` counts the group's rows STRICTLY below the value —
    * exactly PERCENT_RANK's (rank − 1) under ties. Same machinery as
    * exactQuantiles (pre-aggregate → range partition → in-partition
    * sort → driver prefix offsets) but pass 2 emits the cumulative
    * count for EVERY distinct value and stays DISTRIBUTED (the result
    * is |distinct (group, value)| rows — corpus-sized for near-unique
    * columns, so it is returned as a DataFrame, never collected; the
    * few-groups premise applies only to the tiny offset maps). A
    * declarative PERCENT_RANK window funnels each group through one
    * sort task; this parallelizes the sort across all partitions.
    * NULL values are excluded (join back with LEFT to keep their
    * rows unranked). */
  def percentileRanks(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .repartitionByRange(col(groupCol), col(valueCol))
      .sortWithinPartitions(groupCol, valueCol)
    val rdd = agg.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val perPart: Array[(Int, Seq[(Any, Long)])] =
        rdd.mapPartitionsWithIndex { (i, it) =>
          val m = mutable.LinkedHashMap[Any, Long]()
          it.foreach { r =>
            val g = r.get(0)
            m.update(g, m.getOrElse(g, 0L) + r.getLong(2))
          }
          Iterator((i, m.toSeq))
        }.collect()
      val totals = mutable.Map[Any, Long]()
      perPart.foreach { case (_, gs) =>
        gs.foreach { case (g, c) =>
          totals.update(g, totals.getOrElse(g, 0L) + c)
        }
      }
      val offsets: Map[(Int, Any), Long] = {
        val running = mutable.Map[Any, Long]()
        perPart.sortBy(_._1).flatMap { case (i, gs) =>
          gs.map { case (g, c) =>
            val off = running.getOrElse(g, 0L)
            running.update(g, off + c)
            ((i, g), off)
          }
        }.toMap
      }
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val bTotals = spark.sparkContext.broadcast(totals.toMap)
      val ranksRdd = rdd.mapPartitionsWithIndex { (i, it) =>
        val cum = mutable.Map[Any, Long]()
        it.map { r =>
          val g = r.get(0)
          val c = r.getLong(2)
          val before = cum.getOrElse(g, bOffsets.value.getOrElse((i, g), 0L))
          cum.update(g, before + c)
          Row(g, r.get(1), before, bTotals.value(g))
        }
      }
      val schema = StructType(Seq(
        agg.schema(groupCol),
        StructField("value", agg.schema(valueCol).dataType),
        StructField("before", LongType, nullable = false),
        StructField("n", LongType, nullable = false)))
      // the distributed result must be materialized before the backing
      // RDD is unpersisted — localCheckpoint pins the computed blocks
      spark.createDataFrame(ranksRdd, schema).localCheckpoint(true)
    } finally rdd.unpersist(blocking = false)
  }
}
