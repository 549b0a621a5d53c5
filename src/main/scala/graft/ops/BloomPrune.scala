package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** In-plan Bloom-filter pruning for selective joins — the 100 TB
  * fact-dim shape: build a Bloom sketch over the (small, filtered) dim
  * keys in ONE aggregate, ship it to every fact task as a scalar
  * subquery, and drop fact rows that cannot possibly match BEFORE they
  * ride the join exchange. The semi join's shuffle volume falls by the
  * dim's selectivity; the sketch itself is the only extra traffic
  * (~1.2 MB per million keys at the default sizing).
  *
  * This is the same machinery Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, the
  * InjectRuntimeFilter rule) injects — but as an EXPLICIT operator for
  * when the user knows the dim is selective: the automatic rule only
  * fires within its creation-side size heuristics, silently does
  * nothing outside them, and cannot be asserted by a pipeline that
  * depends on the prune. Correctness never depends on the sketch:
  * might_contain admits a superset (both sides hash the join key with
  * the same xxhash64), and the exact join afterwards removes the false
  * positives. A NULL fact key hashes to the seed like any value, may
  * pass the sketch, and is then dropped by the exact join's
  * null-rejecting equality — naive semantics either way.
  *
  * No reference counterpart (SURVEY.md §2.3): the reference's joins are
  * reducer-side with no pruning; this is the Spark-first posture for
  * the same "don't move rows you'll discard" discipline its partial
  * maxes apply to aggregation.
  */
object BloomPrune {

  /** Bloom sketch over `key` of every row in `df`, as a one-value
    * scalar-subquery Column (BloomFilterMightContain requires a
    * constant or scalar subquery — a cross-joined one-row frame is
    * rejected at analysis). Empty input yields a NULL sketch:
    * might_contain then returns NULL and the prune drops every row,
    * which is exactly the empty-dim semi join. */
  def sketchOf(df: DataFrame, key: String,
      expectedItems: Long = 1000000L): Column =
    sketchOfKeys(df, Seq(key), expectedItems)

  /** Multi-column variant: the sketch hashes the composite
    * xxhash64(k1, k2, …) — build and probe must list the columns in
    * the same order. */
  def sketchOfKeys(df: DataFrame, keys: Seq[String],
      expectedItems: Long = 1000000L): Column = {
    require(keys.nonEmpty, "at least one key column")
    df.select(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(keys.map(col): _*)),
          expectedItems)
          .toAggregateExpression()).as("bf"))
      .scalar()
  }

  /** Predicate: `key` might be in `sketch`. False ⇒ definitely absent
    * (same hash family on build and probe), so filtering on this is
    * always a superset of the exact join's matches. */
  def mightContainKey(sketch: Column, key: Column): Column =
    mightContainKeys(sketch, Seq(key))

  /** Multi-column probe twin of [[sketchOfKeys]]. */
  def mightContainKeys(sketch: Column, keys: Seq[Column]): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(sketch),
      ColumnBridge.expression(xxhash64(keys: _*))))

  /** LEFT SEMI join of `fact` to `dim` with a Bloom prune on the fact
    * side: result is IDENTICAL to the plain semi join (the sketch
    * only discards definite non-matches; the join itself is exact),
    * but rows failing the sketch never reach the exchange. */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L): DataFrame = {
    require(!fact.columns.contains("__graft_dim_key"),
      "fact must not already carry a __graft_dim_key column")
    val sketch = sketchOf(dim, dimKey, expectedItems)
    // alias the dim key: when factKey and dimKey share a name the
    // bare-column join condition would be an ambiguous reference (the
    // rename never leaks — a semi join outputs fact columns only)
    fact.filter(mightContainKey(sketch, col(factKey)))
      .join(dim.select(col(dimKey).as("__graft_dim_key")),
        col(factKey) === col("__graft_dim_key"), "left_semi")
  }
}
