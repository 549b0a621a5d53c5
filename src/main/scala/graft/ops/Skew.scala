package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for low-cardinality / heavy-hitter group
  * keys — the 100 TB failure mode where one reducer receives most of
  * the data (e.g. grouping 100 TB of lineitem by a 3-value
  * l_returnflag funnels everything through 3 tasks).
  *
  * `saltedAgg` runs decomposable aggregates in two phases:
  * phase 1 groups by (keys, salt) — `salts`× more reducers, each with
  * 1/salts of a hot key's rows; phase 2 re-merges the partials by the
  * real keys — its input is only |keys|·salts rows. Catalyst's
  * map-side partial aggregation already smooths moderate skew; the
  * explicit salt covers the adversarial case where even per-partition
  * partials concentrate (AQE skew-join handles the join twin of this
  * problem).
  *
  * Deterministic: the salt is `pmod(rand(seed), salts)` — rand(seed)
  * is per-partition seeded, so task retries recompute identical salts
  * and results are exactly reproducible (and independent of `salts`).
  */
object Skew {

  /** Supported decomposable aggregate specs. */
  sealed trait AggSpec { def col: String; def as: String }
  final case class SumL(col: String, as: String) extends AggSpec
  final case class SumDec(col: String, as: String) extends AggSpec
  final case class CountAll(as: String) extends AggSpec { def col = "*" }
  final case class Min(col: String, as: String) extends AggSpec
  final case class Max(col: String, as: String) extends AggSpec

  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int, seed: Long,
      specs: AggSpec*): DataFrame = {
    require(salts > 0)
    import org.apache.spark.sql.types.DecimalType
    val salted = df.withColumn("__salt",
      pmod((rand(seed) * salts).cast("int"), lit(salts)))
    val phase1 = specs.map {
      case SumL(c, as) => sum(col(c)).as(as)
      case SumDec(c, as) =>
        sum(col(c).cast(DecimalType(18, 2))).as(as)
      case CountAll(as) => count(lit(1)).as(as)
      case Min(c, as) => min(col(c)).as(as)
      case Max(c, as) => max(col(c)).as(as)
    }
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
    val phase2 = specs.map {
      case SumL(_, as) => sum(col(as)).as(as)
      case SumDec(_, as) =>
        sum(col(as)).cast(DecimalType(18, 2)).as(as)
      case CountAll(as) => sum(col(as)).as(as)
      case Min(_, as) => min(col(as)).as(as)
      case Max(_, as) => max(col(as)).as(as)
    }
    partial.groupBy(keys.map(col): _*).agg(phase2.head, phase2.tail: _*)
  }

  /** Salted inner equi-join for a skewed BIG side against a small-but-
    * not-broadcastable dim — the join twin of `saltedAgg`.
    *
    * A shuffle join partitions both sides by the join keys, so a
    * heavy-hitter key (one l_returnflag value holding a third of a
    * 100 TB fact table) funnels its entire key group through ONE task
    * regardless of cluster size. Salting splits that funnel: the big
    * side gets a uniform salt in [0, salts), the small side is
    * replicated once per salt value, and the join runs on
    * (keys…, salt) — every hot key now spreads across `salts` tasks
    * while the small side pays a ×salts replication that is trivial by
    * premise. Results are exactly the plain join's (every big row
    * meets every matching small row exactly once: the one replica
    * sharing its salt).
    *
    * When the small side fits the broadcast threshold, prefer plain
    * `broadcast(small)` — no shuffle, no skew, no salt. This operator
    * is for the middle regime (dim too big to broadcast, fact skewed)
    * and for engines/paths where AQE's runtime skew splitting is
    * unavailable (AQE only splits SORT-MERGE join partitions, and only
    * post-shuffle — a static salt also protects the first execution,
    * composes with bucketed layouts, and keeps working under
    * shuffle-hash joins).
    *
    * Deterministic for the same reason as `saltedAgg`: `rand(seed)` is
    * per-partition seeded, so retries recompute identical salts; the
    * RESULT is salt-value independent regardless (each pair is emitted
    * exactly once for any salt assignment).
    *
    * `big` and `small` must not share non-key column names (standard
    * join hygiene); the salt column never escapes. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    require(keys.nonEmpty)
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val saltedBig = big.withColumn("__salt",
      pmod((rand(seed) * salts).cast("int"), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
