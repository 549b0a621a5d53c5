package graft.ops

import org.apache.spark.sql.SparkSession

import graft.sources.{QuantileStats, VersionedTable}

/** Statistics-driven salt selection for [[Skew.saltedJoin]] /
  * [[Skew.saltedAgg]] — the piece that turns the manifest stats plane
  * into an execution-time decision on the #1 production failure mode
  * at 100 TB: a shuffled join/agg key whose heaviest value funnels a
  * constant fraction of the table through ONE task regardless of
  * cluster size.
  *
  * The advisor reads the key's distribution from what a pinned table
  * already maintains at O(delta) per commit, never from a data scan:
  *
  *  - KLL quantile sketches ([[QuantileStats]]) give the MODAL MASS —
  *    the heaviest single value's row share, read off the CDF as the
  *    rank plateau `rank_incl(v) − rank_excl(v)` maximized over a
  *    quantile sweep. This is the exact quantity that sizes the salt:
  *    a key holding share `m` of `N` rows needs its group spread over
  *    ~`m·P` of the `P` reduce tasks before every task holds ~`N/P`.
  *  - NDV sketches ([[graft.sources.NdvStats]]) give a PIGEONHOLE
  *    FLOOR when the key has no quantile coverage (e.g. a string
  *    key): some value must hold ≥ 1/ndv of the rows, so a key with
  *    ndv < P provably starves parallelism even when perfectly
  *    uniform — the floor `m = 1/ndv` is a guaranteed-needed minimum
  *    salt, not an estimate.
  *  - Neither pinned → the advisor REFUSES ([[advise]] throws with
  *    the pin-it spelling). Guessing a salt from nothing would be the
  *    "invented statistic" failure the stats plane exists to prevent:
  *    an unnecessary salt costs a ×salt dim replication and a wider
  *    final merge on every run, a missed salt costs a stuck task —
  *    both are real money at 100 TB, so the answer must come from
  *    measured distribution or not at all.
  *
  * Salt formula: `clamp(ceil(modalMass × parallelism), 1, parallelism)`
  * — a uniform high-cardinality key (mass ≈ 1/ndv ≪ 1/P) advises salt
  * 1 (= don't salt: the plain shuffle is already balanced and salting
  * would only tax the small side), while a 90%-one-key column advises
  * ≈ 0.9·P, spreading the hot group across almost the whole stage.
  * Reference parallel: op 7's random repartition (the GA's mixing
  * shuffle) is the same insight — data placement is a
  * correctness-preserving physical choice, so make it from what you
  * know about the distribution.
  */
object SkewAdvisor {

  /** What the advisor measured and chose. `hotShare` is the heaviest
    * value's estimated row share (`kll-mass` basis) or its pigeonhole
    * floor 1/ndv (`ndv-floor` basis).
    *
    * Resolution note (property-tested in SkewProps): past KLL's exact
    * threshold a compacted item carries weight > 1, so a TINY true
    * mass can read as ~weight/n — bounded by the sketch's ±1.65% rank
    * error. Consequence: at extreme parallelism (mass resolution
    * finer than 1/parallelism) a perfectly uniform key may advise
    * salt 2 instead of 1 — a benign over-salt costing one extra dim
    * replica, never a missed hot key (errors on heavy masses are
    * RELATIVE and small). */
  final case class SaltAdvice(salt: Int, hotShare: Double, basis: String)

  /** Pure salt sizing from a measured hot share — unit-testable
    * without a table. */
  def saltFor(hotShare: Double, parallelism: Int): Int = {
    require(parallelism > 0, "parallelism must be positive")
    math.min(parallelism,
      math.max(1, math.ceil(hotShare * parallelism).toInt))
  }

  /** Advise a salt factor for joining/grouping on `column` of the
    * versioned table at `root`. Reads ONLY manifest statistics
    * (O(manifest) driver work, zero Spark jobs). Throws
    * `IllegalArgumentException` when neither stats family covers the
    * column — pin it (`enableQuantileStats` for measured skew,
    * `enableNdvStats` for the cardinality floor) rather than guess. */
  def advise(spark: SparkSession, root: String, column: String,
      parallelism: Int, version: Option[Int] = None): SaltAdvice = {
    require(parallelism > 0, "parallelism must be positive")
    val fromKll = VersionedTable
      .tableColumnSketch(spark, root, column, version)
      .flatMap(QuantileStats.modalMass(_))
      .map(m => SaltAdvice(saltFor(m, parallelism), m, "kll-mass"))
    def fromNdv = VersionedTable.tableNdv(spark, root, version)
      .collectFirst { case (n, ndv) if n.equalsIgnoreCase(column) =>
        // tableNdv floors estimates at 1, but guard the reciprocal
        // anyway — a 0 here would surface Infinity as the hot share
        val share = 1.0 / math.max(ndv, 1L)
        SaltAdvice(saltFor(share, parallelism), share, "ndv-floor")
      }
    fromKll.orElse(fromNdv).getOrElse(throw new IllegalArgumentException(
      s"cannot advise a salt for '$column' on $root: no statistics " +
        "cover it. Pin it first — enableQuantileStats(...) for " +
        "measured heavy-hitter mass, or enableNdvStats(...) for the " +
        "cardinality floor — the advisor refuses to guess."))
  }

  /** Whole-table advice at O(manifest): ONE manifest read serves
    * every column any stats family covers — the shape the `t$skew`
    * metadata table needs (per-column [[advise]] calls re-parse the
    * manifest and re-decode every sketch blob each time). Candidates
    * are the NDV-sketched names plus the quantile pin (a `*` pin
    * resolves through the envelope column set, also manifest-only),
    * deduped case-insensitively. Returns (column → advice) sorted by
    * column; columns with no coverage are absent — same refusal
    * semantics as [[advise]], rendered as absence. */
  def adviseAll(spark: SparkSession, root: String, parallelism: Int,
      version: Option[Int] = None): Seq[(String, SaltAdvice)] = {
    require(parallelism > 0, "parallelism must be positive")
    // resolve the version ONCE and pin every read to it — otherwise a
    // concurrent commit tears the result across versions (candidates
    // from version N, sketches from N+1 where the pin may be gone)
    val v = Some(version.getOrElse(
      VersionedTable.latestVersion(spark, root)))
    if (v.get < 0) return Seq.empty
    val ndv = VersionedTable.tableNdv(spark, root, v)
    val kllCandidates = VersionedTable
      .quantileColumns(spark, root, v) match {
      case None => Seq.empty[String]
      case Some(pin) if pin.nonEmpty => pin
      case Some(_) =>
        VersionedTable.columnEnvelopes(spark, root, v)
          .keys.toSeq
    }
    val candidates = (ndv.keys ++ kllCandidates)
      .groupBy(_.toLowerCase).map(_._2.head).toSeq
    val sketches = VersionedTable.tableColumnSketches(spark, root,
      candidates, v)
    candidates.flatMap { c =>
      val fromKll = sketches.get(c).flatMap(QuantileStats.modalMass(_))
        .map(m => SaltAdvice(saltFor(m, parallelism), m, "kll-mass"))
      def fromNdv = ndv.collectFirst {
        case (n, d) if n.equalsIgnoreCase(c) =>
          val share = 1.0 / math.max(d, 1L) // see advise's guard
          SaltAdvice(saltFor(share, parallelism), share, "ndv-floor")
      }
      fromKll.orElse(fromNdv).map(c -> _)
    }.sortBy(_._1)
  }

  /** Advise a salt for a COMPOSITE join key via the projection bound:
    * a composite value's row count never exceeds any of its
    * projections' counts, so
    * `mass(k1,…,kn) ≤ min_i mass(k_i)` — the minimum covered
    * marginal's hot share is a SOUND UPPER bound on the composite hot
    * share. Consequences: one uniform covered key proves the whole
    * composite uniform (salt 1, confidently — the common win: a join
    * on (customer, order) never needs salt when order is uniform,
    * however hot customer is), while a bound from only-hot marginals
    * may OVER-salt (costs ×salt dim replication, never a wrong
    * answer). NDV-floor marginals are excluded from the minimum:
    * a floor is a LOWER bound on that marginal's mass, so it cannot
    * cap the composite. Refuses when no key has measured (kll-mass)
    * coverage. Basis records which marginal bounded the estimate. */
  def adviseComposite(spark: SparkSession, root: String,
      keys: Seq[String], parallelism: Int,
      version: Option[Int] = None): SaltAdvice = {
    require(keys.nonEmpty, "composite advice needs at least one key")
    val measured = keys.flatMap { k =>
      VersionedTable.tableColumnSketch(spark, root, k, version)
        .flatMap(QuantileStats.modalMass(_))
        .map(k -> _)
    }
    if (measured.isEmpty) throw new IllegalArgumentException(
      s"cannot advise a composite salt for (${keys.mkString(", ")}) " +
        s"on $root: no key has measured quantile coverage — pin at " +
        "least one via enableQuantileStats(...); the advisor refuses " +
        "to guess.")
    val (boundKey, mass) = measured.minBy(_._2)
    SaltAdvice(saltFor(mass, parallelism), mass,
      s"composite-min($boundKey)")
  }
}
