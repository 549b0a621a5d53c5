package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling (SURVEY.md §2.3 extension surface; no
  * reference counterpart). Training-data pipelines need samples that
  * are REPRODUCIBLE across engines, partitionings, retries, and reruns
  * — which `rand()`-based Bernoulli sampling is not. The standard
  * answer is hash-based systematic sampling: keep a row iff a cheap
  * integer hash of its key lands under the rate threshold. Pure int64
  * arithmetic → the same rows are selected everywhere, and the sample
  * is stable under incremental reprocessing (a doc keeps/loses its
  * membership independent of the rest of the corpus).
  */
object Sampling {

  /** TWO Lehmer/MINSTD steps: modulus 2^31-1 (Mersenne prime), the
    * Park–Miller multiplier, applied twice. Chosen over the round-1
    * Knuth `key * 2654435761 mod 2^32` spelling because that product
    * overflows int64 for keys >= ~3.47e9 — an ANSI-mode arithmetic
    * error exactly where the 100 TB path lives (ids past 2^32). Here
    * the worst product is (P-1)·A < 2^47: overflow-free in int64 in
    * Spark AND in the DuckDB oracle's identical arithmetic. Two steps,
    * not one: a single multiply never wraps P for keys < ~44k, leaving
    * small sequential ids ORDERED (the low id range would be sampled
    * as a prefix, not uniformly); the second multiply wraps every ~12
    * consecutive keys. For keys < P the composed map is a bijection
    * (A is a primitive root mod P), so ids scatter uniformly —
    * measured 1000±3 per permille bucket over 100k sequential ids. */
  val P: Long = 2147483647L
  val A: Long = 48271L

  /** Threshold for a permille rate, exact integer arithmetic. */
  def thresholdFor(permille: Int): Long = P * permille / 1000L

  /** Keep rows where lehmer(lehmer(key)) < permille/1000 · P.
    * `keyCol` must be a non-negative integer key (ids). The filter is
    * a codegen'd scan-level predicate — at 100 TB the sample costs one
    * pass with no shuffle and no state. Thresholds nest, so a lower
    * rate selects a subset of a higher rate (stable membership). */
  def hashSample(df: DataFrame, keyCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, "rate must be 0..1000 permille")
    df.filter((col(keyCol) % P) * A % P * A % P < thresholdFor(permille))
  }

  /** Deterministic STRATIFIED sample: exactly min(k, |group|) rows per
    * group — the quota-per-stratum cousin of `hashSample` (which keeps
    * a global RATE but leaves group proportions to chance; curation
    * wants e.g. "25 docs per language" for eval sets and per-domain
    * caps). The k survivors are the group's smallest double-Lehmer key
    * hashes: membership is a pure function of (key, group, k), so the
    * sample is reproducible across engines/retries, and quotas NEST
    * (k=10 selects a subset of k=25 — shrinking an eval set never
    * swaps its members).
    *
    * At 100 TB: rank ≤ k over (group, hash-order) is exactly the shape
    * Spark's WindowGroupLimit optimizer pushes below the exchange —
    * every map task pre-selects its local top-k per group before
    * shuffling, so the wide exchange carries ≈ k·groups·tasks rows, not
    * the corpus (same mechanism PlanAuditSpec asserts for the domain
    * cap). */
  def stratifiedSample(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = (col(keyCol) % P) * A % P * A % P
    val w = Window.partitionBy(groupCol).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic WEIGHTED sampling: keep a row with probability
    * proportional to `weightCol` (importance/quality-weighted corpus
    * mixing — upweight long or high-quality docs without a second
    * pass). A row survives iff
    * `lehmer²(key) · maxWeight < weight · P · rate‰/1000`: pure int64
    * arithmetic throughout, so membership is a deterministic function
    * of (key, weight) — reproducible across engines, partitionings and
    * reruns, exactly like `hashSample` (which this degenerates to when
    * every weight equals `maxWeight`). Worst product is P·maxWeight —
    * the require keeps it inside int64 with headroom.
    *
    * At 100 TB: a scan-level integer predicate, no shuffle, no state;
    * the expected kept fraction of a group with mean weight w̄ is
    * rate‰/1000 · w̄/maxWeight. Weights above `maxWeight` are clamped
    * (kept with the full rate probability). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      maxWeight: Long, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, "rate must be 0..1000 permille")
    require(maxWeight > 0 && maxWeight <= 1000000L,
      s"maxWeight must be in 1..1e6 (int64 headroom), got $maxWeight")
    val h = (col(keyCol) % P) * A % P * A % P
    val w = least(col(weightCol).cast("long"), lit(maxWeight))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
      h * maxWeight < w * lit(thresholdFor(permille)))
  }

  /** Deterministic corpus MIXING — the Pile/Dolma recipe step: build a
    * training mix from several sources at declared per-source rates
    * ("web at 30‰, books at 1000‰, code at 500‰"). Each source is
    * [[hashSample]]d at its own permille and union'd with a
    * `mix_source` label; membership is a pure function of (key, rate),
    * so the mix is reproducible, rates adjust independently (raising
    * one source's permille never changes which rows another source
    * contributes — no cross-source coupling through a global RNG), and
    * thresholds nest (a 100‰ mix is a subset of the same recipe at
    * 200‰ — eval subsets shrink without member churn).
    *
    * At 100 TB: each source is scanned ONCE with a codegen'd integer
    * predicate — the whole mix costs zero shuffles and zero state;
    * sources never meet except in the union. Schemas must agree
    * (unionByName, no missing-column fill — a silent NULL column in a
    * training mix is corruption, so mismatches fail at analysis). */
  def mixCorpora(sources: Seq[(String, DataFrame, Int)],
      keyCol: String): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(sources.map(_._1).distinct.size == sources.size,
      "source labels must be unique")
    sources.map { case (label, df, permille) =>
      hashSample(df, keyCol, permille)
        .withColumn("mix_source", lit(label))
    }.reduce(_ unionByName _)
  }

  /** Leakage-safe train/valid/test split: assign every near-dup
    * COMPONENT — not every document — to a split, so near-duplicates
    * can never straddle the train/eval boundary (the contamination
    * mode Lee et al. §6.2 and the GPT-3 appendix both document:
    * benchmark answers leaking into training via unnoticed near-dups
    * inflate eval scores). Input is the (id, component) output of
    * [[graft.pipeline.Dedup.clusterPairs]] — any candidate generator
    * (exact, MinHash, SimHash, embedding) feeds it; singletons label
    * themselves there, so every document gets a split.
    *
    * The split is the hash-threshold discipline of [[hashSample]],
    * applied to the component label: `lehmer²(component)` against
    * nested permille thresholds. Membership is a pure int64 function
    * of (component, rates) — reproducible across engines and reruns —
    * and thresholds NEST: growing trainPermille only ever MOVES
    * components into train from valid/test (never reshuffles them), so
    * a regenerated 850‰ split contains the 800‰ split's train set.
    *
    * At 100 TB: one narrow projection over the clustering output (the
    * expensive part — candidate generation + CC — is the dedup
    * pipeline the corpus already ran); joining the label back to the
    * corpus is a key-sized broadcast or a co-partitioned join on id. */
  def leakageSafeSplit(components: DataFrame, trainPermille: Int = 800,
      validPermille: Int = 100, idCol: String = "doc_id",
      componentCol: String = "component"): DataFrame = {
    require(trainPermille >= 0 && validPermille >= 0 &&
      trainPermille + validPermille <= 1000,
      s"rates must be non-negative and sum <= 1000 permille, " +
        s"got $trainPermille + $validPermille")
    val h = (col(componentCol) % P) * A % P * A % P
    components.select(col(idCol), col(componentCol),
      when(h < thresholdFor(trainPermille), "train")
        .when(h < thresholdFor(trainPermille + validPermille), "valid")
        .otherwise("test")
        .as("split"))
  }
}
