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

  /** Knuth's multiplicative hash constant (2^32 / φ). */
  val Knuth: Long = 2654435761L
  private val M: Long = 1L << 32

  /** Threshold for a permille rate, exact integer arithmetic. */
  def thresholdFor(permille: Int): Long = M * permille / 1000L

  /** Keep rows where hash(key) mod 2^32 < permille/1000 * 2^32.
    * `keyCol` must be a non-negative integer key (ids). The filter is
    * a codegen'd scan-level predicate — at 100 TB the sample costs one
    * pass with no shuffle and no state. */
  def hashSample(df: DataFrame, keyCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, "rate must be 0..1000 permille")
    df.filter((col(keyCol) * Knuth) % M < thresholdFor(permille))
  }
}
