package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** Benchmark decontamination (SURVEY.md §2.3 extension surface; no
  * reference counterpart): flag training documents that share word
  * n-grams with an evaluation benchmark, the standard hygiene step
  * before LLM training (n-gram-overlap decontamination à la the
  * GPT-3/Pile methodology).
  *
  * Scale shape: the benchmark side is SMALL by definition (eval sets
  * are MBs against a 100 TB corpus), so its distinct shingle set is
  * broadcast — the corpus side explodes to narrow (doc_id, shingle)
  * rows, joins without shuffling, and the per-doc hit count is one
  * partial+final hash aggregate. The corpus is scanned exactly once.
  */
object Decontamination {

  /** Distinct word n-gram shingles of the benchmark corpus — the
    * broadcast-able reference side. Tokens are bound to a column
    * before shingling (shinglesOfTokens: an unbound split expression
    * re-evaluates per lambda element). */
  def benchmarkShingles(benchmark: DataFrame, n: Int): DataFrame =
    benchmark.select(tokens(col("text")).as("toks"))
      .select(explode(shinglesOfTokens(col("toks"), n)).as("sh"))
      .distinct()

  /** Docs sharing at least `minHits` distinct n-grams with the
    * benchmark, with their hit counts — the drop list. Per-doc shingle
    * sets are distinct and the benchmark side is deduplicated, so a
    * plain count IS the distinct-overlap size (no countDistinct
    * state). */
  def contaminated(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
      minHits: Int = 1): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shinglesOfTokens(col("toks"), n)).as("sh"))
      .join(broadcast(benchmarkShingles(benchmark, n)), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)

  /** Substring-level contamination via winnowing fingerprints: a
    * corpus doc is flagged when ≥ `minShared` of its sampled k-gram
    * fingerprints also occur in the benchmark — which the winnowing
    * guarantee ties to shared token RUNS of ≥ window+k−1, so this
    * catches a benchmark passage QUOTED inside an otherwise-unrelated
    * document at 2/(window+1) the cost of exhaustive shingle overlap
    * (`contaminated` above matches every shingle; this samples, with a
    * guaranteed floor).
    *
    * Same scale shape as `contaminated`: the benchmark's distinct
    * fingerprint set broadcasts, the corpus is fingerprinted in one
    * pass and never shuffled except the per-doc count aggregate. */
  def contaminatedSubstring(docs: DataFrame, benchmark: DataFrame,
      k: Int = 3, window: Int = 4, minShared: Int = 2): DataFrame = {
    val bfp = TextAnalysis.winnowingFingerprints(benchmark, k, window)
      .select(col("fp_hash")).distinct()
    TextAnalysis.winnowingFingerprints(docs, k, window)
      .join(broadcast(bfp), "fp_hash")
      .groupBy("doc_id")
      // the same hash can be sampled at several positions — count
      // distinct SHARED fingerprints, not sample sites
      .agg(countDistinct(col("fp_hash")).as("hits"))
      .filter(col("hits") >= minShared)
  }
}
