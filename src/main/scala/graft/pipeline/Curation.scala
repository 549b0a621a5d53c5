package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** The end-to-end corpus-curation funnel — the composition every
  * training-data pipeline runs, built entirely from this library's
  * operators so each stage keeps its scale shape:
  *
  *   1. quality gate  — narrow codegen'd projection + filter
  *      (token count and mean token length reach the scan);
  *   2. exact dedup   — one hash aggregate on the normalized content
  *      key, keep-min-id winners, then a semi join (the probe side
  *      reduces to a key set, broadcast-able at any corpus size);
  *   3. deterministic sample — Sampling.hashSample, a scan-level
  *      integer predicate: reproducible membership, no shuffle;
  *   4. per-language stats — single partial+final aggregate.
  *
  * Two shuffles end to end (dedup aggregate + final stats), everything
  * else narrow. No reference counterpart (SURVEY.md §2.3 surface).
  */
object Curation {

  /** @param maxMeanTokLen quality gate: drop docs whose mean token
    *                      length exceeds this (gibberish/url-soup)
    * @param minTokens     quality gate: drop docs shorter than this
    * @param samplePermille deterministic keep-rate after dedup */
  def curate(docs: DataFrame, minTokens: Int = 5, maxMeanTokLen: Double = 12.0,
      samplePermille: Int = 500): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs.select(
      col("doc_id"), col("lang"), col("text"),
      size(toks).cast("long").as("n_tokens"),
      try_divide(length(col("text")).cast("double"),
        size(toks).cast("double")).as("mean_tok_len"))
    val filtered = scored
      .filter(col("n_tokens") >= minTokens &&
        col("mean_tok_len") <= maxMeanTokLen)
    val keepers = filtered
      .select(col("doc_id"), md5(normText(col("text"))).as("ck"))
      .groupBy("ck").agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))
    val kept = filtered.join(keepers,
      filtered("doc_id") === keepers("keep_id"), "left_semi")
    Sampling.hashSample(kept, "doc_id", samplePermille)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        // integer sum in double is exact below 2^53 -> the division is
        // the only rounding step, identical in both oracle engines
        (sum(col("n_tokens").cast("double")) / count(lit(1))).as("mean_tokens"))
      .orderBy("lang")
  }
}
