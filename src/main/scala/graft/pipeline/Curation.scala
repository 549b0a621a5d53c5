package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Unigram (shingleN = 1) banding is a FIXTURE-ONLY setting: the
    * band containing the corpus's most common word collides virtually
    * every document, collapsing banded LSH into the all-pairs
    * quadratic it exists to avoid (the documented dedup_minhash corpus
    * pathology — BASELINE.md §scaling measures the blow-up). The gate
    * rows pass shingleN = 1 explicitly because their DuckDB oracles
    * reproduce unigram Jaccard on a bounded fixture; every unbounded
    * path takes the trigram default. This guard makes the fixture
    * setting refuse large input loudly instead of degrading silently.
    * The count is ~free: both call sites pass an eagerly
    * localCheckpoint'ed stage output. */
  private val UnigramFixtureMaxDocs = 100000L
  private def requireShingleSafe(shingleN: Int, stage: DataFrame): Unit =
    if (shingleN < 2) {
      val n = stage.count()
      require(n <= UnigramFixtureMaxDocs,
        s"shingleN=$shingleN (unigram banding) is fixture-only: input has " +
          s"$n docs > $UnigramFixtureMaxDocs. Use shingleN >= 2 (trigram " +
          "default) on unbounded corpora — unigram bands collide on the " +
          "most common token and degrade LSH to all-pairs.")
    }

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

  /** The COMPLETE eight-stage curation DAG (quality gate → boilerplate
    * removal → exact dedup → MinHash near-dup → decontamination →
    * domain cap → mix → pack) — every stage a library operator, each
    * keeping its scale shape:
    *
    *  - two corpus-wide wide stages total (the boilerplate df
    *    aggregate and the exact-dedup aggregate); every later stage
    *    operates on monotonically shrinking survivors;
    *  - blocklist, benchmark shingles, and mix predicates reach the
    *    data as broadcasts or scan-level integer predicates — no
    *    survivor-side shuffle for stages 5 and 7;
    *  - the near-dup stage is banded MinHash LSH (subquadratic by
    *    construction) with exact-Jaccard verification;
    *  - the domain cap's rank ≤ `capPerSource` pushes into
    *    WindowGroupLimit; packing's prefix sums run shard-parallel.
    *
    * `train` is the corpus to curate; `bench` the external eval set
    * decontamination protects (any shared trigram flags the doc).
    * Returns one row per surviving doc:
    * (doc_id, lang, mix_source, shard, seq_idx, n_tokens) — n_tokens
    * counted on the CLEANED text. PipelineQueries.pipelineE2e gates
    * this composition against a DuckDB CTE chain on a bounded
    * fixture; ScaleBench's pipeline_e2e row measures it unbounded. */
  def e2e(train: DataFrame, bench: DataFrame,
      minTokens: Int = 20, maxMeanTokLen: Double = 12.0,
      chunkSize: Int = 2, maxDf: Int = 15, shingleN: Int = 3,
      nearThreshold: Double = 0.7, capPerSource: Int = 10,
      mixPermille: Seq[(String, String, Int)] = Seq(
        ("en_heavy", "en", 800), ("de_half", "de", 500),
        ("fr_light", "fr", 200)),
      budget: Int = 64, shards: Int = 8): DataFrame = {
    // STAGE BOUNDARIES MATERIALIZE (localCheckpoint, eager): every
    // stage output below feeds ≥2 consumers (the dedup self-join, the
    // drop-list anti joins, the cap/pack/metadata joins), so leaving
    // the lineage lazy re-expands the ENTIRE upstream funnel once per
    // consumer branch — measured 1035 Exchange nodes in the composed
    // plan before checkpointing vs ~a dozen after (the Cga/NN-Descent
    // iterative-lineage discipline applied to a DAG). This is also
    // what a production pipeline does: each curation stage lands as a
    // table before the next reads it. Blocks belong to the returned
    // frame; the ContextCleaner reaps them when the caller drops it.
    // 1. quality gate
    val q = train
      .withColumn("__nt", size(tokens(col("text"))).cast("long"))
      .withColumn("__mtl", try_divide(length(col("text")).cast("double"),
        col("__nt").cast("double")))
      .filter(col("__nt") >= minTokens && col("__mtl") <= maxMeanTokLen)
      .drop("__nt", "__mtl")
    // 2. boilerplate removal over the quality survivors
    val cleaned = TextAnalysis.boilerplateRemoval(q, chunkSize, maxDf)
      .select(col("doc_id"), col("clean_text"))
      .localCheckpoint(true)
    // 3. exact dedup, keep-min-id on the cleaned content key
    val keep = cleaned.groupBy(md5(col("clean_text")).as("__ck"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val exact = cleaned.join(keep, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    // 4. MinHash near-dup (recall-1 banding + exact verify), greedy
    // min-id retention: every pair's larger id drops
    requireShingleSafe(shingleN, exact)
    val pairs = Dedup.minhashPairs(
      exact.select(col("doc_id"), col("clean_text").as("text")),
      shingleN = shingleN, k = 64, bands = 32, threshold = nearThreshold)
    val near = exact.join(pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // 5. decontamination vs the bench slice
    val dirty = Decontamination.contaminated(
      near.select(col("doc_id"), col("clean_text").as("text")), bench,
      n = 3, minHits = 1)
    val decon = near.join(dirty.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // 6. per-source domain cap, longest-first
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val capped = train.join(decon.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source", "n_chars")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= capPerSource)
      .drop("__rn")
      .localCheckpoint(true) // one consumer per mix source below
    // 7. declared-permille mix (mixed feeds the pack input AND the
    // final metadata join — one more two-consumer boundary)
    val mixed = Sampling.mixCorpora(
      mixPermille.map { case (label, lang, permille) =>
        (label, capped.filter(col("lang") === lang), permille)
      }, "doc_id")
      .localCheckpoint(true)
    // 8. token-budget packing of the mixed survivors (cleaned text)
    val packed = TextAnalysis.packSequences(
      mixed.select("doc_id").join(decon, "doc_id")
        .select(col("doc_id"), col("clean_text").as("text")),
      budget, shards)
    packed.join(mixed.select("doc_id", "lang", "mix_source"), "doc_id")
      .select("doc_id", "lang", "mix_source", "shard", "seq_idx", "n_tokens")
  }

  /** The INCREMENTAL ingestion funnel — [[e2e]]'s daily-batch twin:
    * curate a new crawl batch AGAINST an existing corpus without ever
    * re-doing corpus-vs-corpus work (that was settled when the corpus
    * was built — the same economy the reference's incremental GA
    * applies to offspring, /root/reference/src/edu/illinois/incr_ga/
    * IncMapReduce.java):
    *
    *  1. quality gate on the batch — narrow scan-level filter
    *     (e2e stage 1 verbatim);
    *  2. exact novelty: keep-min-id within the batch on the
    *     normalized content key, then drop every batch doc whose key
    *     already exists in the corpus — key-sized aggregates and anti
    *     joins; at 100 TB `Dedup.novelKeys`' inverted Bloom is this
    *     stage's scan-level prefilter and the corpus side is a stored
    *     key table, so a batch run shuffles only batch-sized data;
    *  3. near-dup vs corpus AND batch-internal via
    *     [[Dedup.incrementalMinhashPairs]] (recall-1 r=2 banding at
    *     the default parameters): the corpus always wins — a batch
    *     doc paired with ANY corpus doc drops; batch-internal pairs
    *     drop the larger id;
    *  4. decontamination vs the benchmark slice (trigram overlap,
    *     benchmark side broadcast).
    *
    * Returns the surviving batch rows with their original schema. The
    * caller lands them as ONE atomic `VersionedTable.append` — each
    * ingest batch becomes one table version (the audit log; time
    * travel = "as of batch N"). PipelineQueries.pipelineIngest gates
    * the complete loop — funnel, append, DSv2 read-back — against a
    * DuckDB CTE chain with planted exact and near re-crawls. */
  def ingest(batch: DataFrame, corpus: DataFrame, bench: DataFrame,
      minTokens: Int = 20, maxMeanTokLen: Double = 12.0,
      shingleN: Int = 3, k: Int = 64, bands: Int = 32,
      nearThreshold: Double = 0.7): DataFrame = {
    // 1. quality gate
    val q = batch
      .withColumn("__nt", size(tokens(col("text"))).cast("long"))
      .withColumn("__mtl", try_divide(length(col("text")).cast("double"),
        col("__nt").cast("double")))
      .filter(col("__nt") >= minTokens && col("__mtl") <= maxMeanTokLen)
      .drop("__nt", "__mtl")
    // 2. exact novelty (batch-internal keep-min-id, then corpus anti)
    val qk = q.withColumn("__ck", md5(normText(col("text"))))
    val keepIds = qk.groupBy(col("__ck"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val exactNovel = qk
      .join(keepIds, Seq("doc_id"), "left_semi")
      .join(corpus.select(md5(normText(col("text"))).as("__ck")).distinct(),
        Seq("__ck"), "left_anti")
      .drop("__ck")
      // two consumers below (pair generation + survivor anti join):
      // materialize the stage boundary, the e2e discipline
      .localCheckpoint(true)
    // 3. near-dup vs corpus + batch-internal. Pairs carry id_a < id_b
    // with at least one batch side; membership decides the casualty:
    // if id_b is a batch doc it drops either way (corpus partner ⇒
    // corpus wins; batch partner ⇒ id_b is the larger id); if id_b is
    // corpus, the batch side is id_a and drops.
    requireShingleSafe(shingleN, exactNovel)
    val pairs = Dedup.incrementalMinhashPairs(
      exactNovel.select(col("doc_id"), col("text")),
      corpus.select(col("doc_id"), col("text")),
      shingleN, k, bands, nearThreshold)
    val batchIds = exactNovel.select(col("doc_id"))
    val dropB = pairs
      .join(batchIds.withColumnRenamed("doc_id", "id_b"), Seq("id_b"),
        "left_semi")
      .select(col("id_b").as("doc_id"))
    val dropA = pairs
      .join(batchIds.withColumnRenamed("doc_id", "id_b"), Seq("id_b"),
        "left_anti")
      .select(col("id_a").as("doc_id"))
    val near = exactNovel
      .join(dropB.unionByName(dropA).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // decontam derivation + survivor anti join
    // 4. decontamination
    val dirty = Decontamination.contaminated(
      near.select(col("doc_id"), col("text")), bench, n = 3, minHits = 1)
    near.join(dirty.select("doc_id"), Seq("doc_id"), "left_anti")
  }
}
