package graft

import org.apache.spark.sql.DataFrame
import graft.pipeline.{Curation, Decontamination, Dedup, Embeddings, Merge, Normalize, Profile, Sampling, Similarity, TextAnalysis}

/** Fluent entry points: `import graft.syntax._` and call pipeline
  * operators as methods on any DataFrame with the right columns
  * (documents: doc_id/text; embeddings: vec_id/embedding).
  */
package object syntax {

  implicit class DocumentOps(private val df: DataFrame) {

    /** Exact dedup on normalized content → (content_key, keep_id, dups). */
    def dedupExact(): DataFrame = Dedup.exact(df)

    /** MinHash-LSH near-dup pairs verified by exact Jaccard. */
    def nearDupsMinhash(shingleN: Int = 3, k: Int = 32, bands: Int = 8,
        threshold: Double = 0.7): DataFrame =
      Dedup.minhashPairs(df, shingleN, k, bands, threshold)

    /** SimHash near-dup pairs with hamming <= maxHamming. */
    def nearDupsSimhash(maxHamming: Int = 3): DataFrame =
      Dedup.simhashPairs(df, maxHamming)

    /** Per-document token/char/subtoken counts. */
    def tokenCounts(): DataFrame = TextAnalysis.tokenCounts(df)

    /** Quality ratios (mean token length, punctuation, stopwords). */
    def qualityScores(stopwords: Seq[String] = Seq("the", "a", "of", "and",
        "to", "in")): DataFrame = TextAnalysis.qualityScores(df, stopwords)

    /** Heuristic language ID with per-language hit counts. */
    def languageId(): DataFrame = TextAnalysis.languageId(df)

    /** MD5 + rolling content fingerprints. */
    def fingerprints(): DataFrame = TextAnalysis.fingerprints(df)

    /** Near-dup connected components → (doc_id, component). */
    def nearDupClusters(maxId: Long, threshold: Double = 0.8): DataFrame =
      Dedup.nearDupClusters(df, maxId, threshold)

    /** Connected components over a caller-supplied pair set — the
      * at-scale composition (feed `nearDupsMinhash` output). */
    def clusterPairs(pairs: DataFrame): DataFrame =
      Dedup.clusterPairs(pairs, df.select("doc_id"))

    /** Repetition signals (distinct-token ratio, top-token share). */
    def repetitionStats(): DataFrame = TextAnalysis.repetitionStats(df)

    /** Fixed-size token context windows (sequence packing). */
    def chunkTokens(chunkSize: Int): DataFrame =
      TextAnalysis.chunkTokens(df, chunkSize)

    /** Docs sharing ≥ minHits word n-grams with a benchmark corpus. */
    def contaminatedBy(benchmark: DataFrame, n: Int = 3,
        minHits: Int = 1): DataFrame =
      Decontamination.contaminated(df, benchmark, n, minHits)

    /** Substring-level contamination via shared winnowing
      * fingerprints. */
    def contaminatedSubstringBy(benchmark: DataFrame, k: Int = 3,
        window: Int = 4, minShared: Int = 2): DataFrame =
      Decontamination.contaminatedSubstring(df, benchmark, k, window,
        minShared)

    /** Corpus top-k vocabulary coverage: per-doc OOV counts/rate. */
    def vocabOovRates(vocabSize: Int = 100): DataFrame =
      TextAnalysis.vocabOov(df, vocabSize)

    /** Corpus-wide top-k token bigrams. */
    def topBigrams(topK: Int = 20): DataFrame =
      TextAnalysis.topBigrams(df, topK)

    /** Deterministic hash-based sample (permille of rows kept). */
    def hashSample(permille: Int, keyCol: String = "doc_id"): DataFrame =
      Sampling.hashSample(df, keyCol, permille)

    /** The full curation funnel: quality gate → dedup → sample → stats. */
    def curate(minTokens: Int = 5, maxMeanTokLen: Double = 12.0,
        samplePermille: Int = 500): DataFrame =
      Curation.curate(df, minTokens, maxMeanTokLen, samplePermille)

    /** EXACT Jaccard-threshold pairs via prefix filtering (recall 1,
      * no O(n²) cross join). */
    def nearDupsPrefix(threshold: Double = 0.8, shingleN: Int = 1): DataFrame =
      Dedup.prefixJaccardPairs(df, threshold, shingleN)

    /** Near-dup pairs of THIS batch vs a settled corpus (plus
      * batch-vs-batch) — corpus-vs-corpus never recomputed. */
    def nearDupsAgainst(corpus: DataFrame, shingleN: Int = 3, k: Int = 32,
        bands: Int = 8, threshold: Double = 0.7): DataFrame =
      Dedup.incrementalMinhashPairs(df, corpus, shingleN, k, bands, threshold)

    /** Within-group z-score of an integer column. */
    def zscoreBy(groupCol: String, valueCol: String): DataFrame =
      Normalize.zscoreByGroup(df, groupCol, valueCol)

    /** Winsorize a column to its within-group exact [loQ, hiQ]. */
    def winsorizeBy(groupCol: String, valueCol: String, loQ: Double = 0.1,
        hiQ: Double = 0.9): DataFrame =
      Normalize.winsorizeByGroup(df, groupCol, valueCol, loQ, hiQ)

    /** Bloom-pruned LEFT SEMI join (identical rows, pruned exchange). */
    def semiJoinPruned(dim: DataFrame, key: String, dimKey: String,
        expectedItems: Long = 1000000L): DataFrame =
      graft.ops.BloomPrune.prunedSemiJoin(df, dim, key, dimKey, expectedItems)

    /** Sorted-neighborhood near-dup pairs: in-window candidates under
      * the (n_chars, doc_id) order, exact-Jaccard verified. */
    def nearDupsSortedNeighborhood(threshold: Double = 0.8,
        window: Int = 5): DataFrame =
      Dedup.sortedNeighborhoodPairs(df, threshold, window)

    /** Within-group exact-moment Pearson correlation of two integer
      * columns. */
    def corrBy(groupCol: String, xCol: String, yCol: String): DataFrame =
      Normalize.corrByGroup(df, groupCol, xCol, yCol)

    /** One-scan per-column completeness/cardinality/min-max profile. */
    def profileColumns(cols: String*): DataFrame =
      Profile.profile(df, cols)

    /** Rule-based constraint audit: violation counts per named rule. */
    def validateRules(rules: (String, org.apache.spark.sql.Column)*): DataFrame =
      Profile.validate(df, rules)

    /** Per-group equi-width histogram with global data-derived bounds. */
    def histogramBy(groupCol: String, valueCol: String,
        buckets: Int = 10): DataFrame =
      Profile.histogram(df, groupCol, valueCol, buckets)

    /** Winnowing (MOSS) fingerprints: per-window minima of k-gram
      * hashes — substring-granularity overlap detection. */
    def winnowFingerprints(k: Int = 3, window: Int = 4): DataFrame =
      TextAnalysis.winnowingFingerprints(df, k, window)

    /** Corpus-wide skip-gram co-occurrence top-k. */
    def cooccurrenceTopK(window: Int = 2, topK: Int = 20): DataFrame =
      TextAnalysis.cooccurrence(df, window, topK)

    /** Substring-overlap pairs: docs sharing ≥ minShared winnowing
      * fingerprints (boilerplate filtered above maxDf). */
    def winnowOverlapPairs(k: Int = 3, window: Int = 4,
        minShared: Int = 2, maxDf: Long = 1000L): DataFrame =
      Dedup.winnowingOverlapPairs(df, k, window, minShared, maxDf)

    /** Apply a CDC changeset (op column, U/D) to this snapshot —
      * key eviction by broadcast anti join, upserts unioned back. */
    def applyChangeset(changeset: DataFrame, keyCol: String = "doc_id",
        versionCol: Option[String] = None): DataFrame =
      Merge.applyChangeset(df, changeset, keyCol, versionCol = versionCol)

    /** Within-group robust z-score: (x − median) / MAD. */
    def robustScaleBy(groupCol: String, valueCol: String): DataFrame =
      Normalize.robustScaleByGroup(df, groupCol, valueCol)

    /** Within-group PERCENT_RANK without a per-group window funnel. */
    def percentileRankBy(groupCol: String, valueCol: String): DataFrame =
      Normalize.percentileRankByGroup(df, groupCol, valueCol)

    /** Per-group EQUI-DEPTH histogram on exact quantile boundaries. */
    def histogramEquiDepthBy(groupCol: String, valueCol: String,
        buckets: Int = 4): DataFrame =
      Profile.histogramEquiDepth(df, groupCol, valueCol, buckets)

    /** Ordered-funnel completion counts over an event table. */
    def funnelSteps(steps: String*): DataFrame =
      graft.ops.Behavior.funnel(df, steps)

    /** Cohort retention cells (cohort_day, day_offset, active_users). */
    def retentionCohorts(): DataFrame = graft.ops.Behavior.retention(df)

    /** Trailing-window integer-exact anomaly flags per (key, day). */
    def anomalyDays(k: Long = 3L, window: Int = 7,
        keyCol: String = "event_type"): DataFrame =
      graft.ops.Behavior.anomalyDays(df, k, window, keyCol)

    /** Dense hourly resample with zero-filled gaps + forward fill. */
    def resampleHourly(keyCol: String = "event_type"): DataFrame =
      graft.ops.Behavior.resampleHourly(df, keyCol)

    /** Per-group total-variation drift vs another slice of the same
      * schema (exact-integer TVD). */
    def driftAgainst(other: DataFrame, groupCol: String,
        valueCol: String, buckets: Int = 10): DataFrame =
      Profile.distributionDrift(df, other, groupCol, valueCol, buckets)
  }

  implicit class EmbeddingOps(private val df: DataFrame) {

    /** Exact cosine top-k for each vec_id < maxQueryId. */
    def cosineTopK(maxQueryId: Long, k: Int): DataFrame =
      Similarity.bruteForceTopK(df, maxQueryId, k)

    /** Multi-table LSH approximate top-k. */
    def cosineTopKApprox(maxQueryId: Long, k: Int, planes: Int = 4,
        tables: Int = 8): DataFrame =
      Similarity.lshTopK(df, maxQueryId, k, planes, tables)

    /** Embedding near-dup pairs above a cosine threshold. */
    def nearDupsEmbedding(planes: Int = 12, threshold: Double = 0.95): DataFrame =
      Dedup.embeddingNearDup(df, planes, threshold = threshold)

    /** IVF (coarse-quantizer) approximate top-k. */
    def cosineTopKIvf(maxQueryId: Long, k: Int, nCells: Int = 16,
        nprobe: Int = 4): DataFrame =
      Similarity.ivfTopK(df, maxQueryId, k, nCells, nprobe)

    /** SemDeDup: within-k-means-cell near-dup pairs above a cosine
      * threshold. */
    def semanticNearDups(threshold: Double = 0.95,
        nCells: Int = 16): DataFrame =
      Dedup.semanticNearDup(df, threshold, nCells)

    /** PCA projection onto the top-k principal components. */
    def pcaProject(k: Int, dim: Int = 64): DataFrame =
      Embeddings.pcaProject(df, k, dim)

    /** PQ ANN top-k: ADC lookup scoring + exact refine. */
    def cosineTopKPq(maxQueryId: Long, k: Int, m: Int = 8,
        codebookSize: Int = 16, refine: Int = 4): DataFrame =
      Similarity.pqTopK(df, maxQueryId, k, m, codebookSize, refine)

    /** IVF-PQ ANN top-k: cell-bounded scan over compressed codes. */
    def cosineTopKIvfPq(maxQueryId: Long, k: Int, nCells: Int = 16,
        nprobe: Int = 4, m: Int = 16): DataFrame =
      Similarity.ivfPqTopK(df, maxQueryId, k, nCells, nprobe, m)
  }
}
