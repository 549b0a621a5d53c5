package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CmsEstimateCount
import graft.pipeline.{Curation, Decontamination, Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import graft.pipeline.TextFunctions

/** The training-data-pipeline operator surface (SURVEY.md §2.3) on the
  * driver's query gate. SQL-expressible ops carry a DuckDB oracle;
  * hash-family ops (MinHash/SimHash/LSH — xxhash64 has no DuckDB twin)
  * are rows-only checked here and invariant-tested in scalatest.
  */
object PipelineQueries extends QueryPack {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** Materialize two INDEPENDENT frames concurrently: both
    * localCheckpoint(eager) actions run from separate driver threads,
    * so the scheduler overlaps their jobs (optimization guide §2.6 —
    * Spark runs several jobs at once; actions are only sequential
    * because driver code calls them sequentially). Results are
    * identical to the sequential spelling — wall clock is the only
    * change. */
  private def checkpointBoth(a: DataFrame, b: DataFrame)
      : (DataFrame, DataFrame) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a.localCheckpoint(true))
    val fb = Future(b.localCheckpoint(true))
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }

  // ---- dedup ----

  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(docs(s, d)).orderBy("keep_id", "content_key")

  // bounded to 1000 docs: the synthetic corpus draws every doc from
  // one tiny vocabulary, so unigram near-dup output is inherently
  // quadratic in the corpus — the bound keeps the demo SF-independent
  // (real corpora + trigram shingles stay subquadratic unbounded)
  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.minhashPairs(docs(s, d).filter(col("doc_id") < 1000),
      shingleN = 1, k = 32, bands = 8, threshold = 0.8)
      .orderBy("id_a", "id_b")

  // same SF-independence bound as dedup_minhash: near-identical docs
  // make chunk-collision candidates quadratic on this synthetic corpus
  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(docs(s, d).filter(col("doc_id") < 2000),
      maxHamming = 3).orderBy("id_a", "id_b")

  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, d), maxId = 100L, threshold = 0.8)
      .orderBy("id_a", "id_b")

  // the HASH-GATED LSH row: at r=2 banding a j>=0.7 true pair misses
  // all 32 bands with prob (1-0.49)^32 ~ 4e-10, and the exact-Jaccard
  // verify kills every false candidate — so the full MinHash->banding->
  // verify pipeline's output on this bounded subset IS the exact pair
  // set, letting DuckDB's all-pairs Jaccard reproduce it row-for-row
  // (dedup_minhash keeps the production default-banding spelling as a
  // rows-only row; DedupSpec asserts its boundary recall separately)
  def dedupMinhashVerified(s: SparkSession, d: String): DataFrame =
    Dedup.minhashPairs(docs(s, d).filter(col("doc_id") < 100),
      shingleN = 1, k = 64, bands = 32, threshold = 0.7)
      .orderBy("id_a", "id_b")

  // the EXACT scale path (prefix filtering): recall 1 by construction
  // — no banding miss probability to argue about — so it hash-matches
  // the all-pairs oracle on the same subset at the same threshold as
  // dedup_ngram_jaccard. One ground truth, three generators: brute
  // O(n²), MinHash-LSH at recall~1 banding, and this (the only one
  // that is BOTH exact and scale-shaped)
  def dedupPrefixJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.prefixJaccardPairs(docs(s, d).filter(col("doc_id") < 100),
      threshold = 0.8)
      .orderBy("id_a", "id_b")

  // the asymmetric sibling: |A∩B|/|A| — finds docs (nearly) contained
  // in others, which Jaccard's union term hides. Exact, so hash-gated
  // against the DuckDB all-pairs containment on the same subset
  def dedupContainment(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(docs(s, d).filter(col("doc_id") < 100),
      threshold = 0.9)
      .orderBy("id_a", "id_b")

  // incremental ingestion at recall-1 banding (r=2 — the
  // dedup_minhash_verified argument): the batch (doc_id 100..149)
  // dedups against the settled corpus (doc_id < 100) and itself, never
  // corpus-vs-corpus — so the pair set is EXACTLY the all-pairs truth
  // restricted to id_b >= 100, and DuckDB reproduces it row-for-row
  def dedupIncremental(s: SparkSession, d: String): DataFrame =
    Dedup.incrementalMinhashPairs(
      docs(s, d).filter(col("doc_id") >= 100 && col("doc_id") < 150),
      docs(s, d).filter(col("doc_id") < 100),
      shingleN = 1, k = 64, bands = 32, threshold = 0.7)
      .orderBy("id_a", "id_b")

  // exact novelty with the inverted Bloom prune (sketch the BATCH,
  // prune the CORPUS scan): day-3 events vs the first two days — which
  // (user, action) combos are genuinely new. The prune is invisible in
  // the result by construction (anti join removes false positives), so
  // the plain DuckDB ANTI JOIN is the oracle
  def dedupNovelKeys(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val cut = lit("2024-01-03 00:00:00").cast("timestamp")
    Dedup.novelKeys(
      e.filter(col("ts") >= cut &&
        col("ts") < lit("2024-01-04 00:00:00").cast("timestamp")),
      e.filter(col("ts") < cut),
      Seq("user_id", "event_type"))
      .orderBy("user_id", "event_type")
  }

  // threshold tuned to the synthetic embeddings (max pairwise cosine
  // ~0.51): 0.3 ~= the 99th percentile, so the verify path has real
  // work to do while the bucket join still prunes hard. Multi-table
  // params sized for this low-cosine regime (4 planes × 12 tables:
  // per-pair hit ≈ 1−(1−0.6⁴)¹² ≈ 0.8 at cos 0.3); at the 0.95
  // production threshold the defaults (8×8) give recall ≈ 0.99 —
  // DedupSpec asserts that floor on boundary-planted pairs. The row
  // carries an in-plan recall column vs the exact O(subset²) ground
  // truth on vec_id < 500 (the sim_topk_lsh pattern), so an ANN
  // regression surfaces in the driver gate as a changed recall value.
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    // both `pairs` and `exact` feed TWO consumers (the output rows and
    // the recall aggregate) — localCheckpoint(eager) materializes each
    // once so the full LSH pipeline / the O(subset²) exact join don't
    // execute twice per run (blocks belong to the returned frame; the
    // ContextCleaner reaps them when the caller drops it). The two
    // subtrees are INDEPENDENT, so they materialize concurrently
    // (checkpointBoth — optimization guide §2.6: the second job's
    // tasks back-fill the first's straggler tail)
    val (pairs, exact) = checkpointBoth(
      Dedup.embeddingNearDup(emb(s, d), planes = 4, tables = 12,
        threshold = 0.3),
      Dedup.exactCosinePairs(emb(s, d), maxId = 500L, threshold = 0.3))
    // id_a < id_b, so id_b < 500 bounds BOTH ids into the subset
    val hits = pairs.filter(col("id_b") < 500)
      .join(exact.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val tot = exact.agg(count(lit(1)).as("n_true"))
    pairs.crossJoin(broadcast(hits)).crossJoin(broadcast(tot))
      // n_true = 0 would divide by zero (NULL recall in every row,
      // silently vacating the gate); surface an explicit -1 sentinel
      // instead so a dead ground-truth subset is visible, not blank
      .withColumn("recall",
        when(col("n_true") > 0,
          col("n_hit").cast("double") / col("n_true")).otherwise(lit(-1.0)))
      .select("id_a", "id_b", "cos", "recall")
      .orderBy("id_a", "id_b")
  }

  // SemDeDup (k-means-cell semantic dedup) beside the LSH spelling:
  // same exact-cosine verify, complementary candidate generator; the
  // in-plan recall column measures the declared cell-boundary trade
  // against the same exact ground truth (rows-only row — cell
  // assignment is engine-specific)
  def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    // vec_id < 2000 bound: the within-cell self-join is Σ|cell|² — on
    // the demo cell count a full sf0.1 table would quadratically blow
    // up the bench (the dedup_minhash SF-independence discipline; at
    // scale nCells grows ~√n and the bound is unnecessary).
    // Independent subtrees materialize concurrently (see
    // dedupEmbedding).
    val (pairs, exact) = checkpointBoth(
      Dedup.semanticNearDup(
        emb(s, d).filter(col("vec_id") < 2000), threshold = 0.3,
        nCells = 8, nAssign = 3),
      Dedup.exactCosinePairs(emb(s, d), maxId = 500L, threshold = 0.3))
    val hits = pairs.filter(col("id_b") < 500)
      .join(exact.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val tot = exact.agg(count(lit(1)).as("n_true"))
    pairs.crossJoin(broadcast(hits)).crossJoin(broadcast(tot))
      .withColumn("recall",
        when(col("n_true") > 0,
          col("n_hit").cast("double") / col("n_true")).otherwise(lit(-1.0)))
      .select("id_a", "id_b", "cos", "recall")
      .orderBy("id_a", "id_b")
  }

  // the hash-gated sibling of dedup_semantic (the minhash_verified
  // discipline): nAssign = nCells is EXHAUSTIVE soft assignment —
  // every vector lands in every cell, so the candidate set is all
  // pairs and the recall-1 result is exactly the threshold-filtered
  // cosine join DuckDB reproduces with list_cosine_similarity. Pair
  // identity only (integer columns): cos stays in-engine, since two
  // engines' float accumulation orders can differ in the last ulp
  def dedupSemanticVerified(s: SparkSession, d: String): DataFrame =
    Dedup.semanticNearDup(emb(s, d).filter(col("vec_id") < 200),
        threshold = 0.3, nCells = 4, nAssign = 4)
      .select("id_a", "id_b")
      .orderBy("id_a", "id_b")

  // PCA projection of the embedding table (Embeddings.pcaProject):
  // one treeAggregate Gram pass, driver-side Jacobi eigen, broadcast
  // basis. Rows-only (float eigensystems are engine-specific); the
  // spec pins the math, the in-plan explained column monitors drift.
  // Scalar output columns only — arrays crash the driver canonicalizer
  def embPca(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Embeddings.pcaProject(emb(s, d), k = 4, dim = 64)
      .select(col("vec_id"), col("proj")(0).as("p1"),
        col("proj")(1).as("p2"), col("proj")(2).as("p3"),
        col("proj")(3).as("p4"), col("explained"))
      .orderBy("vec_id")

  // nearest-centroid assignment with 8 FIXED centroids (the lowest
  // vec_ids — a bounded driver collect, the ANN-sample discipline);
  // cluster label = the centroid's own vec_id so the DuckDB twin can
  // rank with ROW_NUMBER over the same (cosine DESC, cid) order. Only
  // the integer label is emitted — float scores stay engine-internal.
  def embClusterAssign(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val ids = cents.map(_._1)
    graft.pipeline.Embeddings
      .assignToCentroids(e, cents.map(_._2), metric = "cosine")
      .select(col("vec_id"),
        element_at(array(ids.toIndexedSeq.map(lit): _*),
          col("cluster_id").cast("int") + 1).as("cluster_id"))
      .orderBy("vec_id")
  }

  // character-level (edit distance) fuzzy pairs on a bounded subset
  def dedupFuzzy(s: SparkSession, d: String): DataFrame =
    Dedup.fuzzyPairs(docs(s, d), maxId = 200L, maxDist = 12)
      .orderBy("id_a", "id_b")

  // near-dup clustering: pairwise output -> keep/drop components
  // (same bounded subset as dedup_ngram_jaccard, which feeds it)
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupClusters(docs(s, d), maxId = 100L, threshold = 0.8)
      .orderBy("doc_id")

  // the PRODUCTION composition: LSH candidate generation feeding the
  // CC clustering — the shape a 100 TB corpus runs (no quadratic pair
  // generator anywhere). Banding at r=2 rows/band makes a J>=0.8 true
  // pair miss with prob (1-0.64)^32 ~ 6e-15, so on this bounded
  // subset the exact-Jaccard-verified pair set — and therefore the
  // clustering — equals dedup_clusters', letting the same recursive-
  // CTE oracle hash-gate the whole LSH->CC chain end to end.
  def dedupClustersLsh(s: SparkSession, d: String): DataFrame = {
    val subset = docs(s, d).filter(col("doc_id") < 100)
    Dedup.clusterPairs(
      Dedup.minhashPairs(subset, shingleN = 1, k = 64, bands = 32,
        threshold = 0.8),
      subset.select(col("doc_id")))
      .orderBy("doc_id")
  }

  // the keep/drop DECISION on top of the clustering: per near-dup
  // component, keep the best document (longest n_chars, ties to the
  // smallest doc_id) — the canonical-document selection every dedup
  // pipeline ends with. One max_by aggregate over the component join;
  // at 100 TB the clustering output is key-sized and the argmax is a
  // partial+final hash agg, no window/sort anywhere.
  def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val comp = Dedup.nearDupClusters(docs(s, d), maxId = 100L, threshold = 0.8)
    val meta = docs(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("n_chars"))
    comp.join(meta, "doc_id")
      .groupBy("component")
      .agg(
        // lexicographic (n_chars, -doc_id) ⇒ max n_chars, min doc_id
        max_by(col("doc_id"), struct(col("n_chars"), (-col("doc_id")).as("nd")))
          .as("keep_id"),
        max(col("n_chars")).as("best_chars"),
        count(lit(1)).as("n_docs"))
      .orderBy("component")
  }

  // deterministic 10% systematic sample — reproducible across engines,
  // partitionings, and reruns (the property rand() sampling lacks)
  def sampleHash(s: SparkSession, d: String): DataFrame =
    Sampling.hashSample(docs(s, d), "doc_id", permille = 100)
      .select("doc_id", "n_chars")
      .orderBy("doc_id")

  // deterministic stratified sample: exactly 25 docs per language by
  // smallest Lehmer hash — fixed per-stratum quotas (eval sets,
  // per-domain caps), WindowGroupLimit-pushed like the domain cap
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(docs(s, d), "lang", "doc_id", k = 25)
      .select("doc_id", "lang")
      .orderBy("lang", "doc_id")

  // deterministic weighted sample: keep probability proportional to
  // doc length (quality/importance-weighted corpus mixing), pure int64
  // predicate — same reproducibility contract as sample_hash
  def sampleWeighted(s: SparkSession, d: String): DataFrame =
    Sampling.weightedSample(docs(s, d), "doc_id", "n_chars",
        maxWeight = 2000L, permille = 200)
      .select("doc_id", "n_chars")
      .orderBy("doc_id")

  // per-language z-score of doc length: exact integer moments folded
  // through a fixed IEEE double tree — bit-matching the SQL spelling
  def statsZscoreByLang(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Normalize.zscoreByGroup(docs(s, d), "lang", "n_chars")
      .select("doc_id", "lang", "z")
      .orderBy("doc_id")

  // per-language winsorization of doc length: exact discrete-quantile
  // limits (rank ceil(q*n) == quantile_disc), broadcast-joined back —
  // the outlier-robust sibling of the z-score row
  def statsWinsorizeByLang(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Normalize.winsorizeByGroup(docs(s, d), "lang", "n_chars")
      .select("doc_id", "lang", "n_chars", "clipped")
      .orderBy("doc_id")

  // Unicode canonicalization audit: per-doc NFC digest + changed
  // flag — the first stage of web-scale curation (composed vs
  // decomposed encodings of the same text defeat exact dedup and
  // token stats). Hash-gated: DuckDB ships nfc_normalize
  def textNfc(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
        md5(graft.functions.UnicodeNormalize
          .unicodeNormalize(col("text"), "NFC")).as("nfc_md5"),
        when(graft.functions.UnicodeNormalize
          .unicodeNormalize(col("text"), "NFC") === col("text"), 0L)
          .otherwise(1L).as("changed"))
      .orderBy("doc_id")

  // Z-order (Morton) layout key over (n_chars, doc_id): the
  // multi-column clustering key a 100 TB table sorts by before writing
  // so min/max file stats serve predicates on EITHER column. Masking
  // to 31 bits is the expression's contract, spelled identically in
  // the oracle; pure integer bit arithmetic, so the row hash-gates.
  def pipelineZorder(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), col("n_chars"),
        graft.functions.ZOrderInterleave.zorder2(
          col("n_chars").cast("long"), col("doc_id").cast("long")).as("z"))
      .orderBy("doc_id")

  // the full curation funnel: quality gate -> exact dedup -> 50%
  // deterministic sample -> per-language stats (Curation.curate)
  def pipelineCurate(s: SparkSession, d: String): DataFrame =
    Curation.curate(docs(s, d))

  /** The COMPLETE curation DAG a production training-data pipeline
    * ships — eight stages, each a library operator, composed as one
    * dataflow and hash-gated end to end by a DuckDB CTE chain running
    * the identical construction:
    *
    *   1. quality gate (≥20 tokens, mean token length ≤12);
    *   2. CCNet-style boilerplate removal (2-token chunks in >15 docs
    *      drop everywhere, docs reassembled in order);
    *   3. exact dedup on the CLEANED content, keep-min-id — provably
    *      active via a deterministic re-crawl fixture (every %13==3
    *      doc enters twice, id-shifted; the funnel must collapse it);
    *   4. MinHash near-dup at recall-1 banding (r=2, the
    *      dedup_minhash_verified argument) + exact-Jaccard verify at
    *      0.7; greedy min-id retention drops the larger id of every
    *      surviving pair;
    *   5. decontamination: any trigram shared with the doc_id<20
    *      bench slice flags the doc (decontam_overlap's construction);
    *   6. per-source domain cap (10 best by length; WindowGroupLimit
    *      pushes the rank filter into each partition);
    *   7. declared-permille corpus mixing (en 800‰ / de 500‰ /
    *      fr 200‰, the Lehmer predicate — zero shuffles);
    *   8. token-budget sequence packing of the mixed survivors
    *      (budget 64, 8 hash shards, shard-parallel prefix sums).
    *
    * doc_id < 1000 bound: the dedup_minhash SF-independence
    * discipline — the DuckDB oracle's near-dup stage is all-pairs
    * Jaccard, quadratic by construction; the ENGINE's stages are the
    * scale-shaped spellings throughout (broadcast blocklists, banded
    * LSH, broadcast bench shingles, WindowGroupLimit, scan-level mix
    * predicates, shard-local prefix sums), so the row verifies the
    * composition's SEMANTICS while ScaleBench's pipeline_e2e row
    * measures its unbounded scaling. Exactly two wide stages touch
    * the full corpus width (boilerplate df agg, exact-dedup agg);
    * everything after operates on monotonically shrinking survivors. */
  def pipelineE2e(s: SparkSession, d: String): DataFrame = {
    val raw = docs(s, d).filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
    val base = raw.unionByName(
      raw.filter(col("doc_id") % 13 === 3)
        .withColumn("doc_id", col("doc_id") + 100000L))
    // shingleN = 1 is the fixture-bounded setting (doc_id < 1000): the
    // DuckDB oracle's all-pairs Jaccard CTE reproduces unigram
    // shingles; Curation.requireShingleSafe refuses it on unbounded
    // input, and ScaleBench's pipeline_e2e row runs the trigram default
    Curation.e2e(base.filter(col("doc_id") >= 20),
        bench = base.filter(col("doc_id") < 20), shingleN = 1)
      .orderBy("doc_id")
  }

  // the incremental production composition: a planted crawl batch
  // (fresh docs + exact re-crawls + near re-crawls of corpus docs)
  // runs the ingest funnel against the existing corpus, survivors
  // land as ONE atomic VersionedTable version, and the output is the
  // post-ingest corpus read back through the DSv2 connector — the
  // complete daily-batch loop, hash-gated
  def pipelineIngest(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
    val bench = base.filter(col("doc_id") < 20)
    val corpus = base.filter(col("doc_id") >= 20 && col("doc_id") % 10 =!= 3)
    val batch = base.filter(col("doc_id") >= 20 && col("doc_id") % 10 === 3)
      .unionByName(corpus.filter(col("doc_id") % 7 === 6)
        .withColumn("doc_id", col("doc_id") + 200000L)) // exact re-crawl
      .unionByName(corpus.filter(col("doc_id") % 7 === 2)
        .withColumn("doc_id", col("doc_id") + 300000L)
        .withColumn("text", concat(col("text"), lit(" addendum"))))
    // shingleN = 1: fixture-bounded, matching the unigram oracle CTE
    // (see pipelineE2e's note); production ingest keeps the trigram default
    val surv = Curation.ingest(batch, corpus, bench, shingleN = 1)
    // the pre-existing corpus table builds once (it is the STATE the
    // batch lands into, not the operator); the append mutates it, so
    // each rep clones — the timed body is the full ingest funnel, the
    // atomic append, and the DSv2 read-back
    val tmpRoot = LifecycleFixtures.cloneDir(
      LifecycleFixtures.template(s, d, "vingestfx") { p =>
        graft.sources.VersionedTable.init(s,
          p.resolve("tbl").toString, corpus)
      }, "ving")
    val root = tmpRoot.resolve("tbl").toString
    try {
      graft.sources.VersionedTable.append(s, root, surv, expectedVersion = 0)
      s.read.format("graft-versioned").load(root)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // ---- similarity search ----

  def simTopkBrute(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(emb(s, d), maxQueryId = 10L, k = 5)
      .orderBy("qid", "rn")

  // the approximate variants carry an in-plan recall-vs-brute column,
  // so an ANN regression (bad seed interaction, broken banding) shows
  // up in the driver gate as changed recall values — not only in the
  // scalatest recall-floor assertions
  def simTopkLsh(s: SparkSession, d: String): DataFrame =
    withRecall(Similarity.lshTopK(emb(s, d), maxQueryId = 10L, k = 5),
      Similarity.bruteForceTopK(emb(s, d), maxQueryId = 10L, k = 5), k = 5)
      .orderBy("qid", "rn")

  def simTopkIvf(s: SparkSession, d: String): DataFrame =
    withRecall(Similarity.ivfTopK(emb(s, d), maxQueryId = 10L, k = 5),
      Similarity.bruteForceTopK(emb(s, d), maxQueryId = 10L, k = 5), k = 5)
      .orderBy("qid", "rn")

  // VERIFIED twins (the dedup_semantic_verified precedent): in
  // settings where the ANN structure provably degenerates to
  // exhaustive search, the approximate operator's result IS the exact
  // top-k, so the brute-force SQL oracle applies — hash-gating the
  // family's machinery (cell-probe/bucket join, per-partition heaps,
  // final window) instead of leaving it rows-only. IVF at
  // nprobe = nCells probes every cell, so every (query, vector) pair
  // is scored exactly once; LSH at planes = 0 hashes everything into
  // one bucket, so the bucket join emits every pair. Recall is 1 BY
  // CONSTRUCTION — any hash mismatch here is a real defect in the
  // probe join / heap / ranking code, not an approximation artifact.
  def simTopkIvfVerified(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(emb(s, d), maxQueryId = 10L, k = 5,
      nCells = 16, nprobe = 16)
      .orderBy("qid", "rn")

  def simTopkLshVerified(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopK(emb(s, d), maxQueryId = 10L, k = 5,
      planes = 0, tables = 1)
      .orderBy("qid", "rn")

  // quantizer indexes build once per (application, dir) — the same
  // offline-build/online-serve split the graph row rides (and FAISS's
  // actual lifecycle): codebook training + corpus coding are the
  // index cost, every call after the first times SERVING. Determinism
  // is unaffected (fixed seed; the cached artifact IS the one a fresh
  // build produces).
  // Lifetime note (round-9 advice): entries pin localCheckpointed
  // blocks for the application's lifetime keyed on (appId, dir) — a
  // deliberate trade for the single-app bench/Verify topology (the
  // handful of demo indexes is bounded; a serving deployment persists
  // through AnnIndexStore instead of caching here). getOrElseUpdate on
  // TrieMap is not atomic, so two concurrent first calls could build
  // twice — harmless (identical artifacts, one wins the put; nothing
  // here runs gate rows concurrently).
  private val pqIndexCache =
    scala.collection.concurrent.TrieMap[String, Similarity.PqIndex]()
  private val ivfPqIndexCache =
    scala.collection.concurrent.TrieMap[String, Similarity.IvfPqIndex]()

  // the production composition: IVF cells bound WHICH vectors are
  // scanned, PQ codes bound the BYTES per scanned vector; recall
  // audited in-plan like its single-quantizer members
  def simTopkIvfPq(s: SparkSession, d: String): DataFrame = {
    val idx = ivfPqIndexCache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      Similarity.ivfPqIndex(emb(s, d), nCells = 16, m = 16,
        codebookSize = 16))
    withRecall(Similarity.ivfPqTopK(emb(s, d), maxQueryId = 10L, k = 5,
        nCells = 16, nprobe = 12, m = 16, codebookSize = 16, refine = 8,
        prebuilt = Some(idx)),
      Similarity.bruteForceTopK(emb(s, d), maxQueryId = 10L, k = 5), k = 5)
      .orderBy("qid", "rn")
  }

  // PQ + exact refine: the bytes-per-vector-bounded ANN member; the
  // recall column audits the code/refine setting in-plan
  def simTopkPq(s: SparkSession, d: String): DataFrame = {
    val idx = pqIndexCache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      Similarity.pqIndex(emb(s, d), m = 16, codebookSize = 16))
    withRecall(Similarity.pqTopK(emb(s, d), maxQueryId = 10L, k = 5,
        m = 16, codebookSize = 16, refine = 8, prebuilt = Some(idx)),
      Similarity.bruteForceTopK(emb(s, d), maxQueryId = 10L, k = 5), k = 5)
      .orderBy("qid", "rn")
  }

  // quantizer VERIFIED twins (the sim_topk_ivf_verified precedent
  // extended to the PQ family): both operators end in an EXACT
  // re-rank of the ADC shortlist, so at refine·k ≥ |corpus| (and all
  // cells probed, for IVF-PQ) every vector survives into the exact
  // pass and quantization error cannot affect the output — recall 1
  // BY CONSTRUCTION, the brute-force oracle hash-gates the ADC scan,
  // the per-partition shortlist heaps, and the refine join. refine =
  // 1000 at k = 5 covers every testdata SF (max 2000 vectors) with
  // margin.
  def simTopkPqVerified(s: SparkSession, d: String): DataFrame = {
    val idx = pqIndexCache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      Similarity.pqIndex(emb(s, d), m = 16, codebookSize = 16))
    Similarity.pqTopK(emb(s, d), maxQueryId = 10L, k = 5,
      m = 16, codebookSize = 16, refine = 1000, prebuilt = Some(idx))
      .orderBy("qid", "rn")
  }

  def simTopkIvfPqVerified(s: SparkSession, d: String): DataFrame = {
    val idx = ivfPqIndexCache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      Similarity.ivfPqIndex(emb(s, d), nCells = 16, m = 16,
        codebookSize = 16))
    Similarity.ivfPqTopK(emb(s, d), maxQueryId = 10L, k = 5,
      nCells = 16, nprobe = 16, m = 16, codebookSize = 16,
      refine = 1000, prebuilt = Some(idx))
      .orderBy("qid", "rn")
  }

  // the REBUILD-DECISION half of the index lifecycle: mean
  // quantization error of a candidate ingest batch vs the index's
  // build-time baseline, rebuild flag at 2x. Two batches audited
  // in-plan: an on-distribution subset of the corpus itself (rides
  // ~1x) and a planted geometry shift (one-hot spike vectors — a
  // distribution no dense-trained codebook fits). Rows-only: the
  // ratio IS the audit, and the spec pins its behavior on
  // constructed distributions.
  def simPqDrift(s: SparkSession, d: String): DataFrame = {
    val idx = pqIndexCache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      Similarity.pqIndex(emb(s, d), m = 16, codebookSize = 16))
    val onDist = emb(s, d).filter(col("vec_id") % 5 === 0)
    val shifted = onDist.withColumn("embedding",
      transform(sequence(lit(0), lit(63)),
        i => when(i === (col("vec_id") % 64).cast("int"), lit(1.0f))
          .otherwise(lit(0.0f))))
    Similarity.pqDriftAudit(idx, onDist, rebuildThreshold = 2.0)
      .withColumn("batch", lit("ondist"))
      .unionByName(
        Similarity.pqDriftAudit(idx, shifted, rebuildThreshold = 2.0)
          .withColumn("batch", lit("shifted")))
      .select(col("batch"), col("n_corpus"), col("n_batch"),
        col("corpus_mse"), col("batch_mse"), col("drift_ratio"),
        col("rebuild"))
      .orderBy("batch")
  }

  // the navigable-graph ANN member (GraphAnn): NN-Descent k-NN graph
  // + relational beam search. Rows-only — graph construction is
  // engine-specific — with the family's in-plan recall audit; the
  // spec additionally pins a 0.9 recall floor and round-over-round
  // graph improvement. The k-NN graph is an INDEX: like q30's
  // bucketed tables (Io.ensureBucketed) it builds once per
  // (application, dir) and every subsequent call — and every bench
  // repetition — times SERVING over the prebuilt graph, which is the
  // production split (indexes build offline, queries run online).
  // vec_id < 1000 bound: the build is the O(n·graphK²)-per-round
  // index cost, bounded for bench stability (the dedup_semantic
  // SF-independence discipline); parameters sit where measured recall
  // on the gate's UNSTRUCTURED embeddings — the family's hard
  // regime — reaches 1.0 (graphK 16, 3 rounds, beam 32, 3 hops)
  private val graphIndexCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()
  def simTopkGraph(s: SparkSession, d: String): DataFrame = {
    val sub = emb(s, d).filter(col("vec_id") < 1000)
    val g = graphIndexCache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.pipeline.GraphAnn.undirected(
        graft.pipeline.GraphAnn.nnDescentGraph(sub, k = 16, iters = 3)))
    // the brute recall twin is independent of the beam-search hops,
    // which materialize eagerly (per-hop checkpoints) — overlap the
    // twin's materialization with them (guide §2.6) instead of paying
    // it serially after the last hop
    val brute = {
      import scala.concurrent.ExecutionContext.Implicits.global
      scala.concurrent.Future(
        Similarity.bruteForceTopK(sub, maxQueryId = 10L, k = 5)
          .localCheckpoint(true))
    }
    val approx = graft.pipeline.GraphAnn.graphTopK(sub,
      maxQueryId = 10L, k = 5, beam = 32, hops = 3,
      prebuiltUndirected = Some(g))
    withRecall(approx,
      scala.concurrent.Await.result(brute,
        scala.concurrent.duration.Duration.Inf), k = 5)
      .orderBy("qid", "rn")
  }

  // VERIFIED twin (the ivf/lsh precedent, graph spelling): with
  // EXHAUSTIVE entry seeds (graphK + 1 >= |corpus|, so entrySeeds'
  // limit keeps every vertex), the hop-0 beam scores every
  // (query, candidate) pair — the beam after hop 0 IS the exact
  // top-beam, and later hops can only re-confirm it (topBeam unions
  // the frontier WITH the current beam, so a true top-k member once
  // found is never displaced by a lower-scoring candidate; ties break
  // on the same (cos DESC, nid) order as brute force). Recall is 1 BY
  // CONSTRUCTION irrespective of graph quality, so the brute-force SQL
  // oracle hash-gates the family's machinery: seed scoring, the
  // per-partition beam heaps, frontier expansion through the
  // adjacency, the union-keeps-best pruning loop, and the final
  // ranking window.
  def simTopkGraphVerified(s: SparkSession, d: String): DataFrame = {
    val sub = emb(s, d).filter(col("vec_id") < 1000)
    val g = graphIndexCache.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d,
      graft.pipeline.GraphAnn.undirected(
        graft.pipeline.GraphAnn.nnDescentGraph(sub, k = 16, iters = 3)))
    graft.pipeline.GraphAnn.graphTopK(sub,
        maxQueryId = 10L, k = 5, graphK = 1 << 20, beam = 5, hops = 3,
        prebuiltUndirected = Some(g))
      .orderBy("qid", "rn")
  }

  /** recall@k per query = |approx top-k ∩ exact top-k| / k, computed
    * in-plan (a semi join on the two k-row-per-query sets + one tiny
    * aggregate) and repeated on every output row of that query. */
  private def withRecall(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.select(col("qid"), col("nid"))
      .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    approx.join(hits, Seq("qid"), "left")
      .withColumn("recall",
        coalesce(col("hits"), lit(0L)).cast("double") / k)
      .drop("hits")
  }

  // ---- text analysis ----

  def textTokens(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenCounts(docs(s, d)).orderBy("doc_id")

  def textQuality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityScores(docs(s, d),
      Seq("the", "a", "of", "and", "to", "in")).orderBy("doc_id")

  // CCNet-style bigram-LM quality filter: the model trains on the
  // doc_id%10==0 slice (the "curated reference" stand-in), every doc
  // scores against it; the gate rounds the score (sum-order double
  // wiggle ~1e-13 « the 1e-4 step) and carries the keep/drop verdict
  // at the measured-median threshold -5.1
  def textLmScore(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    TextAnalysis.lmScore(all,
      all.filter(col("doc_id") % 10 === 0), threshold = -5.1)
      .withColumn("lm_score", round(col("lm_score"), 4))
      .orderBy("doc_id")
  }

  def textLangid(s: SparkSession, d: String): DataFrame =
    TextAnalysis.languageId(docs(s, d)).orderBy("doc_id")

  def textFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprints(docs(s, d)).orderBy("doc_id")

  def textBigrams(s: SparkSession, d: String): DataFrame =
    TextAnalysis.topBigrams(docs(s, d), topK = 20)

  // winnowing (MOSS) fingerprints on the doc_id<1000 subset: k-gram
  // md5-40bit hashes + per-window minima are pure integer arithmetic,
  // so the sampled (pos, hash) set hash-gates cross-engine
  def textWinnow(s: SparkSession, d: String): DataFrame =
    TextAnalysis.winnowingFingerprints(
      docs(s, d).filter(col("doc_id") < 1000), k = 3, window = 4)
      .orderBy("doc_id", "fp_pos", "fp_hash")

  // winnowing-overlap pairs (the 4th candidate-generation family):
  // docs sharing >=2 sampled fingerprints after the df<=100
  // boilerplate filter — exact integer construction, hash-gated
  def dedupWinnow(s: SparkSession, d: String): DataFrame =
    Dedup.winnowingOverlapPairs(docs(s, d).filter(col("doc_id") < 1000),
      k = 3, window = 4, minShared = 2, maxDf = 100L)
      .orderBy("id_a", "id_b")

  // conjunctive AND retrieval over the corpus, tf-ranked top-10 for
  // three fixed queries (275-322 conjunctive matches each at sf0.01)
  private val searchQueries = Seq(
    "q_joins" -> Seq("hash", "join"),
    "q_scan" -> Seq("scan", "filter", "column"),
    "q_stream" -> Seq("stream", "window"))

  def textSearch(s: SparkSession, d: String): DataFrame =
    TextAnalysis.searchConjunctive(docs(s, d), searchQueries, k = 10)
      .orderBy("qid", "rank")

  // exact substring-level dedup (Lee et al. ACL'22): maximal
  // duplicated 5-token spans corpus-wide; DuckDB rebuilds the same
  // islands from gram TEXT where Spark keys on xxhash64(gram) —
  // identical output absent a 64-bit collision (none at gate scale)
  def dedupSubstring(s: SparkSession, d: String): DataFrame =
    Dedup.duplicatedSpans(docs(s, d), L = 5)
      .orderBy("doc_id", "span_start")

  def dedupSubstringStats(s: SparkSession, d: String): DataFrame =
    Dedup.substringDupStats(docs(s, d), L = 5).orderBy("doc_id")

  // skip-gram co-occurrence top-20 at window 2 — the count-based
  // embedding/PMI front half; DuckDB reproduces it by positional
  // self-join where Spark generates pairs per row
  def textCooccur(s: SparkSession, d: String): DataFrame =
    TextAnalysis.cooccurrence(docs(s, d), window = 2, topK = 20)

  def textRepetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repetitionStats(docs(s, d)).orderBy("doc_id")

  def textChunks(s: SparkSession, d: String): DataFrame =
    TextAnalysis.chunkTokens(docs(s, d), chunkSize = 64)
      .orderBy("doc_id", "chunk_idx")

  // deterministic corpus mixing (the Pile/Dolma recipe step):
  // languages play the role of sources, each sampled at its declared
  // permille by the engine-portable Lehmer predicate and union'd with
  // a mix label — zero shuffles, zero cross-source coupling
  def pipelineMix(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    Sampling.mixCorpora(Seq(
      ("en_heavy", dd.filter(col("lang") === "en"), 800),
      ("de_half", dd.filter(col("lang") === "de"), 500),
      ("fr_light", dd.filter(col("lang") === "fr"), 200)), "doc_id")
      .select("doc_id", "lang", "mix_source", "n_chars")
      .orderBy("doc_id")
  }

  // the dedup pipeline's last mile: leakage-safe train/valid/test
  // split — every near-dup COMPONENT lands wholly in one split, so
  // near-duplicates can never straddle the train/eval boundary
  // (the same bounded exact clustering dedup_clusters gates, then a
  // narrow Lehmer-threshold projection over the component label)
  def pipelineSplitSafe(s: SparkSession, d: String): DataFrame =
    Sampling.leakageSafeSplit(
      Dedup.nearDupClusters(docs(s, d), maxId = 100L, threshold = 0.8))
      .orderBy("doc_id")

  // token-budget sequence packing: whole docs dealt into 8 shards,
  // greedily packed into ~256-token training sequences — shard-
  // parallel prefix sums, never a global single-task cumsum
  def textPack(s: SparkSession, d: String): DataFrame =
    TextAnalysis.packSequences(docs(s, d), budget = 256, shards = 8)
      .orderBy("doc_id")

  // corpus-frequency boilerplate removal (CCNet line-dedup pattern
  // over deterministic chunks): 2-token chunks repeated across > 15
  // docs are dropped everywhere, docs reassembled from the survivors
  // in order — the broadcast-blocklist anti-join spelling
  def textBoilerplate(s: SparkSession, d: String): DataFrame =
    TextAnalysis.boilerplateRemoval(docs(s, d), chunkSize = 2, maxDf = 15)
      .orderBy("doc_id")

  // per-domain document cap (the C4/RefinedWeb domain-downsampling
  // step): keep at most 10 docs per source, preferring longer ones.
  // The declarative ROW_NUMBER spelling is scale-safe in Spark 3.5+:
  // WindowGroupLimit pushes the rank<=k filter INTO each partition
  // before the per-domain sort, so a heavy-hitter domain never funnels
  // its full row set through one sort task (the same mechanism q6
  // rides; PlanAuditSpec asserts the node).
  def pipelineDomainCap(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    docs(s, d).select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy("source", "rn")
  }

  // PII redaction statistics (emails / IPv4 scrub counts + cleaned
  // length). The synthetic corpus contains no PII, so the gate row is
  // a cross-engine regex-dialect parity check on real text; the
  // semantics are asserted on planted fixtures in TextAnalysisSpec.
  def textRedact(s: SparkSession, d: String): DataFrame =
    TextAnalysis.redactionStats(docs(s, d)).orderBy("doc_id")

  // inverted-index term statistics: document frequency + total term
  // frequency for the top-50 terms by df — the index-build shape (one
  // explode + one partial+final agg; counts exact BIGINTs). The LIMIT
  // boundary is total-ordered by (df DESC, tf DESC, term).
  def textPostings(s: SparkSession, d: String): DataFrame =
    TextAnalysis.postings(docs(s, d), topK = 50)

  // benchmark decontamination: docs 0..19 stand in for the eval set,
  // the rest are the training corpus; any shared trigram flags the doc
  def decontamOverlap(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    Decontamination.contaminated(
      all.filter(col("doc_id") >= 20),
      all.filter(col("doc_id") < 20), n = 3, minHits = 1)
      .orderBy("doc_id")
  }

  // substring-level contamination: corpus docs sharing >=2 winnowing
  // fingerprints with the benchmark slice — the sampled-with-guarantee
  // sibling of decontam_overlap's exhaustive shingle match
  // doc_id < 1000 bound: the text_winnow/dedup_winnow SF-independence
  // discipline — fingerprinting is linear but md5-per-kgram heavy, and
  // the demo row should not dominate the bench at high SF
  def decontamWinnow(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d).filter(col("doc_id") < 1000)
    Decontamination.contaminatedSubstring(
      all.filter(col("doc_id") >= 20), all.filter(col("doc_id") < 20),
      k = 3, window = 4, minShared = 2)
      .orderBy("doc_id")
  }

  // corpus-derived top-100 vocabulary + per-doc OOV rates — exact
  // counts, one final division
  def textVocabOov(s: SparkSession, d: String): DataFrame =
    TextAnalysis.vocabOov(docs(s, d), vocabSize = 100)
      .orderBy("doc_id")

  // ---- multimodal ----

  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.asMedia(docs(s, d))
      .select(col("doc_id"), col("meta.nBytes").as("n_bytes"),
        col("meta.kind").as("kind"))
      .orderBy("doc_id")

  def multimodalFrames(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.asMedia(docs(s, d)), frames = 4)
      .orderBy("doc_id", "frame_idx")

  // resize plumbing: output metadata is integer arithmetic (DuckDB
  // twin: LEAST(64, octet_length)); the resampled byte content itself
  // is asserted in TextAnalysisSpec (DuckDB can't index into BLOBs)
  def multimodalResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resize(Multimodal.asMedia(docs(s, d)), targetBytes = 64)
      .toDF()
      .select(col("doc_id"), col("meta.nBytes").as("n_bytes_out"))
      .orderBy("doc_id")

  // perceptual (aHash) fingerprints over the media payloads — the
  // image-dedup member of the dedup family. The gate row emits the
  // per-doc 64-bit hashes (deterministic; rows-only — the hash
  // consumes raw payload bytes, no DuckDB twin); the banded pair
  // generator (perceptualNearDup, the dedup_simhash shape) is
  // spec-gated instead: this corpus has no byte-level near-dup media,
  // so its pair set here is empty by fixture, not by operator
  def multimodalPhash(s: SparkSession, d: String): DataFrame =
    Multimodal.perceptualHashes(Multimodal.asMedia(docs(s, d)))
      .orderBy("doc_id")

  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs(s, d)))
    f.toDF().select(col("doc_id"), col("nBytes").as("n_bytes"),
      posexplode(col("features")).as(Seq("fidx", "fval")))
      .orderBy("doc_id", "fidx")
  }

  /** Cardinality sketches over dedup-relevant keys: HLL
    * approx_count_distinct next to the exact count. At 100 TB the
    * exact distinct is a full shuffle of every key; the sketch is a
    * constant-size mergeable state per partition — this query is the
    * side-by-side demonstration (rows-only check: HLL estimates are
    * engine-specific; accuracy is asserted in SketchSpec). */
  def statsCardinality(s: SparkSession, d: String): DataFrame = {
    val docs0 = docs(s, d)
    docs0.select(
      count(lit(1)).as("rows"),
      countDistinct(col("text")).as("exact_distinct_text"),
      approx_count_distinct(col("text"), 0.02).as("approx_distinct_text"),
      approx_count_distinct(md5(col("text")), 0.02).as("approx_distinct_md5"))
  }

  /** Per-group exact distinct counts — the grouped, hash-gated twin of
    * stats_cardinality's global exact-vs-HLL comparison (the sketch
    * estimate itself stays in that rows-only row; this one pins the
    * exact values the sketch approximates, per group). count(DISTINCT)
    * per group is the expensive op at 100 TB — the one the mergeable
    * HLL state replaces when ±2% suffices. */
  def statsDistinctByLang(s: SparkSession, d: String): DataFrame =
    docs(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("distinct_texts"),
        countDistinct(col("source")).as("distinct_sources"))
      .orderBy("lang")

  // the GROUPED HLL beside the exact twin above: per-language sketched
  // distinct with its relative error computed in-plan against the
  // exact count — the 100 TB form (countDistinct shuffles every
  // distinct value per group; the HLL ships mergeable kilobyte state)
  // with its accuracy self-audited in the same row. rows-only gate
  // (sketch estimates are engine-specific); SketchSpec bounds the
  // error mechanically.
  def statsHllByLang(s: SparkSession, d: String): DataFrame =
    docs(s, d).groupBy("lang")
      .agg(countDistinct(col("text")).as("exact_texts"),
        approx_count_distinct(col("text"), 0.02).as("approx_texts"))
      .withColumn("rel_err",
        abs(col("approx_texts") - col("exact_texts")).cast("double") /
          col("exact_texts").cast("double"))
      .orderBy("lang")

  /** Exact corpus heavy hitters: top-k tokens by raw term frequency.
    * The plan is the scale shape for "what dominates my corpus": one
    * partial+final count aggregate on the exploded tokens, then
    * TakeOrderedAndProject (per-partition top-k, k-sized driver merge
    * — never a global sort). Total order (cnt DESC, tok) makes the
    * k-cutoff deterministic, so the row hash-gates. */
  def statsHeavyHitters(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(20)

  /** The sketched twin: a Count-Min sketch built over xxhash64(token)
    * in ONE aggregate (constant-size mergeable state — the 100 TB
    * path when exact token counts would mean a giant exchange), probed
    * in-plan by the native CmsEstimateCount expression for the exact
    * top-20's keys. Rows-only (estimates are engine-specific): the
    * audit columns carry the CMS one-sided error per row — overcount
    * is >= 0 always (CMS never undercounts) and <= eps·N with 99%
    * confidence; SketchSpec asserts both, and a drifting estimate
    * shows up in the driver gate as changed values. */
  def statsCmsTopk(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val sketch = toks
      .select(count_min_sketch(xxhash64(col("tok")), lit(0.001d),
        lit(0.99d), lit(42)).as("cms"))
      .scalar()
    statsHeavyHitters(s, d)
      .withColumn("est", CmsEstimateCount.cmsEstimate(sketch, xxhash64(col("tok"))))
      .withColumn("overcount", col("est") - col("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Exact vs sketched quantiles side by side (the quantile member of
    * the sketch family next to stats_cardinality's HLL): the exact
    * median needs a per-group sort; approx_percentile is one pass of
    * constant-size mergeable state — the 100 TB path. Rows-only check
    * (sketch estimates are engine-specific); SketchSpec asserts the
    * approximation error bound. All columns SCALAR doubles — the
    * round-2 array-typed p10_p90 column broke the driver's
    * canonicalizer (arrays don't sort/hash in pandas). */
  def statsQuantiles(s: SparkSession, d: String): DataFrame = {
    val docs0 = docs(s, d)
    docs0.select(
      expr("percentile(n_chars, 0.5)").as("exact_median_chars"),
      expr("approx_percentile(n_chars, 0.5, 1000)").cast("double")
        .as("approx_median_chars"),
      expr("approx_percentile(n_chars, 0.1, 1000)").cast("double").as("p10"),
      expr("approx_percentile(n_chars, 0.9, 1000)").cast("double").as("p90"))
  }

  /** The exact-quantile half alone, so the sketch family has a
    * hash-gated member: Spark's exact `percentile` at p=0.5 computes
    * (a+b)/2 on the two middle values — the same interpolation DuckDB's
    * `median` performs, exactly representable in double for integer
    * inputs, so the hashes agree. */
  def statsMedian(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      expr("percentile(n_chars, 0.5)").as("exact_median_chars"),
      count(lit(1)).as("n_docs"))

  /** Exact DISTRIBUTED p10/p50/p90 per language — the scale-safe
    * GroupedMedian machinery generalized to arbitrary rank lists
    * (max(1, ⌈q·n⌉), DuckDB quantile_disc semantics), hash-gated
    * against quantile_disc itself. This makes stats_quantiles'
    * approx_percentile row checkable end to end: its sketch estimates
    * stay rows-only, but the exact values they approximate now have an
    * oracle-verified producer with no per-group sort funnel. */
  def statsQuantilesExact(s: SparkSession, d: String): DataFrame =
    // NULL discipline: Spark's groupBy(lang, n_chars) would rank NULL
    // as a value and count(1) would include it, while DuckDB's
    // quantile_disc ignores NULLs — filter them out before ranking
    // (and COUNT(n_chars) in the oracle) so the engines agree even if
    // a future testdata refresh introduces NULL n_chars
    GroupedMedian.exactQuantiles(
      docs(s, d).select(col("lang"), col("n_chars"))
        .filter(col("n_chars").isNotNull),
      "lang", "n_chars", Seq(0.1, 0.5, 0.9))
      .orderBy("lang", "q")

  // sorted-neighborhood blocking on the doc_id<200 subset: the window
  // bounds candidates to O(n·w) unconditionally (the third candidate-
  // generation family; see Dedup.sortedNeighborhoodPairs), and the
  // in-window pair set under the total (n_chars, doc_id) order is
  // deterministic, so DuckDB's ROW_NUMBER twin reproduces it exactly
  def dedupSortedNeighborhood(s: SparkSession, d: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(docs(s, d).filter(col("doc_id") < 200),
      threshold = 0.8, window = 5)
      .orderBy("id_a", "id_b")

  // per-language Pearson corr of doc length vs token count — exact
  // integer sums folded through a fixed IEEE tree (Normalize.
  // corrByGroup), so the double output hash-gates where Spark's own
  // corr aggregate (partition-order double accumulation) never could
  def statsCorrByLang(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Normalize.corrByGroup(
      docs(s, d).withColumn("n_tokens",
        size(TextFunctions.tokens(col("text")))),
      "lang", "n_chars", "n_tokens")
      .orderBy("lang")

  // per-language equi-width histogram of doc length with data-derived
  // global bounds — integer-exact bucketing (Profile.histogram)
  def statsHistogram(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Profile.histogram(docs(s, d), "lang", "n_chars",
        buckets = 10)
      .orderBy("lang", "bucket")

  // per-language robust z-score (median/MAD — Normalize.
  // robustScaleByGroup): both statistics exact discrete order
  // statistics from the GroupedMedian machinery, the only float op
  // one final division, so the DOUBLE hash-gates vs quantile_disc
  def statsRobustByLang(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Normalize.robustScaleByGroup(
      docs(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
      "lang", "n_chars")
      .orderBy("doc_id")

  // per-language EQUI-DEPTH histogram of doc length — boundaries are
  // the group's own exact quartiles (Profile.histogramEquiDepth), so
  // heavy-tailed features get readable buckets where equi-width piles
  // everything into bucket 0
  def statsHistogramEqdepth(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Profile.histogramEquiDepth(docs(s, d), "lang",
        "n_chars", buckets = 4)
      .orderBy("lang", "bucket")

  // CDC MERGE: a deterministic changeset derived from the corpus
  // itself (doc_id%7==1 re-crawled, %7==0 taken down, %7==2 newly
  // ingested under shifted ids) applied via Merge.applyChangeset —
  // the anti-join + union spelling DuckDB reproduces row-for-row
  def pipelineUpsert(s: SparkSession, d: String): DataFrame = {
    val snap = docs(s, d)
    val upd = snap.filter(col("doc_id") % 7 === 1)
      .withColumn("source", lit("patched")).withColumn("op", lit("U"))
    val del = snap.filter(col("doc_id") % 7 === 0)
      .withColumn("op", lit("D"))
    val ins = snap.filter(col("doc_id") % 7 === 2)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("source", lit("ingested")).withColumn("op", lit("U"))
    graft.pipeline.Merge.applyChangeset(snap,
        upd.unionByName(del).unionByName(ins), "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  // the SAME merge flowed through the versioned table format
  // (sources.VersionedTable): snapshot committed as v0, changeset
  // merged into v1, result read back AT version 1 through the
  // `graft-versioned` DataSourceV2 connector (time-travel option +
  // manifest resolution + Spark's own vectorized parquet scan) — the
  // init/merge/connector-read protocol exercised end to end,
  // hash-gated by pipeline_upsert's relational oracle because a table
  // FORMAT must never change merge RESULTS (the q30 layout
  // discipline; merge() itself reads the base snapshot through the
  // programmatic path, so both read spellings sit in this one row).
  // Fresh temp root per invocation so every run commits from scratch;
  // the result is MATERIALIZED (eager localCheckpoint) so the temp
  // table can be deleted before returning — without this, repeated
  // bench runs leak two full corpus copies into /tmp per repetition.
  /** v0 = the full docs snapshot, v1 = the planted merge changeset —
    * the lifecycle fixture behind the merge/CDF gate family, built
    * ONCE per (application, sf dir); each gate's per-rep body is pure
    * read-only serving over it (the round-20 re-basing discipline:
    * the operators those commits exercise — init, merge — have their
    * own gates and ScaleBench decade rows, and re-measuring the
    * fixture 3-5x per row only re-measured commit scaffolding). */
  private def mergedDocsFixture(s: SparkSession, d: String): String =
    LifecycleFixtures(s, d, "vmergefx") { tmpRoot =>
      val snap = docs(s, d)
      val upd = snap.filter(col("doc_id") % 7 === 1)
        .withColumn("source", lit("patched")).withColumn("op", lit("U"))
      val del = snap.filter(col("doc_id") % 7 === 0)
        .withColumn("op", lit("D"))
      val ins = snap.filter(col("doc_id") % 7 === 2)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("source", lit("ingested")).withColumn("op", lit("U"))
      val root = tmpRoot.resolve("tbl").toString
      graft.sources.VersionedTable.init(s, root, snap)
      graft.sources.VersionedTable.merge(s, root,
        upd.unionByName(del).unionByName(ins), "doc_id")
      root
    }

  /** The 3-append range-clustered layout (disjoint doc_id envelopes
    * per commit dir) shared by the skip gate (reads the template) and
    * the delete/update gates (clone it per rep — their DML mutates). */
  private def rangeLayoutTemplate(s: SparkSession, d: String)
      : java.nio.file.Path =
    LifecycleFixtures.template(s, d, "vrangefx") { tmpRoot =>
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
      val root = tmpRoot.resolve("tbl").toString
      val vt = graft.sources.VersionedTable
      vt.init(s, root, base.filter(col("doc_id") < 150)
        .repartitionByRange(2, col("doc_id")))
      vt.append(s, root,
        base.filter(col("doc_id") >= 150 && col("doc_id") < 300)
          .repartitionByRange(2, col("doc_id")), expectedVersion = 0)
      vt.append(s, root,
        base.filter(col("doc_id") >= 300 && col("doc_id") < 450)
          .repartitionByRange(2, col("doc_id")), expectedVersion = 1)
    }

  def pipelineVersionedMerge(s: SparkSession, d: String): DataFrame =
    // read-only serving over the shared merged-table fixture (the
    // init+merge lifecycle builds once; this body times the versioned
    // snapshot read of the post-merge version)
    s.read.format("graft-versioned").option("versionAsOf", 1)
      .load(mergedDocsFixture(s, d))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
      .localCheckpoint(true)

  // CHANGE-DATA-FEED across the same planted merge: the row-level
  // delta v0 → v1 a downstream consumer would apply, hash-gated
  // against DuckDB's EXCEPT ALL spelling of the same multiset diff.
  // The merge rewrites the snapshot, so this exercises the GENERAL
  // (content-diff) path; the O(delta) append fast path and the
  // empty-feed-across-compact/optimize invariants are plan- and
  // property-asserted in CdfSpec (not SQL-expressible: they are
  // statements about I/O shape, not row values).
  def pipelineVersionedChanges(s: SparkSession, d: String): DataFrame =
    // read-only: the content-diff feed over the shared fixture
    graft.sources.VersionedTable
      .changesBetween(s, mergedDocsFixture(s, d), 0, 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"), col("change_kind"))
      .orderBy("doc_id", "change_kind")
      .localCheckpoint(true)

  // the SAME feed read through the DSv2 connector's readChangeFeed
  // mode (Delta's option spelling: startingVersion/endingVersion) —
  // the DataFrame-reachable spelling of changesBetween, hash-gated by
  // the SAME EXCEPT-ALL oracle as pipeline_versioned_changes (one
  // truth, two spellings; the per-row _commit_version tag is dropped
  // for the cross-engine compare)
  def pipelineVersionedChangesFeed(s: SparkSession, d: String): DataFrame =
    // read-only: the connector CDF spelling over the shared fixture
    s.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1")
      .load(mergedDocsFixture(s, d))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"), col("change_kind"))
      .orderBy("doc_id", "change_kind")
      .localCheckpoint(true)

  // the SAME single-version feed through PURE SQL end-to-end: the
  // table lives in a throwaway graft catalog, the changeset lands via
  // SQL MERGE, and the feed reads back through the `table_changes`
  // TVF GraftSqlExtensions registers (Delta's SQL CDF spelling) — so
  // DDL → DML → CDF runs entirely in spark.sql. Hash-gated by the
  // SAME EXCEPT-ALL oracle as pipeline_versioned_changes_feed (one
  // feed, three spellings: programmatic, connector option, SQL TVF).
  def pipelineVersionedChangesSql(s: SparkSession, d: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_vcsql")
    val cat = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpRoot.toString)
      docs(s, d).select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("text"))
        .createOrReplaceTempView("vcsql_docs")
      s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, lang STRING, " +
        "source STRING, n_chars BIGINT, text STRING)")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vcsql_docs")
      s.sql(
        s"""MERGE INTO $cat.docs t
           |USING (
           |  SELECT doc_id, lang, 'patched' AS source, n_chars, text,
           |    'U' AS op FROM vcsql_docs WHERE doc_id % 7 = 1
           |  UNION ALL
           |  SELECT doc_id, lang, source, n_chars, text, 'D'
           |  FROM vcsql_docs WHERE doc_id % 7 = 0
           |  UNION ALL
           |  SELECT doc_id + 1000000, lang, 'ingested', n_chars, text, 'U'
           |  FROM vcsql_docs WHERE doc_id % 7 = 2
           |) c
           |ON t.doc_id = c.doc_id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET t.lang = c.lang,
           |  t.source = c.source, t.n_chars = c.n_chars, t.text = c.text
           |WHEN NOT MATCHED AND c.op = 'U' THEN
           |  INSERT (doc_id, lang, source, n_chars, text)
           |  VALUES (c.doc_id, c.lang, c.source, c.n_chars, c.text)
           |""".stripMargin)
      // CREATE = v0, INSERT = v1, MERGE = v2: the TVF serves exactly
      // the merge's delta (inclusive version bounds, Delta's shape)
      s.sql("SELECT doc_id, lang, source, n_chars, " +
        "md5(text) AS text_md5, change_kind " +
        s"FROM table_changes('$cat.docs', 2, 2) " +
        "ORDER BY doc_id, change_kind")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // the SAME feed in key-aware mode (key = doc_id, the column the
  // merge itself pairs on): updated keys surface as paired
  // update_preimage/update_postimage rows instead of delete+insert —
  // Delta-CDF vocabulary, so a downstream MERGE consumer applies the
  // feed without reconstructing row identity. Hash-gated against
  // DuckDB's FULL OUTER JOIN spelling of the same pairing.
  def pipelineVersionedChangesKeyed(s: SparkSession, d: String): DataFrame =
    // read-only: the keyed feed over the shared fixture
    graft.sources.VersionedTable
      .changesBetween(s, mergedDocsFixture(s, d), 0, 1,
        key = Some("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"), col("change_kind"))
      .orderBy("doc_id", "change_kind")
      .localCheckpoint(true)

  // the SAME keyed feed served from COMMIT-TIME CHANGE FILES
  // (enableChangeFeed before the merge, Delta's CDC-file approach):
  // the rewrite materializes its pre/post images at the commit point,
  // so serving the feed is an O(change-file) scan — the in-gate canary
  // requires the file to exist and the feed plan to contain NO join
  // (a join means the on-demand snapshot diff ran instead). Hash-gated
  // by the SAME FULL OUTER JOIN oracle as
  // pipeline_versioned_changes_keyed: one vocabulary, two serving
  // regimes, identical rows.
  def pipelineVersionedCdcFiles(s: SparkSession, d: String): DataFrame = {
    val vt = graft.sources.VersionedTable
    // build-once fixture (init -> CDC pin -> merge); the body serves
    // the change-file feed read-only, with both canaries still
    // asserted per rep (driver-side manifest/plan checks)
    val root = LifecycleFixtures(s, d, "vcdcffx") { tmpRoot =>
      val snap = docs(s, d)
      val upd = snap.filter(col("doc_id") % 7 === 1)
        .withColumn("source", lit("patched")).withColumn("op", lit("U"))
      val del = snap.filter(col("doc_id") % 7 === 0)
        .withColumn("op", lit("D"))
      val ins = snap.filter(col("doc_id") % 7 === 2)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("source", lit("ingested")).withColumn("op", lit("U"))
      val r = tmpRoot.resolve("tbl").toString
      vt.init(s, r, snap)
      vt.enableChangeFeed(s, r, "doc_id") // v1, metadata-only
      vt.merge(s, r, upd.unionByName(del).unionByName(ins), "doc_id")
      r
    }
    require(vt.changeFilePathIfExists(s, root, 2).isDefined,
      "merge did not materialize its commit-time change file")
    val feed = vt.changesBetween(s, root, 1, 2, key = Some("doc_id"))
    require(feed.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty,
      "keyed feed planned a snapshot join — change-file serving " +
        "regressed")
    feed
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"), col("change_kind"))
      .orderBy("doc_id", "change_kind")
      .localCheckpoint(true)
  }

  // manifest-stats FILE SKIPPING end to end: three appends land three
  // commit dirs whose `#file:` envelopes partition doc_id into
  // disjoint ranges; the readWhere scan resolves the predicate
  // against the manifest ALONE and opens only the dirs whose
  // envelope intersects [320, 380] — the table-format feature that
  // keeps selective scans O(matching files) at 100 TB (Delta stats /
  // Iceberg lower_bounds posture). Hash-gated against DuckDB running
  // the same filter over the raw documents table: skipping must be
  // invisible in the answer. The in-gate require is the canary — if
  // stats collection or the evaluator silently stopped pruning, the
  // gate fails loudly instead of degrading to a full scan.
  def pipelineVersionedSkip(s: SparkSession, d: String): DataFrame = {
    // read-only over the shared 3-append range template (the same
    // layout the delete/update gates clone); the pruning canary runs
    // per rep — it is the gate's subject
    val vt = graft.sources.VersionedTable
    val root = rangeLayoutTemplate(s, d).resolve("tbl").toString
    val cond = col("doc_id").between(320, 380) && col("n_chars") >= 0
    val pred = vt.read(s, root).filter(cond)
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }.get
    val (_, prunedN, coveredN) = vt.prunedPaths(s, root, pred)
    require(coveredN >= 6 && prunedN >= 4,
      s"file skipping regressed: pruned $prunedN of $coveredN covered " +
        "files for a range hitting one append of three")
    vt.readWhere(s, root, cond)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
      .localCheckpoint(true)
  }

  // metadata-only COUNT(*): the manifest's per-file row counts sum to
  // the snapshot count without touching storage (rowCount — the
  // arithmetic VersionedCountRule folds into plans). Hash-gated
  // against DuckDB counting the same rows, with an in-gate canary
  // requiring the metadata count to equal a real scan's.
  def pipelineVersionedCount(s: SparkSession, d: String): DataFrame = {
    // read-only over a build-once 3-append fixture: the gate's subject
    // (metadata count == scan count) re-asserts per rep
    val vt = graft.sources.VersionedTable
    val root = LifecycleFixtures(s, d, "vcountfx") { tmpRoot =>
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
      val r = tmpRoot.resolve("tbl").toString
      vt.init(s, r, base.filter(col("doc_id") < 150))
      vt.append(s, r,
        base.filter(col("doc_id") >= 150 && col("doc_id") < 300),
        expectedVersion = 0)
      vt.append(s, r,
        base.filter(col("doc_id") >= 300 && col("doc_id") < 450),
        expectedVersion = 1)
      r
    }
    val n = vt.rowCount(s, root).getOrElse(
      sys.error("manifest stats incomplete — metadata count unavailable"))
    require(n == vt.read(s, root).count(),
      s"metadata count $n diverged from the scan")
    import s.implicits._
    Seq(n).toDF("n_rows")
  }

  // row-level copy-on-write DELETE end to end: three range-clustered
  // appends give the commit dirs disjoint doc_id envelopes, the
  // delete predicate lands inside ONE of them, and the in-gate canary
  // requires the other two dirs to survive BY IDENTITY in the new
  // manifest — the stats-pruned rewrite (O(affected files), never
  // O(table)) that makes targeted deletes viable at 100 TB. Hash-
  // gated against DuckDB's NOT-predicate spelling of the survivor
  // set: pruning must be answer-invisible.
  def pipelineVersionedDelete(s: SparkSession, d: String): DataFrame = {
    // the 3-append fixture CLONES per rep (the DML mutates it): the
    // timed body is copy + the stats-pruned DELETE + canary + read —
    // the operator, not three commits of scaffolding
    val tmpRoot = LifecycleFixtures.cloneDir(
      rangeLayoutTemplate(s, d), "vdel")
    val root = tmpRoot.resolve("tbl").toString
    try {
      val vt = graft.sources.VersionedTable
      val before = vt.dataDirs(s, root, Some(2)).toSet
      val v = vt.delete(s, root, col("doc_id").between(180, 260))
      val after = vt.dataDirs(s, root, Some(v)).toSet
      require((before intersect after).size == 2,
        "delete rewrote dirs its predicate cannot touch — " +
          "manifest-stats dir pruning regressed")
      vt.read(s, root)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // row-level copy-on-write UPDATE over the same layout: assignments
  // apply only where the predicate is TRUE, evaluate against the
  // PRE-update row, and the untouched dirs carry by identity (same
  // canary as delete). Hash-gated against DuckDB's CASE WHEN
  // spelling.
  def pipelineVersionedUpdate(s: SparkSession, d: String): DataFrame = {
    // per-rep clone of the shared 3-append layout (see delete)
    val tmpRoot = LifecycleFixtures.cloneDir(
      rangeLayoutTemplate(s, d), "vupd")
    val root = tmpRoot.resolve("tbl").toString
    try {
      val vt = graft.sources.VersionedTable
      val before = vt.dataDirs(s, root, Some(2)).toSet
      val v = vt.update(s, root, col("doc_id").between(320, 400),
        Seq("source" -> lit("redacted"),
          "n_chars" -> (col("n_chars") + 1000L)))
      val after = vt.dataDirs(s, root, Some(v)).toSet
      require((before intersect after).size == 2,
        "update rewrote dirs its predicate cannot touch — " +
          "manifest-stats dir pruning regressed")
      vt.read(s, root)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // the SAME delete driven entirely through spark.sql via the graft
  // TableCatalog: CREATE TABLE + INSERT INTO (atomic append) +
  // DELETE FROM WHERE (stats-pruned copy-on-write) + SELECT — the SQL
  // lifecycle a warehouse user runs, hash-gated by the same DuckDB
  // oracle as the programmatic path (two spellings, one truth). A
  // fresh catalog name per invocation because CatalogManager caches
  // catalog instances by name and each run gets a fresh warehouse.
  // the STATISTICS LAYER itself, oracle-gated: two INSERTs give the
  // table two stats-bearing dirs, ANALYZE pins NDV sketches, and the
  // $stats metadata table's (min, max, null_count, ndv) rows must
  // hash-match DuckDB computing the same aggregates from the same
  // parquet. The NDV column participates in the hash because the
  // generated cardinalities stay below the HLL coupon-mode capacity
  // (~512): the sketch is EXACT there, so the estimate IS the answer.
  def pipelineVersionedStats(s: SparkSession, d: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_vstats")
    val cat = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpRoot.toString)
      docs(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .createOrReplaceTempView("vstats_docs")
      s.sql(s"CREATE TABLE $cat.d (doc_id BIGINT, lang STRING, " +
        "n_chars BIGINT)")
      s.sql(s"INSERT INTO $cat.d SELECT * FROM vstats_docs " +
        "WHERE doc_id < 150")
      s.sql(s"INSERT INTO $cat.d SELECT * FROM vstats_docs " +
        "WHERE doc_id >= 150")
      s.sql(s"ANALYZE TABLE $cat.d COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql(s"SELECT `column` AS col_name, min, max, null_count, ndv " +
        s"FROM $cat.`d$$stats` ORDER BY col_name")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  def pipelineVersionedSql(s: SparkSession, d: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_vsql")
    val cat = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpRoot.toString)
      docs(s, d).filter(col("doc_id") < 450)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
        .createOrReplaceTempView("vsql_docs")
      s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, lang STRING, " +
        "source STRING, n_chars BIGINT, text STRING)")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsql_docs")
      s.sql(s"DELETE FROM $cat.docs WHERE doc_id BETWEEN 180 AND 260")
      s.sql(s"SELECT doc_id, lang, source, n_chars, " +
        s"md5(text) AS text_md5 FROM $cat.docs ORDER BY doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // STORAGE-PARTITIONED JOIN, end to end: two catalog tables created
  // `PARTITIONED BY (bucket(8, custkey))`, populated through plain
  // INSERT (the bucketing write path lays every file out by
  // pmod(murmur3(custkey,42),8)), then joined on the bucket key with
  // broadcast disabled — the in-gate canary requires the executed plan
  // to contain a SortMergeJoin and ZERO shuffle exchanges: the join
  // cost Spark would normally pay (the dominant cost of a fact-fact
  // join at 100 TB) is eliminated because the layout PROVES
  // co-partitioning (KeyGroupedPartitioning through the catalog's
  // FunctionCatalog). Hash-gated by the layout-oblivious DuckDB join —
  // the shuffle is removable, the answer is not negotiable.
  // the two bucketed tables are a FIXTURE, built once per
  // (application, dir) like q30's bucketed tables (Io.ensureBucketed)
  // and the ANN indexes: a bench repetition of this gate times the
  // JOIN, not ~2 s of CREATE+INSERT per run — the offline-build /
  // online-serve split that is the architecture's whole point. The
  // fixture dir lives until JVM exit (same lifetime as the session
  // catalog conf that references it).
  private val spjFixture =
    scala.collection.concurrent.TrieMap[String, (String, String)]()
  def pipelineVersionedSpjJoin(s: SparkSession, d: String): DataFrame = {
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (cat, wh) = spjFixture.getOrElseUpdate(
        s.sparkContext.applicationId + "|" + d, {
          val tmpRoot = tempDirCleanedAtExit("graft_spj")
          val c = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
          s.conf.set(s"spark.sql.catalog.$c",
            classOf[graft.sources.GraftCatalog].getName)
          s.conf.set(s"spark.sql.catalog.$c.warehouse", tmpRoot.toString)
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
            .createOrReplaceTempView("spj_orders")
          Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))
            .createOrReplaceTempView("spj_cust")
          s.sql(s"CREATE TABLE $c.ord (o_orderkey BIGINT, o_custkey " +
            "BIGINT, o_totalprice DOUBLE) PARTITIONED BY (bucket(8, o_custkey))")
          s.sql(s"CREATE TABLE $c.cust (c_custkey BIGINT, c_mktsegment " +
            "STRING) PARTITIONED BY (bucket(8, c_custkey))")
          s.sql(s"INSERT INTO $c.ord SELECT * FROM spj_orders")
          s.sql(s"INSERT INTO $c.cust SELECT * FROM spj_cust")
          (c, tmpRoot.toString)
        })
      // the catalog registration is SESSION conf, the cache is
      // application-wide: a second session hitting the cache must
      // (re-)register the name in ITS conf or the SQL below fails
      // with CATALOG_NOT_FOUND (idempotent for the building session)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      val joined = s.sql(
        s"SELECT o.o_orderkey AS orderkey, o.o_totalprice AS totalprice, " +
          s"c.c_mktsegment AS mktsegment FROM $cat.ord o " +
          s"JOIN $cat.cust c ON o.o_custkey = c.c_custkey " +
          "WHERE o.o_totalprice > 400000")
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin"),
        s"SPJ gate: expected a sort-merge join, got\n$plan")
      require(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("BroadcastExchange"),
        s"SPJ gate: the co-bucketed join still shuffles\n$plan")
      // deterministic gate order WITHOUT an ORDER BY inside the
      // canaried plan (a global sort would add its own range exchange)
      val sorted = rows.sortBy(_.getLong(0))
      s.createDataFrame(java.util.Arrays.asList(sorted: _*), joined.schema)
    } finally
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
  }

  // QUANTILE-DRIVEN SKEW-ADVISED JOIN, end to end: a versioned table
  // is loaded with a PLANTED 90%-one-key join column, quantile stats
  // are pinned (one O(delta) sketch at commit), and SkewAdvisor sizes
  // the salt from the MEASURED modal mass — the in-gate canary
  // requires a statistics-chosen salt > 1 on the kll-mass basis, so
  // the salt provably came from the stats plane, not a hand pick. The
  // salted join's answer is hash-gated by the layout-oblivious DuckDB
  // join: salting is a physical placement choice (reference op 7's
  // mixing-shuffle insight), the answer is not negotiable. The table
  // is a per-(application, dir) fixture so bench reps time the
  // advised JOIN, not table setup.
  // the fixture caches (tableRoot, measured hotShare) — NOT the salt:
  // the salt is width-dependent and sessions within one application
  // may run different shuffle widths, so each call re-sizes it from
  // the cached measurement at ITS session's width
  private val skewFixture =
    scala.collection.concurrent.TrieMap[String, (String, Double)]()
  private def tempDirCleanedAtExit(prefix: String): java.nio.file.Path = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile): Unit))
    tmp
  }
  private def skewFixtureFor(s: SparkSession, d: String): (String, Int) = {
    val (root, hotShare) = skewFixture.getOrElseUpdate(
      s.sparkContext.applicationId + "|" + d, {
        val tmp = tempDirCleanedAtExit("graft_skew")
        val r = new java.io.File(tmp.toFile, "t").getAbsolutePath
        val big = events(s, d).select(
          when(col("event_id") % 10 =!= 0, lit(0L))
            .otherwise(col("event_id") % 96 + 1).as("k"),
          col("event_id"), col("value"))
        graft.sources.VersionedTable.init(s, r, big)
        graft.sources.VersionedTable.enableQuantileStats(s, r, Seq("k"))
        val advice = SkewAdvisor.advise(s, r, "k", 32)
        require(advice.basis == "kll-mass",
          s"skew gate: expected measured-mass advice, got $advice")
        require(math.abs(advice.hotShare - 0.9) < 0.05,
          s"skew gate: planted 90% hot share misread as $advice")
        (r, advice.hotShare)
      })
    val width = s.conf.get("spark.sql.shuffle.partitions").toInt
    val salt = SkewAdvisor.saltFor(hotShare, width)
    // canary: at any width > 1 the measured 0.9 mass must yield a
    // real salt; width 1 correctly advises 1 (nothing to spread over)
    require(width == 1 || salt > 1,
      s"skew gate: 0.9 mass at width $width must salt, got $salt")
    (root, salt)
  }
  def pipelineSkewAdvisedJoin(s: SparkSession, d: String): DataFrame = {
    val (root, salt) = skewFixtureFor(s, d)
    // broadcast off (restored in finally), or the 97-row dim side
    // broadcasts and the salted SHUFFLE join this gate times never
    // engages a shuffle at all — mirror pipelineVersionedSpjJoin:
    // materialize inside the conf window so planning sees it
    val oldBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = s.range(0, 97).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("attr"))
      val joined = Skew
        .saltedJoin(graft.sources.VersionedTable.read(s, root), dim,
          Seq("k"), salts = salt)
        .groupBy("k", "attr")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_value"))
        .orderBy("k", "attr")
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastExchange"),
        s"skew gate: the dim side still broadcasts\n$plan")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), joined.schema)
    } finally
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
  }

  // the AGGREGATION twin: the SAME statistics-chosen salt drives
  // saltedAgg's two-phase decomposition over the planted-skew table —
  // phase 1 groups by (k, salt), spreading the hot key across ~salt
  // reducers, phase 2 re-merges |keys|·salt partial rows. Answer
  // hash-gated by the plain GROUP BY oracle: the decomposition is a
  // physical choice, the aggregate is exact.
  def pipelineSkewAdvisedAgg(s: SparkSession, d: String): DataFrame = {
    val (root, salt) = skewFixtureFor(s, d)
    Skew.saltedAgg(graft.sources.VersionedTable.read(s, root),
        Seq("k"), salts = salt, seed = 7L,
        Skew.CountAll("cnt"), Skew.SumDec("value", "sum_value"))
      .select(col("k"), col("cnt"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy("k")
  }

  // the programmatic UPDATE's predicate driven through SQL UPDATE with
  // GROUP-FILTER PRUNING live: three INSERTs give the commit dirs
  // disjoint doc_id envelopes, the statement condition is pushed into
  // the row-level operation's scan, manifest stats prune the two dirs
  // it provably cannot touch, and the in-gate canary requires them to
  // survive BY IDENTITY — SQL UPDATE at O(affected files), the
  // round-12 verdict's #1 item. Hash-gated by the SAME oracle as
  // pipeline_versioned_update (one truth, two spellings).
  def pipelineVersionedSqlUpdatePruned(s: SparkSession, d: String)
      : DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_vsqlu")
    val cat = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpRoot.toString)
      docs(s, d).filter(col("doc_id") < 450)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
        .createOrReplaceTempView("vsqlu_docs")
      s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, lang STRING, " +
        "source STRING, n_chars BIGINT, text STRING)")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsqlu_docs " +
        "WHERE doc_id < 150")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsqlu_docs " +
        "WHERE doc_id >= 150 AND doc_id < 300")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsqlu_docs " +
        "WHERE doc_id >= 300")
      val root = tmpRoot.resolve("docs").toString
      val vt = graft.sources.VersionedTable
      val before = vt.dataDirs(s, root).toSet
      s.sql(s"UPDATE $cat.docs SET source = 'redacted', " +
        "n_chars = n_chars + 1000 WHERE doc_id BETWEEN 320 AND 400")
      val after = vt.dataDirs(s, root).toSet
      // init dir + two out-of-range INSERT dirs carry by identity;
      // only the [300,450) dir is rewritten
      require((before intersect after).size == 3,
        "SQL UPDATE rewrote dirs its predicate cannot touch — " +
          "row-level group-filter pruning regressed")
      s.sql(s"SELECT doc_id, lang, source, n_chars, " +
        s"md5(text) AS text_md5 FROM $cat.docs ORDER BY doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // the planted merge changeset driven through SQL MERGE INTO — the
  // row-level-operation seam end to end (Spark's own MergeRows plan
  // computes the post-merge snapshot, the engine's parquet writer
  // materializes it, publishDir is the atomic commit point) — hash-
  // gated by the SAME oracle as the programmatic pipeline_versioned
  // _merge: one truth, three spellings (applyChangeset, the
  // versioned-table merge, and SQL MERGE).
  def pipelineVersionedSqlMerge(s: SparkSession, d: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_vsqlm")
    val cat = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpRoot.toString)
      docs(s, d).select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("text"))
        .createOrReplaceTempView("vsqlm_docs")
      s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, lang STRING, " +
        "source STRING, n_chars BIGINT, text STRING)")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsqlm_docs")
      s.sql(
        s"""MERGE INTO $cat.docs t
           |USING (
           |  SELECT doc_id, lang, 'patched' AS source, n_chars, text,
           |    'U' AS op FROM vsqlm_docs WHERE doc_id % 7 = 1
           |  UNION ALL
           |  SELECT doc_id, lang, source, n_chars, text, 'D'
           |  FROM vsqlm_docs WHERE doc_id % 7 = 0
           |  UNION ALL
           |  SELECT doc_id + 1000000, lang, 'ingested', n_chars, text, 'U'
           |  FROM vsqlm_docs WHERE doc_id % 7 = 2
           |) c
           |ON t.doc_id = c.doc_id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET t.lang = c.lang,
           |  t.source = c.source, t.n_chars = c.n_chars, t.text = c.text
           |WHEN NOT MATCHED AND c.op = 'U' THEN
           |  INSERT (doc_id, lang, source, n_chars, text)
           |  VALUES (c.doc_id, c.lang, c.source, c.n_chars, c.text)
           |""".stripMargin)
      s.sql(s"SELECT doc_id, lang, source, n_chars, " +
        s"md5(text) AS text_md5 FROM $cat.docs ORDER BY doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // SQL MERGE with RUNTIME group pruning live: the changeset's keys
  // land in ONE of three range-disjoint commit dirs, but the ON
  // condition references the source, so no static analysis can prune
  // — Spark's row-level runtime group filter computes the matched
  // dirs with a subquery against the _commit_dir metadata column and
  // the write replaces exactly those (the in-gate canary requires the
  // other dirs to survive BY IDENTITY). Hash-gated by a DuckDB oracle
  // applying the same range-restricted changeset.
  def pipelineVersionedSqlMergePruned(s: SparkSession, d: String)
      : DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_vsqlmp")
    val cat = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpRoot.toString)
      // this gate DEMONSTRATES runtime pruning — force it on past the
      // size guard (a 450-row table is far below the few-GB crossover
      // where the pruning subquery pays for itself)
      s.conf.set(graft.sources.GraftCatalog.MergeRuntimeFilterMinRows, "0")
      docs(s, d).filter(col("doc_id") < 450)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
        .createOrReplaceTempView("vsqlmp_docs")
      s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, lang STRING, " +
        "source STRING, n_chars BIGINT, text STRING)")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsqlmp_docs " +
        "WHERE doc_id < 150")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsqlmp_docs " +
        "WHERE doc_id >= 150 AND doc_id < 300")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM vsqlmp_docs " +
        "WHERE doc_id >= 300")
      val root = tmpRoot.resolve("docs").toString
      val vt = graft.sources.VersionedTable
      val before = vt.dataDirs(s, root).toSet
      s.sql(
        s"""MERGE INTO $cat.docs t
           |USING (
           |  SELECT doc_id, lang, 'patched' AS source, n_chars, text,
           |    'U' AS op FROM vsqlmp_docs
           |  WHERE doc_id % 7 = 1 AND doc_id >= 300
           |  UNION ALL
           |  SELECT doc_id, lang, source, n_chars, text, 'D'
           |  FROM vsqlmp_docs WHERE doc_id % 7 = 0 AND doc_id >= 300
           |) c
           |ON t.doc_id = c.doc_id
           |WHEN MATCHED AND c.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET t.lang = c.lang,
           |  t.source = c.source, t.n_chars = c.n_chars, t.text = c.text
           |""".stripMargin)
      val after = vt.dataDirs(s, root).toSet
      // init dir + the two dirs below doc_id 300 carry by identity;
      // only the [300,450) dir is rewritten
      require((before intersect after).size == 3,
        "SQL MERGE rewrote dirs its changeset cannot touch — runtime " +
          "group filtering regressed")
      s.sql(s"SELECT doc_id, lang, source, n_chars, " +
        s"md5(text) AS text_md5 FROM $cat.docs ORDER BY doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // RESTORE closes the loop: a bad delete rolled forward to the
  // pre-mistake snapshot, METADATA-ONLY (the in-gate canary requires
  // the data-dir census unchanged across the restore — zero files
  // moved). Hash-gated against the full pre-delete row set.
  def pipelineVersionedRestore(s: SparkSession, d: String): DataFrame = {
    // (init + mistaken delete) builds once; restore mutates, so each
    // rep clones — the timed body is the metadata-only RESTORE, its
    // canaries, and the read-back
    val tmpRoot = LifecycleFixtures.cloneDir(
      LifecycleFixtures.template(s, d, "vrstfx") { p =>
        val base = docs(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))
        val r = p.resolve("tbl").toString
        graft.sources.VersionedTable.init(s, r,
          base.filter(col("doc_id") < 450)
            .repartitionByRange(3, col("doc_id")))
        graft.sources.VersionedTable.delete(s, r,
          col("doc_id").between(100, 300)) // the mistake
      }, "vrst")
    val root = tmpRoot.resolve("tbl").toString
    try {
      val vt = graft.sources.VersionedTable
      val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
      val fs = dataRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
      val dirsBefore = fs.listStatus(dataRoot).length
      val v = vt.restore(s, root, 0)
      require(fs.listStatus(dataRoot).length == dirsBefore,
        "restore wrote data — it must be metadata-only")
      require(vt.commitOp(s, root, v).contains("restore"),
        "restore op marker missing from history")
      vt.read(s, root)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // the trainer-handoff export loop end to end: pack, write shard
  // dirs, commit the manifest, read the manifest back — hash-gated
  // against DuckDB recomputing the same per-shard totals from the raw
  // documents (token counts via the text_pack oracle spelling)
  def pipelineShards(s: SparkSession, d: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_shards")
    val out = tmpRoot.resolve("export").toString
    try
      graft.pipeline.TrainingExport.writeShards(
        docs(s, d).select(col("doc_id"), col("text")),
        out, budget = 256, shards = 8)
        .localCheckpoint(true)
    finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // per-language PERCENT_RANK without the per-group window funnel —
  // the prefix-sum machinery's per-row member, hash-gated against
  // DuckDB's native window spelling (one truth, two physical plans)
  def statsPctrankByLang(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Normalize.percentileRankByGroup(
      docs(s, d).select(col("lang"), col("doc_id"), col("n_chars")),
      "lang", "n_chars")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("pct_rank"))
      .orderBy("doc_id")

  // per-language distribution drift between the even/odd doc halves
  // (a deterministic A/B split): TVD in exact integer arithmetic
  // (Profile.distributionDrift) — the corpus-shape monitor
  def statsDriftByLang(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    graft.pipeline.Profile.distributionDrift(
      all.filter(col("doc_id") % 2 === 0),
      all.filter(col("doc_id") % 2 === 1),
      "lang", "n_chars", buckets = 10)
      .orderBy("lang")
  }

  // snapshot diff: the upsert changeset's before/after as a
  // per-language governance report (added/removed/changed/unchanged)
  // — the release-notes view of the same merge the upsert rows gate
  def pipelineDiff(s: SparkSession, d: String): DataFrame = {
    val snap = docs(s, d)
    val after = snap.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 7 =!= 1)
      .unionByName(snap.filter(col("doc_id") % 7 === 1)
        .withColumn("text", concat(col("text"), lit(" [patched]"))))
      .unionByName(snap.filter(col("doc_id") % 7 === 2)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    graft.pipeline.Profile.snapshotDiff(snap, after, "doc_id",
        fpCol = "text", groupCol = "lang")
      .orderBy("lang", "status")
  }

  // one-scan multi-column profile: completeness, exact cardinality,
  // min/max per column (Profile.profile) — the trust audit a corpus
  // gets before anyone trains on it
  def pipelineProfile(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Profile.profile(docs(s, d),
        Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy("col_name")

  // rule-based constraint audit (Profile.validate): four row rules +
  // doc_id uniqueness, reported as violation counts per rule
  def pipelineValidate(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Profile.validate(docs(s, d),
        Seq(
          "doc_id_nonnegative" -> (col("doc_id") >= 0),
          "lang_in_universe" ->
            col("lang").isin("de", "en", "es", "fr", "zh"),
          "n_chars_matches_text" -> (col("n_chars") === length(col("text"))),
          "text_nonblank" -> (length(trim(col("text"))) > 0)),
        uniqueCols = Seq("doc_id"))
      .orderBy("rule")

  // INCREMENTALLY MAINTAINED MATERIALIZED VIEW, end to end: the view
  // aggregates (lang, source) → count/sum/avg of a versioned base and
  // is refreshed through two appends and a row-level DELETE — each
  // refresh folds ONLY the change feed (in-gate canaries: the append
  // refreshes must detect the O(delta) fast path; the post-delete one
  // must not). The final view is hash-gated by DuckDB recomputing the
  // same GROUP BY over the final state from scratch: incremental
  // maintenance is a physical choice, the aggregate is not negotiable.
  // Decimal-summed in both engines (the MV's exactness contract).
  // Round-20 re-basing: the refresh LIFECYCLE (init, create, two
  // appends, a row-level DELETE, three per-regime refreshes, every
  // canary) builds ONCE per session via LifecycleFixtures; the
  // per-call body serves the maintained view plus the up-to-date
  // refresh fast path. Bench rows therefore measure REFRESH/SERVE
  // cost, not fixture construction (not comparable to r19 raw
  // values — BASELINE notes the re-basing); the fold's own cost is
  // ScaleBench's mv_refresh decade row.
  def pipelineVersionedMv(s: SparkSession, d: String): DataFrame = {
    val mvOps = graft.sources.MaterializedView
    val mv = LifecycleFixtures(s, d, "mv") { tmpRoot =>
      val vt = graft.sources.VersionedTable
      val root = tmpRoot.resolve("base").toString
      val mvp = tmpRoot.resolve("mv").toString
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      vt.init(s, root, base.filter(col("doc_id") < 300))
      mvOps.create(s, mvp, root, Seq("lang", "source"),
        Seq(mvOps.MvCount("cnt"), mvOps.MvSum("n_chars", "sum_chars"),
          mvOps.MvAvg("n_chars", "avg_chars")))
      vt.append(s, root,
        base.filter(col("doc_id") >= 300 && col("doc_id") < 450), 0)
      val r1 = mvOps.refresh(s, mvp)
      require(r1.refreshed && r1.appendOnly,
        s"mv gate: append refresh missed the O(delta) regime: $r1")
      vt.delete(s, root, col("doc_id") % 7 === 0)
      val r2 = mvOps.refresh(s, mvp)
      require(r2.refreshed && !r2.appendOnly,
        s"mv gate: delete refresh misread as append-only: $r2")
      vt.append(s, root,
        base.filter(col("doc_id") >= 450 && col("doc_id") < 500),
        vt.latestVersion(s, root))
      val r3 = mvOps.refresh(s, mvp)
      require(r3.refreshed && r3.appendOnly,
        s"mv gate: append refresh missed the O(delta) regime: $r3")
      require(mvOps.watermark(s, mvp) == vt.latestVersion(s, root),
        "mv gate: watermark must track the base head")
      mvp
    }
    // serving: an up-to-date refresh must take the no-pending fast
    // path (watermark == head, zero fold work) — the canary that the
    // fixture really is at head AND that serving stays cheap
    require(!mvOps.refresh(s, mv).refreshed,
      "mv gate: up-to-date refresh must no-op")
    mvOps.read(s, mv).orderBy("lang", "source").localCheckpoint(true)
  }

  // the INSERT-ONLY aggregate family (MIN/MAX/HLL-distinct) folding an
  // append-only history — exactly the regime where those accumulators
  // are maintainable; the sketch is exact below its coupon capacity at
  // this scale, so even the approximate column hash-matches DuckDB's
  // COUNT(DISTINCT). The in-gate canary requires the O(delta) regime.
  def pipelineVersionedMvAppend(s: SparkSession, d: String): DataFrame = {
    val mvOps = graft.sources.MaterializedView
    val mv = LifecycleFixtures(s, d, "mva") { tmpRoot =>
      val vt = graft.sources.VersionedTable
      val root = tmpRoot.resolve("base").toString
      val mvp = tmpRoot.resolve("mv").toString
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .filter(col("doc_id") < 500)
      vt.init(s, root, base.filter(col("doc_id") < 250))
      mvOps.create(s, mvp, root, Seq("lang"),
        Seq(mvOps.MvCount("cnt"), mvOps.MvMin("n_chars", "min_chars"),
          mvOps.MvMax("n_chars", "max_chars"),
          mvOps.MvHllCount("doc_id", "nd_docs")))
      vt.append(s, root, base.filter(col("doc_id") >= 250), 0)
      val r = mvOps.refresh(s, mvp)
      require(r.refreshed && r.appendOnly,
        s"mv append gate: expected the O(delta) regime, got $r")
      mvp
    }
    require(!mvOps.refresh(s, mv).refreshed,
      "mv append gate: up-to-date refresh must no-op")
    mvOps.read(s, mv).orderBy("lang").localCheckpoint(true)
  }

  // the SAME materialized-view lifecycle driven ENTIRELY through
  // spark.sql — CREATE TABLE / INSERT / CREATE MATERIALIZED VIEW /
  // REFRESH / SELECT — the warehouse spelling over the one
  // programmatic truth, hash-gated by DuckDB recomputing the final
  // aggregate. The refresh report's append_only canary rides in-gate.
  def pipelineVersionedMvSql(s: SparkSession, d: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_mvsql")
    val cat = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
    try {
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpRoot.toString)
      docs(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
        .filter(col("doc_id") < 500)
        .createOrReplaceTempView("mvsql_docs")
      s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, lang STRING, " +
        "n_chars BIGINT)")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM mvsql_docs " +
        "WHERE doc_id < 250")
      s.sql(s"CREATE MATERIALIZED VIEW $cat.mv AS " +
        s"SELECT lang, count(*) AS cnt, sum(n_chars) AS sum_chars, " +
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars, " +
        s"approx_count_distinct(doc_id) AS nd_docs FROM $cat.docs " +
        "GROUP BY lang")
      s.sql(s"INSERT INTO $cat.docs SELECT * FROM mvsql_docs " +
        "WHERE doc_id >= 250")
      val r = s.sql(s"REFRESH MATERIALIZED VIEW $cat.mv").head()
      require(r.getBoolean(3) && r.getBoolean(4),
        s"mv sql gate: expected (refreshed, append_only), got $r")
      s.sql(s"SELECT lang, cnt, sum_chars, min_chars, max_chars, " +
        s"nd_docs FROM $cat.mv ORDER BY lang").localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // a WHERE-FILTERED materialized view folded through appends AND a
  // row-level delete: σ_where commutes with the signed fold, so the
  // filtered view must hash-match DuckDB recomputing the filtered
  // GROUP BY over the final state from scratch.
  def pipelineVersionedMvWhere(s: SparkSession, d: String): DataFrame = {
    val mvOps = graft.sources.MaterializedView
    val mv = LifecycleFixtures(s, d, "mvw") { tmpRoot =>
      val vt = graft.sources.VersionedTable
      val root = tmpRoot.resolve("base").toString
      val mvp = tmpRoot.resolve("mv").toString
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .filter(col("doc_id") < 500)
      vt.init(s, root, base.filter(col("doc_id") < 250))
      mvOps.create(s, mvp, root, Seq("lang"),
        Seq(mvOps.MvCount("cnt"), mvOps.MvSum("n_chars", "sum_chars"),
          mvOps.MvAvg("n_chars", "avg_chars")),
        where = Some("n_chars >= 300"))
      vt.append(s, root, base.filter(col("doc_id") >= 250), 0)
      require(mvOps.refresh(s, mvp).appendOnly,
        "mv where gate: append refresh must ride the O(delta) path")
      vt.delete(s, root, col("doc_id") % 5 === 0)
      val r = mvOps.refresh(s, mvp)
      require(r.refreshed && !r.appendOnly,
        s"mv where gate: delete refresh misread: $r")
      mvp
    }
    require(!mvOps.refresh(s, mv).refreshed,
      "mv where gate: up-to-date refresh must no-op")
    mvOps.read(s, mv).orderBy("lang").localCheckpoint(true)
  }

  // the STREAMING FOLLOW of a materialized view: the same signed-fold
  // truth, but driven by a Structured Streaming query over the base's
  // versioned stream (Streams.followMaterializedView) instead of
  // explicit refresh calls — appends and a row-level DELETE land as
  // stream triggers, each drained micro-batch folds the CDF, and the
  // final followed view is hash-gated by DuckDB recomputing the GROUP
  // BY over the final state from scratch. In-gate canary: the
  // watermark must have tracked the base to its head THROUGH the
  // stream (no explicit refresh is ever called here).
  def pipelineVersionedMvFollow(s: SparkSession, d: String): DataFrame = {
    val mvOps = graft.sources.MaterializedView
    val vt = graft.sources.VersionedTable
    val mv = LifecycleFixtures(s, d, "mvf") { tmpRoot =>
      val root = tmpRoot.resolve("base").toString
      val mvp = tmpRoot.resolve("mv").toString
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .filter(col("doc_id") < 500)
      vt.init(s, root, base.filter(col("doc_id") < 250))
      mvOps.create(s, mvp, root, Seq("lang"),
        Seq(mvOps.MvCount("cnt"), mvOps.MvSum("n_chars", "sum_chars"),
          mvOps.MvAvg("n_chars", "avg_chars")))
      val q = graft.streaming.Streams.followMaterializedView(s, mvp,
        Some(tmpRoot.resolve("ck").toString))
      try {
        vt.append(s, root,
          base.filter(col("doc_id") >= 250 && col("doc_id") < 400), 0)
        q.processAllAvailable()
        // a rewrite AND an append may share one trigger — the fold
        // spans the whole range either way
        vt.delete(s, root, col("doc_id") % 7 === 0)
        vt.append(s, root, base.filter(col("doc_id") >= 400),
          vt.latestVersion(s, root))
        q.processAllAvailable()
      } finally q.stop()
      require(mvOps.watermark(s, mvp) == vt.latestVersion(s, root),
        "mv follow gate: the stream must have folded to the base head")
      mvp
    }
    // the stream already folded to head in the fixture; serving is
    // the maintained view read (stream start/stop cost is the
    // fixture's — the per-epoch fold premium is ScaleBench's row)
    require(!mvOps.refresh(s, mv).refreshed,
      "mv follow gate: the followed view must already be at head")
    mvOps.read(s, mv).orderBy("lang").localCheckpoint(true)
  }

  // MV ROLLUP: one maintained (lang, source) view serves the COARSER
  // lang-level aggregate from its accumulators — O(view groups),
  // never a base scan, and EXACT (folded decimal sums divided by
  // folded counts, not an average of averages). Hash-gated by DuckDB
  // recomputing GROUP BY lang over the final base state from
  // scratch: the rollup must be indistinguishable from aggregating
  // the base directly.
  def pipelineVersionedMvRollup(s: SparkSession, d: String): DataFrame = {
    val mvOps = graft.sources.MaterializedView
    val vt = graft.sources.VersionedTable
    // lifecycle (init -> create -> append -> O(delta) refresh, canary
    // included) builds once; the per-rep body times the ROLLUP serve —
    // the round-20 re-basing discipline (the refresh fold stays
    // measured by ScaleBench's mv_refresh decade row)
    val mv = LifecycleFixtures(s, d, "mvrollfx") { tmpRoot =>
      val root = tmpRoot.resolve("base").toString
      val m = tmpRoot.resolve("mv").toString
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .filter(col("doc_id") < 500)
      vt.init(s, root, base.filter(col("doc_id") < 250))
      mvOps.create(s, m, root, Seq("lang", "source"),
        Seq(mvOps.MvCount("cnt"), mvOps.MvSum("n_chars", "sum_chars"),
          mvOps.MvAvg("n_chars", "avg_chars")))
      vt.append(s, root, base.filter(col("doc_id") >= 250), 0)
      require(mvOps.refresh(s, m).appendOnly,
        "mv rollup gate: the append must ride the O(delta) path")
      m
    }
    mvOps.rollup(s, mv, Seq("lang"))
      .orderBy("lang").localCheckpoint(true)
  }

  // BLOOM FILE SKIPPING, end to end: the base pins blooms on a
  // content-hash column whose per-file envelopes overlap completely
  // (random hex — min/max pruning provably gets NOTHING, asserted
  // in-gate), then a point lookup on a provably-unique hash must
  // prune most files via the sidecar filters and still answer
  // exactly what DuckDB computes scanning everything. Skipping is a
  // physical choice; the lookup row is not negotiable.
  def pipelineVersionedBloomSkip(s: SparkSession, d: String): DataFrame = {
    val vt = graft.sources.VersionedTable
    // build-once fixture (3 commits + the bloom pin commit + the
    // deterministic unique-hash probe); the per-rep body re-asserts
    // the WHOLE contrast read-only — the pre-bloom envelope probe
    // time-travels to the pre-pin version (pruneCounts takes a
    // version), the bloom probe reads the pinned head, and the lookup
    // serves through readWhere
    val (root, probe) = graft.ops.LifecycleFixturesKV(s, d, "vbloomfx") {
      tmpRoot =>
        val r = tmpRoot.resolve("t").toString
        val base = docs(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            md5(col("text")).as("fp"))
          .filter(col("doc_id") < 500)
        vt.init(s, r, base.filter(col("doc_id") < 200).repartition(2))
        vt.append(s, r,
          base.filter(col("doc_id") >= 200 && col("doc_id") < 350)
            .repartition(2), 0)
        vt.append(s, r,
          base.filter(col("doc_id") >= 350).repartition(2), 1)
        vt.enableBloomFilters(s, r, Seq("fp"))
        // the lowest-id doc whose text hash is UNIQUE in the corpus —
        // deterministic, and it lives in exactly one file
        val p = base.groupBy("fp")
          .agg(count(lit(1)).as("c"), min(col("doc_id")).as("m"))
          .filter(col("c") === 1).orderBy("m").limit(1)
          .head.getString(0)
        (r, p)
    }
    val (envPruned, covered) =
      vt.pruneCounts(s, root, col("fp") === probe, Some(2)).get
    // hex envelopes are near-powerless here (each file spans ~the
    // whole domain); a boundary probe can still luck past a file or
    // two at some SFs, so the canary is the GAP, not a zero
    require(covered == 6 && envPruned <= 2,
      s"random-hex envelopes should prune ~nothing ($envPruned/$covered)")
    val (bloomPruned, _) =
      vt.pruneCounts(s, root, col("fp") === probe).get
    require(bloomPruned >= 4 && bloomPruned > envPruned,
      s"bloom must out-prune envelopes ($bloomPruned vs $envPruned of 6)")
    vt.readWhere(s, root, col("fp") === probe)
      .orderBy("doc_id").localCheckpoint(true)
  }

  // FILE-GRANULAR DML carry end-to-end: ONE 8-file range-clustered
  // commit (envelopes isolate a range predicate to a file subset),
  // then a range delete — the affected dir SPLITS: clean files carry
  // as in-place manifest file references (`dir/file.parquet`
  // entries, zero bytes copied) and only the may-match files
  // rewrite. In-gate canaries pin the split shape (most files carried
  // as refs, exactly one fresh rewrite dir); the RESULT is hash-gated
  // against DuckDB computing the delete's complement — the carry
  // must be answer-invisible.
  def pipelineVersionedFileCarry(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
    // the 8-file range-clustered commit builds once; the DML mutates,
    // so each rep clones it — the timed body is the splitting DELETE
    // plus its carry canaries and the read-back
    val tmpRoot = LifecycleFixtures.cloneDir(
      LifecycleFixtures.template(s, d, "vfc8fx") { p =>
        graft.sources.VersionedTable.init(s, p.resolve("tbl").toString,
          base.repartitionByRange(8, col("doc_id")))
      }, "vfc")
    val root = tmpRoot.resolve("tbl").toString
    try {
      val vt = graft.sources.VersionedTable
      val thr = base.agg(max(col("doc_id"))).head.getLong(0) / 8L
      val v = vt.delete(s, root, col("doc_id") <= thr)
      val refs = vt.dataDirs(s, root, Some(v))
        .map(p => p.substring(p.indexOf("/data/") + 6))
      require(refs.count(_.contains('/')) >= 5,
        s"the 8-file dir should split with most files carried in " +
          s"place as file refs, got $refs")
      require(refs.count(!_.contains('/')) == 1,
        s"exactly one fresh rewrite dir expected, got $refs")
      vt.read(s, root)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  // REF-FRAGMENTATION ADVISOR end-to-end: a point delete on a
  // 24-file range-clustered commit splits it (~23 carried refs —
  // past the advisor's 16-ref floor, and the refs plus their carried
  // #file: lines dominate the manifest), the advisor recommends the
  // fold, compactRefs heals it at O(fragmented refs), and the
  // advisor goes quiet. In-gate canaries pin the advisor lifecycle
  // (recommend → fold → quiet) and the measured fold cost; the
  // RESULT is hash-gated against DuckDB computing the delete's
  // complement — advice and fold must both be answer-invisible.
  def pipelineVersionedRefsAdvisor(s: SparkSession, d: String)
      : DataFrame = {
    val vt = graft.sources.VersionedTable
    val root = LifecycleFixtures(s, d, "refadv") { tmpRoot =>
      val base = docs(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text"))
      val r = tmpRoot.resolve("tbl").toString
      vt.init(s, r, base.repartitionByRange(24, col("doc_id")))
      val quiet0 = graft.ops.RefAdvisor.advise(s, r)
      require(!quiet0.recommend && quiet0.frag.fileRefs == 0,
        s"fresh table must not recommend a fold: $quiet0")
      val probe = base.agg(min(col("doc_id"))).head.getLong(0) + 7L
      vt.delete(s, r, col("doc_id") === probe)
      val hot = graft.ops.RefAdvisor.advise(s, r)
      require(hot.recommend &&
        hot.frag.fileRefs >= graft.ops.RefAdvisor.DefaultMinRefs &&
        hot.overheadShare >= graft.ops.RefAdvisor.DefaultShareThreshold,
        s"the split history must trip both advisor guards: $hot")
      require(hot.frag.foldRows.exists(_ > 0L),
        s"fold cost must be measured from the carried stats: $hot")
      vt.compactRefs(s, r)
      val healed = graft.ops.RefAdvisor.advise(s, r)
      require(!healed.recommend && healed.frag.fileRefs == 0,
        s"the fold must silence the advisor: $healed")
      r
    }
    // serving over the healed table; the advisor audit per call is
    // the cheap O(manifest) read a dashboard poll would pay
    require(!graft.ops.RefAdvisor.advise(s, root).recommend,
      "healed fixture must keep the advisor quiet")
    vt.read(s, root)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
      .localCheckpoint(true)
  }

  // `_commit_version` LINEAGE end-to-end: three INSERT commits land
  // three doc_id classes, then ONE query joins per-row provenance
  // against the $history audit plane with no string surgery — the
  // lineage report (which commit wrote how many rows/chars, under
  // which operation) is hash-gated against DuckDB recomputing the
  // class → version mapping from the raw table. The in-gate canary
  // pins the driver-side dir pruning a version predicate gets.
  def pipelineVersionedLineage(s: SparkSession, d: String): DataFrame = {
    // LifecycleFixtures (the round-20 re-basing, same as the MV and
    // stream-sink rows): the three-INSERT lifecycle and its
    // one-commit-slice canary build once per session; the per-call
    // body re-registers the catalog confs (session conf over an
    // application-wide cache, the ssink precedent) and serves the
    // lineage join the gate exists to measure
    val (cat, wh) = graft.ops.LifecycleFixturesKV(s, d, "vlin") { tmpRoot =>
      val c = "g" + java.util.UUID.randomUUID.toString.replace("-", "")
      s.conf.set(s"spark.sql.catalog.$c",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$c.warehouse", tmpRoot.toString)
      docs(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
        .createOrReplaceTempView("vlin_docs")
      s.sql(s"CREATE TABLE $c.docs (doc_id BIGINT, lang STRING, " +
        "n_chars BIGINT)")                                           // v0
      (0 to 2).foreach(k => s.sql(
        s"INSERT INTO $c.docs SELECT * FROM vlin_docs " +
          s"WHERE doc_id % 3 = $k"))                                 // v1..v3
      // provenance reads behave like partition pruning: a version
      // predicate must answer from one commit's rows
      val one = s.sql("SELECT count(*) FROM " +
        s"$c.docs WHERE _commit_version = 2").head.getLong(0)
      val cls1 = docs(s, d).filter(col("doc_id") % 3 === 1).count()
      require(one == cls1,
        s"version-2 slice must be exactly class doc_id%3=1: $one/$cls1")
      (c, tmpRoot.toString)
    }
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(
      s"""SELECT t._commit_version AS commit_version, h.operation,
         |  count(*) AS n, sum(t.n_chars) AS sum_chars
         |FROM $cat.docs t
         |JOIN $cat.`docs$$history` h ON t._commit_version = h.version
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin)
      .localCheckpoint(true)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_versioned_lineage" -> pipelineVersionedLineage _,
    "pipeline_versioned_refs_advisor" -> pipelineVersionedRefsAdvisor _,
    "dedup_exact" -> dedupExact _,
    "dedup_sorted_neighborhood" -> dedupSortedNeighborhood _,
    "stats_corr_by_lang" -> statsCorrByLang _,
    "stats_robust_by_lang" -> statsRobustByLang _,
    "pipeline_upsert" -> pipelineUpsert _,
    "pipeline_versioned_merge" -> pipelineVersionedMerge _,
    "pipeline_versioned_changes" -> pipelineVersionedChanges _,
    "pipeline_versioned_changes_feed" -> pipelineVersionedChangesFeed _,
    "pipeline_versioned_changes_sql" -> pipelineVersionedChangesSql _,
    "pipeline_versioned_changes_keyed" -> pipelineVersionedChangesKeyed _,
    "pipeline_versioned_cdc_files" -> pipelineVersionedCdcFiles _,
    "pipeline_versioned_skip" -> pipelineVersionedSkip _,
    "pipeline_versioned_count" -> pipelineVersionedCount _,
    "pipeline_versioned_delete" -> pipelineVersionedDelete _,
    "pipeline_versioned_file_carry" -> pipelineVersionedFileCarry _,
    "pipeline_versioned_update" -> pipelineVersionedUpdate _,
    "pipeline_versioned_sql" -> pipelineVersionedSql _,
    "pipeline_versioned_stats" -> pipelineVersionedStats _,
    "pipeline_versioned_mv" -> pipelineVersionedMv _,
    "pipeline_versioned_mv_append" -> pipelineVersionedMvAppend _,
    "pipeline_versioned_mv_sql" -> pipelineVersionedMvSql _,
    "pipeline_versioned_mv_where" -> pipelineVersionedMvWhere _,
    "pipeline_versioned_mv_follow" -> pipelineVersionedMvFollow _,
    "pipeline_versioned_mv_rollup" -> pipelineVersionedMvRollup _,
    "pipeline_versioned_bloom_skip" -> pipelineVersionedBloomSkip _,
    "pipeline_versioned_spj_join" -> pipelineVersionedSpjJoin _,
    "pipeline_skew_advised_join" -> pipelineSkewAdvisedJoin _,
    "pipeline_skew_advised_agg" -> pipelineSkewAdvisedAgg _,
    "pipeline_versioned_sql_update_pruned" ->
      pipelineVersionedSqlUpdatePruned _,
    "pipeline_versioned_sql_merge" -> pipelineVersionedSqlMerge _,
    "pipeline_versioned_sql_merge_pruned" ->
      pipelineVersionedSqlMergePruned _,
    "pipeline_versioned_restore" -> pipelineVersionedRestore _,
    "pipeline_shards" -> pipelineShards _,
    "stats_histogram" -> statsHistogram _,
    "stats_histogram_eqdepth" -> statsHistogramEqdepth _,
    "stats_drift_by_lang" -> statsDriftByLang _,
    "stats_pctrank_by_lang" -> statsPctrankByLang _,
    "pipeline_profile" -> pipelineProfile _,
    "pipeline_diff" -> pipelineDiff _,
    "pipeline_validate" -> pipelineValidate _,
    "dedup_minhash" -> dedupMinhash _,
    "dedup_simhash" -> dedupSimhash _,
    "dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "dedup_minhash_verified" -> dedupMinhashVerified _,
    "dedup_prefix_jaccard" -> dedupPrefixJaccard _,
    "dedup_incremental" -> dedupIncremental _,
    "dedup_novel_keys" -> dedupNovelKeys _,
    "dedup_containment" -> dedupContainment _,
    "dedup_embedding" -> dedupEmbedding _,
    "dedup_semantic" -> dedupSemantic _,
    "dedup_semantic_verified" -> dedupSemanticVerified _,
    "emb_pca" -> embPca _,
    "emb_cluster_assign" -> embClusterAssign _,
    "dedup_clusters" -> dedupClusters _,
    "dedup_clusters_lsh" -> dedupClustersLsh _,
    "dedup_keep_best" -> dedupKeepBest _,
    "dedup_fuzzy" -> dedupFuzzy _,
    "sample_hash" -> sampleHash _,
    "sample_stratified" -> sampleStratified _,
    "sample_weighted" -> sampleWeighted _,
    "stats_zscore_by_lang" -> statsZscoreByLang _,
    "stats_winsorize_by_lang" -> statsWinsorizeByLang _,
    "pipeline_zorder" -> pipelineZorder _,
    "text_nfc" -> textNfc _,
    "pipeline_curate" -> pipelineCurate _,
    "pipeline_e2e" -> pipelineE2e _,
    "pipeline_ingest" -> pipelineIngest _,
    "sim_topk_brute" -> simTopkBrute _,
    "sim_topk_graph" -> simTopkGraph _,
    "sim_topk_graph_verified" -> simTopkGraphVerified _,
    "sim_topk_lsh" -> simTopkLsh _,
    "sim_topk_lsh_verified" -> simTopkLshVerified _,
    "sim_topk_ivf" -> simTopkIvf _,
    "sim_topk_ivf_verified" -> simTopkIvfVerified _,
    "sim_topk_pq" -> simTopkPq _,
    "sim_topk_pq_verified" -> simTopkPqVerified _,
    "sim_topk_ivfpq" -> simTopkIvfPq _,
    "sim_topk_ivfpq_verified" -> simTopkIvfPqVerified _,
    "sim_pq_drift" -> simPqDrift _,
    "text_tokens" -> textTokens _,
    "text_quality" -> textQuality _,
    "text_lm_score" -> textLmScore _,
    "text_langid" -> textLangid _,
    "text_fingerprint" -> textFingerprint _,
    "text_bigrams" -> textBigrams _,
    "text_winnow" -> textWinnow _,
    "text_cooccur" -> textCooccur _,
    "dedup_winnow" -> dedupWinnow _,
    "dedup_substring" -> dedupSubstring _,
    "dedup_substring_stats" -> dedupSubstringStats _,
    "text_search" -> textSearch _,
    "text_repetition" -> textRepetition _,
    "text_chunks" -> textChunks _,
    "text_boilerplate" -> textBoilerplate _,
    "text_pack" -> textPack _,
    "pipeline_mix" -> pipelineMix _,
    "pipeline_split_safe" -> pipelineSplitSafe _,
    "text_postings" -> textPostings _,
    "text_redact" -> textRedact _,
    "pipeline_domain_cap" -> pipelineDomainCap _,
    "decontam_overlap" -> decontamOverlap _,
    "decontam_winnow" -> decontamWinnow _,
    "text_vocab_oov" -> textVocabOov _,
    "multimodal_meta" -> multimodalMeta _,
    "multimodal_frames" -> multimodalFrames _,
    "multimodal_features" -> multimodalFeatures _,
    "multimodal_resize" -> multimodalResize _,
    "multimodal_phash" -> multimodalPhash _,
    "stats_cardinality" -> statsCardinality _,
    "stats_distinct_by_lang" -> statsDistinctByLang _,
    "stats_hll_by_lang" -> statsHllByLang _,
    "stats_heavy_hitters" -> statsHeavyHitters _,
    "stats_cms_topk" -> statsCmsTopk _,
    "stats_quantiles" -> statsQuantiles _,
    "stats_median" -> statsMedian _,
    "stats_quantiles_exact" -> statsQuantilesExact _,
  )

  /** Ground-truth components via DuckDB's recursive CTE — the WITH
    * body is shared by the exact-fed clustering, the LSH-fed
    * clustering, and the keep-best selection gate rows. */
  private val clustersCte: String =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
      |         FROM documents WHERE doc_id < 100 AND length(trim(text)) > 0),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
      |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= 0.8),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |walk(id, comp) AS (
      |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 100
      |  UNION
      |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
      |comp AS (SELECT id AS doc_id, MIN(comp) AS component FROM walk
      |         GROUP BY id)""".stripMargin

  // one all-pairs ground truth, shared by every exact J>=0.8 generator
  // on the doc_id<100 subset (brute force and prefix-filter)
  private val allPairsJaccardOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
      |  FROM documents WHERE doc_id < 100 AND length(trim(text)) > 0)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
      |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS j
      |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
      |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  private val clustersOracle: String =
    clustersCte +
      "\nSELECT doc_id, component FROM comp ORDER BY doc_id"

  override def oracle: Map[String, String] = Map(
    // in-window pairs under the total (n_chars, doc_id) order; rn is
    // 0-based on both sides, offsets 1..window-1
    "dedup_sorted_neighborhood" ->
      """WITH toks AS (
        |  SELECT doc_id, n_chars,
        |    list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
        |  FROM documents WHERE doc_id < 200 AND length(trim(text)) > 0),
        |r AS (SELECT doc_id, ts,
        |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS rn FROM toks),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, a.ts AS ta, b.ts AS tb
        |  FROM r a JOIN r b ON b.rn >= a.rn + 1 AND b.rn <= a.rn + 4)
        |SELECT LEAST(da, db) AS id_a, GREATEST(da, db) AS id_b,
        |  CAST(len(list_intersect(ta, tb)) AS DOUBLE) /
        |    (len(ta) + len(tb) - len(list_intersect(ta, tb))) AS j
        |FROM p
        |WHERE CAST(len(list_intersect(ta, tb)) AS DOUBLE) /
        |    (len(ta) + len(tb) - len(list_intersect(ta, tb))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // exact int64 sums, then the identical fixed double tree the Spark
    // side folds: every op correctly rounded on identical inputs
    "stats_corr_by_lang" ->
      """WITH t AS (
        |  SELECT lang, n_chars AS x,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |a AS (SELECT lang, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM t GROUP BY lang)
        |SELECT lang, n,
        |  CASE WHEN n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |    END AS r
        |FROM a ORDER BY lang""".stripMargin,
    // every changeset key evicts its snapshot row (anti join), then
    // upserts union back — identical construction on both engines
    "pipeline_upsert" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U')
        |SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM merged ORDER BY doc_id""".stripMargin,
    // the versioned-table merge must equal the relational merge —
    // same oracle construction as pipeline_upsert (the manifest
    // protocol is a LAYOUT, layouts never change results)
    "pipeline_versioned_merge" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U')
        |SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM merged ORDER BY doc_id""".stripMargin,
    // the same merge's change feed: multiset diff via EXCEPT ALL on
    // the md5-projected rows (injective per row), matching the
    // engine's signed-count content diff
    "pipeline_versioned_changes" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U'),
        |v0 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM documents),
        |v1 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM merged),
        |ins AS (SELECT *, 'insert' AS change_kind FROM
        |  (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v0)),
        |del AS (SELECT *, 'delete' AS change_kind FROM
        |  (SELECT * FROM v0 EXCEPT ALL SELECT * FROM v1))
        |SELECT * FROM ins UNION ALL SELECT * FROM del
        |ORDER BY doc_id, change_kind""".stripMargin,
    // the connector readChangeFeed spelling of the same single-version
    // feed: identical oracle (pruned of the _commit_version tag)
"pipeline_versioned_changes_feed" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U'),
        |v0 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM documents),
        |v1 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM merged),
        |ins AS (SELECT *, 'insert' AS change_kind FROM
        |  (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v0)),
        |del AS (SELECT *, 'delete' AS change_kind FROM
        |  (SELECT * FROM v0 EXCEPT ALL SELECT * FROM v1))
        |SELECT * FROM ins UNION ALL SELECT * FROM del
        |ORDER BY doc_id, change_kind""".stripMargin,
    // the SQL-TVF spelling of the same single-version feed (the
    // changeset lands via SQL MERGE this time — same merged state,
    // so the identical oracle gates all three spellings)
    "pipeline_versioned_changes_sql" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U'),
        |v0 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM documents),
        |v1 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM merged),
        |ins AS (SELECT *, 'insert' AS change_kind FROM
        |  (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v0)),
        |del AS (SELECT *, 'delete' AS change_kind FROM
        |  (SELECT * FROM v0 EXCEPT ALL SELECT * FROM v1))
        |SELECT * FROM ins UNION ALL SELECT * FROM del
        |ORDER BY doc_id, change_kind""".stripMargin,
    // the keyed feed: FULL OUTER JOIN on doc_id pairs pre/post images
    // (IS DISTINCT FROM = the engine's null-safe struct comparison);
    // md5 projection is the established per-row injection
    "pipeline_versioned_changes_keyed" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U'),
        |v0 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM documents),
        |v1 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM merged),
        |j AS (
        |  SELECT v0.doc_id AS f_id, v0.lang AS f_lang,
        |    v0.source AS f_source, v0.n_chars AS f_n, v0.text_md5 AS f_md5,
        |    v1.doc_id AS t_id, v1.lang AS t_lang,
        |    v1.source AS t_source, v1.n_chars AS t_n, v1.text_md5 AS t_md5
        |  FROM v0 FULL OUTER JOIN v1 ON v0.doc_id = v1.doc_id),
        |upd AS (
        |  SELECT * FROM j WHERE f_id IS NOT NULL AND t_id IS NOT NULL
        |    AND (f_lang IS DISTINCT FROM t_lang
        |      OR f_source IS DISTINCT FROM t_source
        |      OR f_n IS DISTINCT FROM t_n
        |      OR f_md5 IS DISTINCT FROM t_md5))
        |SELECT t_id AS doc_id, t_lang AS lang, t_source AS source,
        |  t_n AS n_chars, t_md5 AS text_md5, 'insert' AS change_kind
        |FROM j WHERE f_id IS NULL
        |UNION ALL
        |SELECT f_id, f_lang, f_source, f_n, f_md5, 'delete'
        |FROM j WHERE t_id IS NULL
        |UNION ALL
        |SELECT f_id, f_lang, f_source, f_n, f_md5, 'update_preimage' FROM upd
        |UNION ALL
        |SELECT t_id, t_lang, t_source, t_n, t_md5, 'update_postimage' FROM upd
        |ORDER BY doc_id, change_kind""".stripMargin,
    // the change-file-served keyed feed must be row-identical to the
    // on-demand join diff — same oracle as
    // pipeline_versioned_changes_keyed (one vocabulary, two regimes)
    "pipeline_versioned_cdc_files" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U'),
        |v0 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM documents),
        |v1 AS (SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |  FROM merged),
        |j AS (
        |  SELECT v0.doc_id AS f_id, v0.lang AS f_lang,
        |    v0.source AS f_source, v0.n_chars AS f_n, v0.text_md5 AS f_md5,
        |    v1.doc_id AS t_id, v1.lang AS t_lang,
        |    v1.source AS t_source, v1.n_chars AS t_n, v1.text_md5 AS t_md5
        |  FROM v0 FULL OUTER JOIN v1 ON v0.doc_id = v1.doc_id),
        |upd AS (
        |  SELECT * FROM j WHERE f_id IS NOT NULL AND t_id IS NOT NULL
        |    AND (f_lang IS DISTINCT FROM t_lang
        |      OR f_source IS DISTINCT FROM t_source
        |      OR f_n IS DISTINCT FROM t_n
        |      OR f_md5 IS DISTINCT FROM t_md5))
        |SELECT t_id AS doc_id, t_lang AS lang, t_source AS source,
        |  t_n AS n_chars, t_md5 AS text_md5, 'insert' AS change_kind
        |FROM j WHERE f_id IS NULL
        |UNION ALL
        |SELECT f_id, f_lang, f_source, f_n, f_md5, 'delete'
        |FROM j WHERE t_id IS NULL
        |UNION ALL
        |SELECT f_id, f_lang, f_source, f_n, f_md5, 'update_preimage' FROM upd
        |UNION ALL
        |SELECT t_id, t_lang, t_source, t_n, t_md5, 'update_postimage' FROM upd
        |ORDER BY doc_id, change_kind""".stripMargin,
    // file skipping must be answer-invisible: the pruned scan equals
    // the plain filter over the raw table (doc_id < 450 = the rows
    // the three appends committed)
    "pipeline_versioned_skip" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents
        |WHERE doc_id BETWEEN 320 AND 380 AND n_chars >= 0 AND doc_id < 450
        |ORDER BY doc_id""".stripMargin,
    // metadata COUNT(*) == the engine-independent row count
    "pipeline_versioned_count" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM documents WHERE doc_id < 450""".stripMargin,
    // copy-on-write DELETE must equal the plain NOT-predicate filter
    // (doc_id < 450 = the rows the three appends committed)
    "pipeline_versioned_delete" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents
        |WHERE doc_id < 450 AND NOT (doc_id BETWEEN 180 AND 260)
        |ORDER BY doc_id""".stripMargin,
    // per-row provenance joined against the audit plane: version
    // 1+k committed class doc_id%3=k, every commit an append —
    // DuckDB recomputes the mapping from the raw table
    "pipeline_versioned_lineage" ->
      """SELECT 1 + (doc_id % 3) AS commit_version,
        |  'append' AS operation, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // the advisor lifecycle (recommend → fold → quiet) is
    // answer-invisible: the oracle is the point delete's complement,
    // the probe spelled exactly as the Spark side computes it
    "pipeline_versioned_refs_advisor" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents
        |WHERE doc_id <> (SELECT min(doc_id) + 7 FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // the file-carry split is answer-invisible: the oracle is the
    // delete's complement, threshold spelled with the same integer
    // floor division (`//`) the Spark side computes
    "pipeline_versioned_file_carry" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents
        |WHERE doc_id > (SELECT max(doc_id) // 8 FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // the SQL-catalog spelling of the same delete: one oracle, two
    // engine paths (programmatic and spark.sql-through-TableCatalog)
    "pipeline_versioned_sql" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents
        |WHERE doc_id < 450 AND NOT (doc_id BETWEEN 180 AND 260)
        |ORDER BY doc_id""".stripMargin,
    // the storage-partitioned join is answer-invisible: the oracle is
    // the plain layout-oblivious join — only the Spark plan (canaried
    // in-gate) knows the shuffle was removed
    "pipeline_versioned_spj_join" ->
      """SELECT o.o_orderkey AS orderkey, o.o_totalprice AS totalprice,
        |  c.c_mktsegment AS mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_totalprice > 400000
        |ORDER BY orderkey""".stripMargin,
    // the skew-ADVISED salted join is answer-invisible too: the
    // oracle is the plain unsalted join+agg — only the in-gate canary
    // knows the salt was chosen from the measured key distribution
    "pipeline_skew_advised_join" ->
      """WITH big AS (
        |  SELECT CASE WHEN event_id % 10 <> 0 THEN 0
        |              ELSE event_id % 96 + 1 END AS k, value
        |  FROM events),
        |dim AS (SELECT range AS k,
        |               'd' || CAST(range AS VARCHAR) AS attr
        |        FROM range(0, 97))
        |SELECT b.k AS k, d.attr AS attr,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(b.value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_value
        |FROM big b JOIN dim d ON b.k = d.k
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // the agg twin: same planted key, plain GROUP BY oracle — the
    // two-phase salted decomposition is answer-invisible
    "pipeline_skew_advised_agg" ->
      """WITH big AS (
        |  SELECT CASE WHEN event_id % 10 <> 0 THEN 0
        |              ELSE event_id % 96 + 1 END AS k, value
        |  FROM events)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_value
        |FROM big
        |GROUP BY k
        |ORDER BY k""".stripMargin,
    // SQL UPDATE with group-filter pruning must equal the programmatic
    // update's CASE WHEN oracle — pruning is answer-invisible
    "pipeline_versioned_sql_update_pruned" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id BETWEEN 320 AND 400
        |    THEN 'redacted' ELSE source END AS source,
        |  CASE WHEN doc_id BETWEEN 320 AND 400
        |    THEN n_chars + 1000 ELSE n_chars END AS n_chars,
        |  md5(text) AS text_md5
        |FROM documents WHERE doc_id < 450
        |ORDER BY doc_id""".stripMargin,
    // the incrementally maintained view vs DuckDB recomputing the
    // final aggregate from scratch; final state = three appends minus
    // the %7 delete that ran BEFORE the last append. Decimal sums
    // mirror the MV's exactness contract; avg divides exact doubles.
    "pipeline_versioned_mv" ->
      """SELECT lang, source,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS BIGINT)
        |    AS sum_chars,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) /
        |    CAST(COUNT(n_chars) AS DOUBLE) AS avg_chars
        |FROM documents
        |WHERE (doc_id < 450 AND doc_id % 7 <> 0)
        |   OR (doc_id >= 450 AND doc_id < 500)
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // insert-only MV family vs DuckDB recomputing from scratch; the
    // HLL column is exact below coupon capacity at gate scale, so it
    // hash-matches COUNT(DISTINCT)
    "pipeline_versioned_mv_append" ->
      """SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd_docs
        |FROM documents WHERE doc_id < 500
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // the SQL MV lifecycle vs DuckDB recomputing from scratch — same
    // exactness reasoning as the programmatic twin
    "pipeline_versioned_mv_sql" ->
      """SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS BIGINT)
        |    AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd_docs
        |FROM documents WHERE doc_id < 500
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // the WHERE-filtered view vs DuckDB recomputing the filtered
    // aggregate over the final state (appends minus the %5 delete)
    "pipeline_versioned_mv_where" ->
      """SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS BIGINT)
        |    AS sum_chars,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) /
        |    CAST(COUNT(n_chars) AS DOUBLE) AS avg_chars
        |FROM documents
        |WHERE doc_id < 500 AND doc_id % 5 <> 0 AND n_chars >= 300
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // the STREAMED follow vs DuckDB recomputing from scratch: final
    // state = appends to 400 minus the %7 delete that ran BEFORE the
    // last append (rows >= 400 never saw the delete), all folded
    // through stream triggers rather than explicit refresh calls
    "pipeline_versioned_mv_follow" ->
      """SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS BIGINT)
        |    AS sum_chars,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) /
        |    CAST(COUNT(n_chars) AS DOUBLE) AS avg_chars
        |FROM documents
        |WHERE (doc_id < 400 AND doc_id % 7 <> 0)
        |   OR (doc_id >= 400 AND doc_id < 500)
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // the accumulator ROLLUP vs DuckDB aggregating the base directly
    // at the coarser key — exactness includes the avg (folded sums /
    // folded counts, never an average of the per-(lang,source) avgs)
    "pipeline_versioned_mv_rollup" ->
      """SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS BIGINT)
        |    AS sum_chars,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) /
        |    CAST(COUNT(n_chars) AS DOUBLE) AS avg_chars
        |FROM documents WHERE doc_id < 500
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // bloom-skipped point lookup vs DuckDB scanning everything: the
    // probe is the lowest-id doc whose text hash is unique, computed
    // identically on both sides
    "pipeline_versioned_bloom_skip" ->
      """WITH f AS (
        |  SELECT md5(text) AS fp, COUNT(*) AS c, MIN(doc_id) AS m
        |  FROM documents WHERE doc_id < 500 GROUP BY 1),
        |probe AS (SELECT fp FROM f WHERE c = 1 ORDER BY m LIMIT 1)
        |SELECT d.doc_id, d.lang, d.n_chars, md5(d.text) AS fp
        |FROM documents d, probe p
        |WHERE d.doc_id < 500 AND md5(d.text) = p.fp
        |ORDER BY d.doc_id""".stripMargin,
    // the $stats metadata table vs DuckDB recomputing the same
    // aggregates — NDV included: below HLL coupon capacity the sketch
    // is exact, so even the estimate hash-matches COUNT(DISTINCT)
    "pipeline_versioned_stats" ->
      """WITH d AS (SELECT doc_id, lang, n_chars FROM documents
        |           WHERE doc_id < 300)
        |SELECT * FROM (
        |  SELECT 'doc_id' AS col_name,
        |    CAST(MIN(doc_id) AS VARCHAR) AS min,
        |    CAST(MAX(doc_id) AS VARCHAR) AS max,
        |    CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS null_count,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndv FROM d
        |  UNION ALL
        |  SELECT 'lang', MIN(lang), MAX(lang),
        |    CAST(COUNT(*) - COUNT(lang) AS BIGINT),
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) FROM d
        |  UNION ALL
        |  SELECT 'n_chars', CAST(MIN(n_chars) AS VARCHAR),
        |    CAST(MAX(n_chars) AS VARCHAR),
        |    CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
        |    CAST(COUNT(DISTINCT n_chars) AS BIGINT) FROM d)
        |ORDER BY col_name""".stripMargin,
    // SQL MERGE INTO must equal the programmatic merge — identical
    // oracle construction to pipeline_versioned_merge (one truth,
    // three engine spellings)
    "pipeline_versioned_sql_merge" ->
      """WITH cs AS (
        |  SELECT doc_id, text, lang, 'patched' AS source, n_chars,
        |    'U' AS op FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars, 'D'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'ingested', n_chars, 'U'
        |  FROM documents WHERE doc_id % 7 = 2),
        |kept AS (
        |  SELECT s.* FROM documents s LEFT JOIN cs ON s.doc_id = cs.doc_id
        |  WHERE cs.doc_id IS NULL),
        |merged AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT doc_id, text, lang, source, n_chars FROM cs WHERE op = 'U')
        |SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM merged ORDER BY doc_id""".stripMargin,
    // SQL MERGE under runtime group pruning: the same merge semantics
    // with the changeset restricted to the [300,450) dir's keys —
    // pruning must be answer-invisible
    "pipeline_versioned_sql_merge_pruned" ->
      """WITH cs AS (
        |  SELECT doc_id, 'U' AS op FROM documents
        |  WHERE doc_id % 7 = 1 AND doc_id >= 300 AND doc_id < 450
        |  UNION ALL
        |  SELECT doc_id, 'D' FROM documents
        |  WHERE doc_id % 7 = 0 AND doc_id >= 300 AND doc_id < 450)
        |SELECT d.doc_id, d.lang,
        |  CASE WHEN cs.op = 'U' THEN 'patched' ELSE d.source END AS source,
        |  d.n_chars, md5(d.text) AS text_md5
        |FROM documents d LEFT JOIN cs ON d.doc_id = cs.doc_id
        |WHERE d.doc_id < 450 AND (cs.op IS NULL OR cs.op <> 'D')
        |ORDER BY d.doc_id""".stripMargin,
    // restore to v0 must read back the ENTIRE pre-delete snapshot
    "pipeline_versioned_restore" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents WHERE doc_id < 450
        |ORDER BY doc_id""".stripMargin,
    // copy-on-write UPDATE must equal the CASE WHEN projection
    "pipeline_versioned_update" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id BETWEEN 320 AND 400
        |    THEN 'redacted' ELSE source END AS source,
        |  CASE WHEN doc_id BETWEEN 320 AND 400
        |    THEN n_chars + 1000 ELSE n_chars END AS n_chars,
        |  md5(text) AS text_md5
        |FROM documents WHERE doc_id < 450
        |ORDER BY doc_id""".stripMargin,
    // median/MAD both quantile_disc (rank ⌈q·n⌉ == exactQuantiles);
    // the one float op is the final division on both sides
    "stats_robust_by_lang" ->
      """WITH med AS (
        |  SELECT lang, quantile_disc(n_chars, 0.5) AS med
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY lang),
        |mad AS (
        |  SELECT d.lang, quantile_disc(abs(d.n_chars - m.med), 0.5) AS mad
        |  FROM documents d JOIN med m USING (lang)
        |  WHERE d.n_chars IS NOT NULL GROUP BY d.lang)
        |SELECT d.lang, d.doc_id, d.n_chars,
        |  CASE WHEN d.n_chars IS NOT NULL AND mad.mad > 0
        |    THEN CAST(d.n_chars - med.med AS DOUBLE) /
        |      CAST(mad.mad AS DOUBLE)
        |  END AS robust_z
        |FROM documents d
        |LEFT JOIN med USING (lang) LEFT JOIN mad USING (lang)
        |ORDER BY doc_id""".stripMargin,
    "stats_pctrank_by_lang" ->
      """SELECT doc_id, lang, n_chars,
        |  PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars)
        |    AS pct_rank
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the numerator is an order-independent integer sum; DuckDB's
    // SUM(BIGINT) window is HUGEINT, so totals cast back to BIGINT
    "stats_drift_by_lang" ->
      """WITH u AS (
        |  SELECT lang, n_chars, doc_id % 2 AS side FROM documents
        |  WHERE n_chars IS NOT NULL),
        |b AS (
        |  SELECT CAST(MIN(n_chars) AS BIGINT) AS lo,
        |    CAST(MAX(n_chars) AS BIGINT) AS hi FROM u),
        |counted AS (
        |  SELECT lang,
        |    LEAST(9, ((n_chars - lo) * 10) // (hi - lo + 1)) AS bucket,
        |    COUNT(CASE WHEN side = 0 THEN 1 END) AS ca,
        |    COUNT(CASE WHEN side = 1 THEN 1 END) AS cb
        |  FROM u, b GROUP BY 1, 2),
        |tot AS (
        |  SELECT lang, ca, cb,
        |    CAST(SUM(ca) OVER (PARTITION BY lang) AS BIGINT) AS ta,
        |    CAST(SUM(cb) OVER (PARTITION BY lang) AS BIGINT) AS tb
        |  FROM counted)
        |SELECT lang, MAX(ta) AS n_a, MAX(tb) AS n_b,
        |  CASE WHEN MAX(ta) > 0 AND MAX(tb) > 0 THEN
        |    CAST(SUM(abs(ca * tb - cb * ta)) AS DOUBLE) /
        |      CAST(2 * MAX(ta) * MAX(tb) AS DOUBLE)
        |  END AS tvd
        |FROM tot GROUP BY lang ORDER BY lang""".stripMargin,
    // boundaries = per-group quartiles (quantile_disc list form);
    // bucket(v) = first boundary covering v — identical tie behavior
    // to the Spark side's |{b < v}| + 1 on the sorted boundary array
    "stats_histogram_eqdepth" ->
      """WITH bl AS (
        |  SELECT lang, quantile_disc(n_chars, [0.25, 0.5, 0.75, 1.0]) AS bs
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY lang),
        |bounds AS (
        |  SELECT lang, unnest(bs) AS b,
        |    CAST(generate_subscripts(bs, 1) AS BIGINT) AS i
        |  FROM bl),
        |assign AS (
        |  SELECT d.doc_id, d.lang, MIN(bounds.i) AS bucket
        |  FROM documents d JOIN bounds ON d.lang = bounds.lang
        |    AND d.n_chars <= bounds.b
        |  WHERE d.n_chars IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT lang, bucket, COUNT(*) AS cnt
        |FROM assign GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // integer-exact bucketing: b = least(9, ((v-lo)*10) // (hi-lo+1))
    "stats_histogram" ->
      """WITH b AS (
        |  SELECT CAST(MIN(n_chars) AS BIGINT) AS lo,
        |    CAST(MAX(n_chars) AS BIGINT) AS hi
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang,
        |  LEAST(9, ((n_chars - lo) * 10) // (hi - lo + 1)) AS bucket,
        |  COUNT(*) AS cnt,
        |  CAST(MIN(n_chars) AS BIGINT) AS bucket_min,
        |  CAST(MAX(n_chars) AS BIGINT) AS bucket_max
        |FROM documents, b WHERE n_chars IS NOT NULL
        |GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    "pipeline_profile" ->
      """SELECT 'doc_id' AS col_name, COUNT(doc_id) AS n_values,
        |  COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS n_nulls,
        |  COUNT(DISTINCT doc_id) AS n_distinct,
        |  CAST(MIN(doc_id) AS VARCHAR) AS min_val,
        |  CAST(MAX(doc_id) AS VARCHAR) AS max_val FROM documents
        |UNION ALL
        |SELECT 'lang', COUNT(lang), COUNT(CASE WHEN lang IS NULL THEN 1 END),
        |  COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR),
        |  CAST(MAX(lang) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(source), COUNT(CASE WHEN source IS NULL THEN 1 END),
        |  COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR),
        |  CAST(MAX(source) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'n_chars', COUNT(n_chars), COUNT(CASE WHEN n_chars IS NULL THEN 1 END),
        |  COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR),
        |  CAST(MAX(n_chars) AS VARCHAR) FROM documents
        |ORDER BY col_name""".stripMargin,
    // NULL predicate counts as a violation on both sides (NOT COALESCE)
    "pipeline_validate" ->
      """WITH r AS (SELECT COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN NOT COALESCE(doc_id >= 0, FALSE) THEN 1 END) AS v0,
        |  COUNT(CASE WHEN NOT COALESCE(lang IN ('de','en','es','fr','zh'), FALSE) THEN 1 END) AS v1,
        |  COUNT(CASE WHEN NOT COALESCE(n_chars = length(text), FALSE) THEN 1 END) AS v2,
        |  COUNT(CASE WHEN NOT COALESCE(length(trim(text)) > 0, FALSE) THEN 1 END) AS v3
        |  FROM documents)
        |SELECT 'doc_id_nonnegative' AS rule, n_rows, v0 AS n_violations FROM r
        |UNION ALL SELECT 'lang_in_universe', n_rows, v1 FROM r
        |UNION ALL SELECT 'n_chars_matches_text', n_rows, v2 FROM r
        |UNION ALL SELECT 'text_nonblank', n_rows, v3 FROM r
        |UNION ALL SELECT 'doc_id_unique', COUNT(*),
        |  COUNT(*) - COUNT(DISTINCT doc_id) FROM documents
        |ORDER BY rule""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_key,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS dups
        |FROM documents GROUP BY 1 ORDER BY keep_id, content_key""".stripMargin,
    "dedup_ngram_jaccard" -> allPairsJaccardOracle,
    // the prefix-filter path is exact by construction (recall 1, no
    // probabilistic argument needed): same subset, same threshold,
    // SAME oracle text as the brute-force generator
    "dedup_prefix_jaccard" -> allPairsJaccardOracle,
    // the LSH pipeline at recall-1 banding + exact verify equals the
    // exact all-pairs Jaccard set on the bounded subset (see the Spark
    // side's miss-probability argument; DedupSpec's boundary test
    // asserts the r=2 equality on planted threshold-boundary pairs)
    "dedup_minhash_verified" ->
      """WITH toks AS (
        |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
        |  FROM documents WHERE doc_id < 100 AND length(trim(text)) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS j
        |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,
    // the incremental batch vs the all-pairs truth: id_a < id_b makes
    // "at least one side new" equivalent to id_b >= 100
    "dedup_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
        |  FROM documents WHERE doc_id < 150 AND length(trim(text)) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS j
        |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        |WHERE b.doc_id >= 100
        |  AND CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,
    // same before/after construction; status via FULL OUTER JOIN with
    // IS NOT DISTINCT FROM as the null-safe fingerprint compare
    "pipeline_diff" ->
      """WITH after AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE doc_id % 7 NOT IN (0, 1)
        |  UNION ALL
        |  SELECT doc_id, text || ' [patched]', lang FROM documents
        |  WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang FROM documents
        |  WHERE doc_id % 7 = 2),
        |j AS (
        |  SELECT COALESCE(n.lang, o.lang) AS lang,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM documents o FULL OUTER JOIN after n ON o.doc_id = n.doc_id)
        |SELECT lang, status, COUNT(*) AS n FROM j
        |GROUP BY lang, status ORDER BY lang, status""".stripMargin,
    // the Bloom prune must be invisible: the oracle is the PLAIN anti
    // join of day-3 distinct keys against everything earlier
    "dedup_novel_keys" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03 00:00:00'
        |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-04 00:00:00'),
        |c AS (
        |  SELECT user_id, event_type FROM events
        |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00')
        |SELECT user_id, event_type FROM b ANTI JOIN c
        |  USING (user_id, event_type)
        |ORDER BY user_id, event_type""".stripMargin,
    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
        |  FROM documents WHERE doc_id < 100 AND length(trim(text)) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts) AS containment
        |FROM toks a JOIN toks b ON a.doc_id <> b.doc_id
        |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_clusters" -> clustersOracle,
    // the LSH-fed composition verifies against the SAME ground truth:
    // its exact-Jaccard verify at recall ~1 banding reproduces the
    // exact pair set (see dedupClustersLsh), hence the same components
    "dedup_clusters_lsh" -> clustersOracle,
    // canonical-doc selection on the same components: rn=1 over
    // (n_chars DESC, doc_id) == max_by's lexicographic (n_chars, -id)
    "dedup_keep_best" -> (clustersCte +
      """
        |, j AS (SELECT c.component, d.doc_id, d.n_chars
        |        FROM comp c JOIN documents d USING (doc_id)),
        |r AS (SELECT component, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY component) AS n_docs
        |  FROM j)
        |SELECT component, doc_id AS keep_id, n_chars AS best_chars, n_docs
        |FROM r WHERE rn = 1 ORDER BY component""".stripMargin),
    // leakage-safe split: same recursive-CTE components, then the
    // identical int64 Lehmer-threshold CASE over the component label
    "pipeline_split_safe" -> (clustersCte +
      s"""
        |SELECT doc_id, component,
        |  CASE WHEN (component % ${Sampling.P}) * ${Sampling.A}
        |         % ${Sampling.P} * ${Sampling.A} % ${Sampling.P}
        |         < ${Sampling.thresholdFor(800)} THEN 'train'
        |       WHEN (component % ${Sampling.P}) * ${Sampling.A}
        |         % ${Sampling.P} * ${Sampling.A} % ${Sampling.P}
        |         < ${Sampling.thresholdFor(900)} THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM comp ORDER BY doc_id""".stripMargin),
    // stats_cms_topk is rows-only by design (sketch estimates are
    // engine-specific); this exact row pins the top-k the sketch
    // approximates
    "stats_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents)
        |SELECT tok, COUNT(*) AS cnt FROM t WHERE length(tok) > 0
        |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,
    "stats_distinct_by_lang" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT text) AS distinct_texts,
        |  COUNT(DISTINCT source) AS distinct_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "pipeline_domain_cap" ->
      """SELECT doc_id, source, n_chars, rn FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rn
        |  FROM documents) WHERE rn <= 10
        |ORDER BY source, rn""".stripMargin,
    // RE2-compatible patterns run verbatim in both engines; DuckDB's
    // regexp_replace needs the 'g' flag to match Java's replace-all
    "text_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(length(regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS BIGINT) AS clean_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_postings" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |dt AS (SELECT doc_id, term, COUNT(*) AS n FROM t GROUP BY 1, 2)
        |SELECT term, COUNT(*) AS df, CAST(SUM(n) AS BIGINT) AS tf
        |FROM dt GROUP BY term
        |ORDER BY df DESC, tf DESC, term LIMIT 50""".stripMargin,
    "stats_median" ->
      """SELECT CAST(median(n_chars) AS DOUBLE) AS exact_median_chars,
        |  COUNT(*) AS n_docs FROM documents""".stripMargin,
    // quantile_disc picks rank ⌈q·n⌉ ascending — the exact rank
    // semantics exactQuantiles implements (probed: n=4 q=.5 → rank 2,
    // n=5 q=.9 → rank 5, n=10 q=.1 → rank 1)
    // COUNT(n_chars), not COUNT(*): quantile_disc ignores NULLs and the
    // Spark side filters them before ranking — both engines count the
    // ranked population
    "stats_quantiles_exact" ->
      """SELECT lang, CAST(0.1 AS DOUBLE) AS q,
        |  quantile_disc(n_chars, 0.1) AS value, COUNT(n_chars) AS n
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT lang, CAST(0.5 AS DOUBLE), quantile_disc(n_chars, 0.5), COUNT(n_chars)
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT lang, CAST(0.9 AS DOUBLE), quantile_disc(n_chars, 0.9), COUNT(n_chars)
        |FROM documents GROUP BY lang
        |ORDER BY lang, q""".stripMargin,
    // every slice substr(payload, i*fs+1, fs) with fs = len//4 is
    // exactly fs bytes (4*fs <= len; fs=0 -> empty slice), so the
    // byte-count twin is pure integer arithmetic — DuckDB's substring
    // does not take BLOBs, and it doesn't need to
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(octet_length(CAST(text AS BLOB)) // 4 AS INTEGER) AS fs
        |  FROM documents)
        |SELECT doc_id, CAST(unnest(range(4)) AS INTEGER) AS frame_idx,
        |  fs AS frame_bytes
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    "dedup_fuzzy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 40) AS s
        |  FROM documents WHERE doc_id < 200)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 12
        |ORDER BY id_a, id_b""".stripMargin,
    "sample_hash" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE ((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P} < ${Sampling.thresholdFor(100)}
         |ORDER BY doc_id""".stripMargin,
    // one UNION ALL block per source, each with its own Lehmer
    // threshold — the exact construction mixCorpora unions
    "pipeline_mix" ->
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
         |    ((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P} AS hh
         |  FROM documents)
         |SELECT doc_id, lang, 'en_heavy' AS mix_source, n_chars FROM h
         |  WHERE lang = 'en' AND hh < ${Sampling.thresholdFor(800)}
         |UNION ALL
         |SELECT doc_id, lang, 'de_half', n_chars FROM h
         |  WHERE lang = 'de' AND hh < ${Sampling.thresholdFor(500)}
         |UNION ALL
         |SELECT doc_id, lang, 'fr_light', n_chars FROM h
         |  WHERE lang = 'fr' AND hh < ${Sampling.thresholdFor(200)}
         |ORDER BY doc_id""".stripMargin,
    // identical Lehmer shard + hash-order prefix sum; greedy packing
    // is integer arithmetic on both engines (prefix < 2^53 per shard
    // keeps the floor-division exact through the double)
    "text_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    ((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P} AS h,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |p AS (SELECT doc_id, h % 8 AS shard, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
         |      - n_tokens AS prefix
         |  FROM t)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST(prefix // 256 AS BIGINT) AS seq_idx, n_tokens
         |FROM p ORDER BY doc_id""".stripMargin,
    // per-shard export totals, same Lehmer/shard/prefix spelling as
    // text_pack, aggregated — n_seqs is the count of distinct packed
    // sequence indexes the shard holds
    "pipeline_shards" ->
      s"""WITH t AS (SELECT doc_id,
         |    ((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P} AS h,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |p AS (SELECT doc_id, h % 8 AS shard, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
         |      - n_tokens AS prefix
         |  FROM t)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT prefix // 256) AS BIGINT) AS n_seqs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    "sample_weighted" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE n_chars IS NOT NULL AND n_chars > 0
         |  AND (((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * 2000 < LEAST(n_chars, 2000) * ${Sampling.thresholdFor(200)}
         |ORDER BY doc_id""".stripMargin,
    "stats_zscore_by_lang" ->
      """WITH m AS (
        |  SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS s,
        |    CAST(SUM(n_chars * n_chars) AS DOUBLE) AS sq,
        |    COUNT(n_chars) AS n
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang,
        |  CASE WHEN n > 1
        |      AND (sq - s * s / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) > 0
        |    THEN (CAST(d.n_chars AS DOUBLE) - s / CAST(n AS DOUBLE))
        |      / sqrt((sq - s * s / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
        |    END AS z
        |FROM documents d JOIN m USING (lang)
        |ORDER BY doc_id""".stripMargin,
    "text_nfc" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        |  CAST(CASE WHEN nfc_normalize(text) = text THEN 0 ELSE 1 END
        |    AS BIGINT) AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,
    // bit-by-bit spelling of the Morton interleave (the Spark side
    // uses the magic-number spread; same function, 62 explicit terms)
    "pipeline_zorder" ->
      """WITH m AS (SELECT doc_id, n_chars,
        |    n_chars & 2147483647 AS a, doc_id & 2147483647 AS b
        |  FROM documents)
        |SELECT doc_id, n_chars, TERMS AS z
        |FROM m ORDER BY doc_id""".stripMargin
      .replace("TERMS", "(((a >> 0) & 1) << 1) | (((b >> 0) & 1) << 0) | (((a >> 1) & 1) << 3) | (((b >> 1) & 1) << 2) | (((a >> 2) & 1) << 5) | (((b >> 2) & 1) << 4) | (((a >> 3) & 1) << 7) | (((b >> 3) & 1) << 6) | (((a >> 4) & 1) << 9) | (((b >> 4) & 1) << 8) | (((a >> 5) & 1) << 11) | (((b >> 5) & 1) << 10) | (((a >> 6) & 1) << 13) | (((b >> 6) & 1) << 12) | (((a >> 7) & 1) << 15) | (((b >> 7) & 1) << 14) | (((a >> 8) & 1) << 17) | (((b >> 8) & 1) << 16) | (((a >> 9) & 1) << 19) | (((b >> 9) & 1) << 18) | (((a >> 10) & 1) << 21) | (((b >> 10) & 1) << 20) | (((a >> 11) & 1) << 23) | (((b >> 11) & 1) << 22) | (((a >> 12) & 1) << 25) | (((b >> 12) & 1) << 24) | (((a >> 13) & 1) << 27) | (((b >> 13) & 1) << 26) | (((a >> 14) & 1) << 29) | (((b >> 14) & 1) << 28) | (((a >> 15) & 1) << 31) | (((b >> 15) & 1) << 30) | (((a >> 16) & 1) << 33) | (((b >> 16) & 1) << 32) | (((a >> 17) & 1) << 35) | (((b >> 17) & 1) << 34) | (((a >> 18) & 1) << 37) | (((b >> 18) & 1) << 36) | (((a >> 19) & 1) << 39) | (((b >> 19) & 1) << 38) | (((a >> 20) & 1) << 41) | (((b >> 20) & 1) << 40) | (((a >> 21) & 1) << 43) | (((b >> 21) & 1) << 42) | (((a >> 22) & 1) << 45) | (((b >> 22) & 1) << 44) | (((a >> 23) & 1) << 47) | (((b >> 23) & 1) << 46) | (((a >> 24) & 1) << 49) | (((b >> 24) & 1) << 48) | (((a >> 25) & 1) << 51) | (((b >> 25) & 1) << 50) | (((a >> 26) & 1) << 53) | (((b >> 26) & 1) << 52) | (((a >> 27) & 1) << 55) | (((b >> 27) & 1) << 54) | (((a >> 28) & 1) << 57) | (((b >> 28) & 1) << 56) | (((a >> 29) & 1) << 59) | (((b >> 29) & 1) << 58) | (((a >> 30) & 1) << 61) | (((b >> 30) & 1) << 60)"),
    "stats_winsorize_by_lang" ->
      """WITH l AS (
        |  SELECT lang, quantile_disc(n_chars, 0.1) AS lo,
        |    quantile_disc(n_chars, 0.9) AS hi
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY lang)
        |SELECT doc_id, d.lang AS lang, n_chars,
        |  CASE WHEN n_chars IS NOT NULL
        |    THEN GREATEST(lo, LEAST(hi, n_chars)) END AS clipped
        |FROM documents d JOIN l USING (lang)
        |ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    ((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P} AS hk
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
         |  FROM h)
         |SELECT doc_id, lang FROM r WHERE rn <= 25
         |ORDER BY lang, doc_id""".stripMargin,
    "pipeline_curate" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
         |    CAST(length(text) AS DOUBLE) /
         |      CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS mean_tok_len
         |  FROM documents),
         |filtered AS (
         |  SELECT * FROM scored WHERE n_tokens >= 5 AND mean_tok_len <= 12.0),
         |keepers AS (
         |  SELECT MIN(doc_id) AS keep_id FROM (
         |    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
         |    FROM filtered) GROUP BY ck),
         |sampled AS (
         |  SELECT * FROM filtered
         |  WHERE doc_id IN (SELECT keep_id FROM keepers)
         |    AND ((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P} < ${Sampling.thresholdFor(500)})
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  SUM(CAST(n_tokens AS DOUBLE)) / COUNT(*) AS mean_tokens
         |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin,
    "text_bigrams" ->
      """WITH t AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
        |           FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t)
        |SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY bigram
        |ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
    // exhaustive-assignment semantic dedup == the plain threshold
    // cosine join on the bounded subset (recall 1 by construction)
    "dedup_semantic_verified" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 200)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "sim_topk_brute" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |     s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, v) AS cos
        |           FROM q JOIN e ON e.vec_id != qid),
        |     r AS (SELECT qid, nid,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid, nid, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // the verified ANN twins degenerate to exhaustive search (recall 1
    // by construction), so the exact brute-force spelling IS their
    // oracle — same query, three physical routes (direct score,
    // all-cells IVF probe join, single-bucket LSH join)
    "sim_topk_ivf_verified" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |     s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, v) AS cos
        |           FROM q JOIN e ON e.vec_id != qid),
        |     r AS (SELECT qid, nid,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid, nid, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "sim_topk_lsh_verified" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |     s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, v) AS cos
        |           FROM q JOIN e ON e.vec_id != qid),
        |     r AS (SELECT qid, nid,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid, nid, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // PQ-family twins: refine·k ≥ |corpus| puts every vector through
    // the exact re-rank, so the brute-force spelling applies — same
    // query, two more physical routes (ADC scan + refine join,
    // all-cells IVF-PQ probe + refine join)
    "sim_topk_pq_verified" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |     s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, v) AS cos
        |           FROM q JOIN e ON e.vec_id != qid),
        |     r AS (SELECT qid, nid,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid, nid, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "sim_topk_ivfpq_verified" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |     s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, v) AS cos
        |           FROM q JOIN e ON e.vec_id != qid),
        |     r AS (SELECT qid, nid,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid, nid, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // graph twin: exhaustive entry seeds make the hop-0 beam exact, so
    // the brute-force spelling applies — candidates restricted to the
    // graph gate's vec_id < 1000 corpus subset
    "sim_topk_graph_verified" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 1000),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |     s AS (SELECT qid, e.vec_id AS nid, list_cosine_similarity(qv, v) AS cos
        |           FROM q JOIN e ON e.vec_id != qid),
        |     r AS (SELECT qid, nid,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        |SELECT qid, nid, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // nearest of the 8 fixed centroids (lowest vec_ids), ties to the
    // lowest centroid id — same ROW_NUMBER order the Spark argmax folds
    "emb_cluster_assign" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |     s AS (SELECT e.vec_id, cid,
        |           COALESCE(list_cosine_similarity(v, cv), -2) AS cos
        |           FROM e CROSS JOIN c),
        |     r AS (SELECT vec_id, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        |           FROM s)
        |SELECT vec_id, cid AS cluster_id FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
        |  length(text) AS n_chars_measured,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+')) AS n_subtokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // add-one bigram LM trained on the doc_id%10==0 reference slice;
    // verdict gates the RAW mean log2 prob at -5.1 (no doc lands
    // within float wiggle of the threshold), the score itself is
    // rounded to 4dp for the hash
    "text_lm_score" ->
      """WITH tok AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |ref AS (SELECT * FROM tok WHERE doc_id % 10 = 0),
        |rb AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
        |         unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2 FROM ref),
        |model AS (SELECT w1, w2, COUNT(*) AS c12 FROM rb GROUP BY 1, 2),
        |ctx AS (SELECT w1, COUNT(*) AS c1 FROM rb GROUP BY 1),
        |voc AS (SELECT COUNT(DISTINCT w) AS v
        |        FROM (SELECT unnest(t) AS w FROM ref)),
        |db AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
        |    unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2 FROM tok),
        |sc AS (SELECT doc_id, CASE WHEN m.c12 IS NULL THEN 1 ELSE 0 END AS oov,
        |         log2(CAST(COALESCE(m.c12, 0) + 1 AS DOUBLE) /
        |              CAST(COALESCE(c.c1, 0) + v.v AS DOUBLE)) AS lp
        |       FROM db LEFT JOIN model m USING (w1, w2)
        |       LEFT JOIN ctx c USING (w1) CROSS JOIN voc v),
        |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |          CAST(SUM(oov) AS BIGINT) AS oov_bigrams, AVG(lp) AS s
        |        FROM sc GROUP BY 1)
        |SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(a.oov_bigrams, 0) AS oov_bigrams,
        |  round(a.s, 4) AS lm_score,
        |  CASE WHEN a.n_bigrams IS NULL THEN 'short'
        |       WHEN a.s >= -5.1 THEN 'keep' ELSE 'drop' END AS verdict
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_tok_len,
        |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
        |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in'], x)))
        |    AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |h AS (SELECT doc_id,
        |  len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS en_hits,
        |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','nicht'], x))) AS de_hits,
        |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une'], x))) AS fr_hits,
        |  len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un','una'], x))) AS es_hits
        |  FROM t)
        |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
        |  CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0 THEN 'und'
        |       WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'en'
        |       WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'de'
        |       WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'fr'
        |       ELSE 'es' END AS pred_lang
        |FROM h ORDER BY doc_id""".stripMargin,
    // fingerprints computed over ALL bounded docs then split by id —
    // identical to fingerprinting the slices separately (per-doc op)
    "decontam_winnow" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> length(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 1000),
        |kg AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        |    ELSE CAST([] AS VARCHAR[]) END AS kgrams
        |  FROM t),
        |kh AS (
        |  SELECT doc_id, len(kgrams) AS m,
        |    CAST(generate_subscripts(kgrams, 1) AS BIGINT) AS i,
        |    CAST(('0x' || substring(md5(unnest(kgrams)), 1, 10)) AS BIGINT)
        |      * 1048576 + generate_subscripts(kgrams, 1) AS key
        |  FROM kg),
        |win AS (
        |  SELECT doc_id, i, m,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
        |  FROM kh),
        |fps AS (
        |  SELECT DISTINCT doc_id, sel // 1048576 AS fp_hash
        |  FROM win WHERE i <= GREATEST(m - 3, 1)),
        |bfp AS (SELECT DISTINCT fp_hash FROM fps WHERE doc_id < 20)
        |SELECT f.doc_id, COUNT(DISTINCT f.fp_hash) AS hits
        |FROM fps f JOIN bfp USING (fp_hash)
        |WHERE f.doc_id >= 20
        |GROUP BY f.doc_id HAVING COUNT(DISTINCT f.fp_hash) >= 2
        |ORDER BY doc_id""".stripMargin,
    "text_vocab_oov" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM toks GROUP BY tok
        |  ORDER BY COUNT(*) DESC, tok LIMIT 100),
        |scored AS (
        |  SELECT t.doc_id, COUNT(*) AS n_tokens,
        |    COUNT(CASE WHEN v.tok IS NULL THEN 1 END) AS n_oov
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
        |FROM scored ORDER BY doc_id""".stripMargin,
    // winnowing fingerprints → df filter → hash self-join: the whole
    // candidate pipeline reproduced relationally
    "text_search" ->
      """WITH dt AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |qt AS (SELECT * FROM (VALUES
        |    ('q_joins','hash'),('q_joins','join'),
        |    ('q_scan','scan'),('q_scan','filter'),('q_scan','column'),
        |    ('q_stream','stream'),('q_stream','window'))
        |  AS t(qid, term)),
        |qs AS (SELECT qid, COUNT(DISTINCT term) AS n_terms
        |       FROM qt GROUP BY qid),
        |m AS (SELECT qid, doc_id, COUNT(DISTINCT dt.term) AS nm,
        |        COUNT(*) AS score
        |      FROM dt JOIN qt USING (term) GROUP BY qid, doc_id),
        |c AS (SELECT m.qid, doc_id, score FROM m JOIN qs USING (qid)
        |      WHERE nm = n_terms),
        |r AS (SELECT qid, doc_id, CAST(score AS BIGINT) AS score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |          ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |      FROM c)
        |SELECT qid, doc_id, score, rank FROM r WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,
    // duplicated-gram islands from gram TEXT (Spark keys on xxhash64 —
    // same spans absent a 64-bit collision); CASE's ELSE catches the
    // NULL lag exactly like Spark's otherwise()
    "dedup_substring" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> length(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 5 THEN
        |      list_transform(range(1, len(toks) - 3),
        |        i -> array_to_string(list_slice(toks, i, i + 4), ' '))
        |    ELSE CAST([] AS VARCHAR[]) END AS grams
        |  FROM t),
        |e AS (
        |  SELECT doc_id, CAST(generate_subscripts(grams, 1) AS BIGINT) AS pos,
        |    unnest(grams) AS gram
        |  FROM g),
        |dd AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gram) AS cnt
        |       FROM e),
        |f AS (SELECT doc_id, pos FROM dd WHERE cnt > 1),
        |m AS (SELECT doc_id, pos,
        |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
        |      THEN 0 ELSE 1 END AS brk
        |  FROM f),
        |sp AS (SELECT doc_id, pos,
        |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |  FROM m)
        |SELECT doc_id, MIN(pos) AS span_start,
        |  CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
        |  COUNT(*) AS n_dup_grams
        |FROM sp GROUP BY doc_id, span_id
        |ORDER BY doc_id, span_start""".stripMargin,
    "dedup_substring_stats" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> length(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 5 THEN
        |      list_transform(range(1, len(toks) - 3),
        |        i -> array_to_string(list_slice(toks, i, i + 4), ' '))
        |    ELSE CAST([] AS VARCHAR[]) END AS grams
        |  FROM t),
        |e AS (
        |  SELECT doc_id, CAST(generate_subscripts(grams, 1) AS BIGINT) AS pos,
        |    unnest(grams) AS gram
        |  FROM g),
        |dd AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gram) AS cnt
        |       FROM e),
        |f AS (SELECT doc_id, pos FROM dd WHERE cnt > 1),
        |m AS (SELECT doc_id, pos,
        |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
        |      THEN 0 ELSE 1 END AS brk
        |  FROM f),
        |sp AS (SELECT doc_id, pos,
        |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |  FROM m),
        |spans AS (SELECT doc_id, MIN(pos) AS a, MAX(pos) + 4 AS b
        |          FROM sp GROUP BY doc_id, span_id),
        |agg AS (SELECT doc_id, COUNT(*) AS n_spans,
        |          SUM(b - a + 1) AS n_dup_tokens
        |        FROM spans GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(agg.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(agg.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
        |  CASE WHEN len(toks) > 0
        |    THEN CAST(COALESCE(agg.n_dup_tokens, 0) AS DOUBLE) / len(toks)
        |    ELSE NULL END AS dup_fraction
        |FROM t LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "dedup_winnow" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> length(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 1000),
        |kg AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        |    ELSE CAST([] AS VARCHAR[]) END AS kgrams
        |  FROM t),
        |kh AS (
        |  SELECT doc_id, len(kgrams) AS m,
        |    CAST(generate_subscripts(kgrams, 1) AS BIGINT) AS i,
        |    CAST(('0x' || substring(md5(unnest(kgrams)), 1, 10)) AS BIGINT)
        |      * 1048576 + generate_subscripts(kgrams, 1) AS key
        |  FROM kg),
        |win AS (
        |  SELECT doc_id, i, m,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
        |  FROM kh),
        |fps AS (
        |  SELECT DISTINCT doc_id, sel // 1048576 AS fp_hash
        |  FROM win WHERE i <= GREATEST(m - 3, 1)),
        |rare AS (
        |  SELECT fp_hash FROM fps GROUP BY fp_hash HAVING COUNT(*) <= 100),
        |keyed AS (
        |  SELECT f.doc_id, f.fp_hash FROM fps f JOIN rare USING (fp_hash)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        |  FROM keyed a JOIN keyed b
        |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, shared FROM pairs WHERE shared >= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // the full winnowing construction mirrored: same 40-bit md5 kgram
    // hash, same h·2^20+pos key, same full-window starts filter
    "text_winnow" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> length(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 1000),
        |kg AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(list_slice(toks, i, i + 2), ' '))
        |    ELSE CAST([] AS VARCHAR[]) END AS kgrams
        |  FROM t),
        |kh AS (
        |  SELECT doc_id, len(kgrams) AS m,
        |    CAST(generate_subscripts(kgrams, 1) AS BIGINT) AS i,
        |    CAST(('0x' || substring(md5(unnest(kgrams)), 1, 10)) AS BIGINT)
        |      * 1048576 + generate_subscripts(kgrams, 1) AS key
        |  FROM kg),
        |win AS (
        |  SELECT doc_id, i, m,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
        |  FROM kh)
        |SELECT DISTINCT doc_id, sel % 1048576 AS fp_pos,
        |  sel // 1048576 AS fp_hash
        |FROM win WHERE i <= GREATEST(m - 3, 1)
        |ORDER BY doc_id, fp_pos, fp_hash""".stripMargin,
    "text_cooccur" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(toks) AS tok,
        |    generate_subscripts(toks, 1) AS i
        |  FROM t),
        |pairs AS (
        |  SELECT a.tok || ' ' || b.tok AS pair
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2)
        |SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_md5,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> CAST(length(t) AS BIGINT))),
        |    (a, b) -> (a*31 + b) % 1000000007) AS rolling_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  'text/plain' AS kind
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id,
        |  CAST(LEAST(64, octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes_out
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
        |    AS distinct_ratio,
        |  CAST(list_max(list_transform(list_distinct(toks),
        |      d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) AS top_token_share
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |    unnest(range(0, CAST((len(toks)-1)//64 AS INTEGER) + 1)) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  CAST(len(toks[chunk_idx*64+1 : chunk_idx*64+64]) AS INTEGER)
        |    AS n_chunk_tokens,
        |  array_to_string(toks[chunk_idx*64+1 : chunk_idx*64+64], ' ')
        |    AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // same chunking as text_chunks at size 2; blocklist = chunks in
    // > 15 docs (HAVING over COUNT DISTINCT), anti join via NULL-check
    // LEFT JOIN, reassembly = string_agg ORDER BY chunk_idx — the
    // exact relational construction the Spark side broadcasts
    "text_boilerplate" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |    unnest(range(0, CAST((len(toks)-1)//2 AS INTEGER) + 1)) AS chunk_idx
        |  FROM t),
        |ch AS (SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |    array_to_string(toks[chunk_idx*2+1 : chunk_idx*2+2], ' ')
        |      AS chunk_text FROM c),
        |df AS (SELECT chunk_text FROM ch
        |  GROUP BY chunk_text HAVING COUNT(DISTINCT doc_id) > 15),
        |kept AS (SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text FROM ch
        |  LEFT JOIN df ON ch.chunk_text = df.chunk_text
        |  WHERE df.chunk_text IS NULL)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept_chunks,
        |  string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the 8-stage funnel as one CTE chain: each stage reuses the
    // dialect its standalone oracle pinned (boilerplate from
    // text_boilerplate, all-pairs Jaccard from dedup_minhash_verified,
    // shingle overlap from decontam_overlap, Lehmer mix/pack from
    // pipeline_mix/text_pack) — the near-dup stage is exact all-pairs
    // here because recall-1 banding + exact verify EQUALS it on the
    // bounded subset
    "pipeline_e2e" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang, source, n_chars, text FROM documents
         |  WHERE doc_id < 1000
         |  UNION ALL
         |  SELECT doc_id + 100000, lang, source, n_chars, text FROM documents
         |  WHERE doc_id < 1000 AND doc_id % 13 = 3),
         |q AS (
         |  SELECT doc_id, lang, source, n_chars, text FROM (
         |    SELECT *, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS nrt,
         |      CAST(length(text) AS DOUBLE) /
         |        CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS mtl
         |    FROM base WHERE doc_id >= 20)
         |  WHERE nrt >= 20 AND mtl <= 12.0),
         |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM q),
         |c AS (SELECT doc_id, toks,
         |    unnest(range(0, CAST((len(toks)-1)//2 AS INTEGER) + 1)) AS chunk_idx FROM t),
         |ch AS (SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         |    array_to_string(toks[chunk_idx*2+1 : chunk_idx*2+2], ' ') AS chunk_text FROM c),
         |bl AS (SELECT chunk_text FROM ch GROUP BY chunk_text HAVING COUNT(DISTINCT doc_id) > 15),
         |cleaned AS (
         |  SELECT ch.doc_id, string_agg(ch.chunk_text, ' ' ORDER BY ch.chunk_idx) AS clean_text
         |  FROM ch LEFT JOIN bl ON ch.chunk_text = bl.chunk_text
         |  WHERE bl.chunk_text IS NULL GROUP BY ch.doc_id),
         |exact AS (
         |  SELECT doc_id, clean_text FROM cleaned
         |  WHERE doc_id IN (SELECT MIN(doc_id) FROM cleaned GROUP BY md5(clean_text))),
         |ts AS (SELECT doc_id, clean_text,
         |    list_distinct(string_split_regex(clean_text, '\\s+')) AS tset FROM exact),
         |neardrop AS (
         |  SELECT DISTINCT b.doc_id FROM ts a JOIN ts b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE) /
         |    (len(a.tset) + len(b.tset) - len(list_intersect(a.tset, b.tset))) >= 0.7),
         |near AS (SELECT doc_id, clean_text FROM ts
         |  WHERE doc_id NOT IN (SELECT doc_id FROM neardrop)),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
         |      range(1, greatest(len(t2)-2, 1)+1),
         |      i -> array_to_string(t2[i:i+2], ' ')))) AS sh
         |  FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS t2
         |        FROM base WHERE doc_id < 20)),
         |csh AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |      range(1, greatest(len(t3)-2, 1)+1),
         |      i -> array_to_string(t3[i:i+2], ' ')))) AS sh
         |  FROM (SELECT doc_id, string_split_regex(clean_text, '\\s+') AS t3 FROM near)),
         |contam AS (SELECT DISTINCT csh.doc_id FROM csh JOIN bsh USING (sh)),
         |decon AS (SELECT doc_id, clean_text FROM near
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |capped AS (
         |  SELECT doc_id, lang FROM (
         |    SELECT b2.doc_id, b2.lang,
         |      ROW_NUMBER() OVER (PARTITION BY b2.source
         |        ORDER BY b2.n_chars DESC, b2.doc_id) AS rn
         |    FROM base b2 WHERE b2.doc_id IN (SELECT doc_id FROM decon)) WHERE rn <= 10),
         |h AS (SELECT doc_id, lang,
         |    ((doc_id % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P}) * ${Sampling.A} % ${Sampling.P} AS hh
         |  FROM capped),
         |mixed AS (
         |  SELECT doc_id, lang, 'en_heavy' AS mix_source, hh FROM h
         |    WHERE lang = 'en' AND hh < ${Sampling.thresholdFor(800)}
         |  UNION ALL
         |  SELECT doc_id, lang, 'de_half', hh FROM h
         |    WHERE lang = 'de' AND hh < ${Sampling.thresholdFor(500)}
         |  UNION ALL
         |  SELECT doc_id, lang, 'fr_light', hh FROM h
         |    WHERE lang = 'fr' AND hh < ${Sampling.thresholdFor(200)}),
         |ntok AS (SELECT doc_id,
         |    CAST(len(string_split_regex(clean_text, '\\s+')) AS BIGINT) AS n_tokens
         |  FROM decon),
         |p AS (SELECT m.doc_id, m.lang, m.mix_source, m.hh % 8 AS shard, ntok.n_tokens,
         |    SUM(ntok.n_tokens) OVER (PARTITION BY m.hh % 8 ORDER BY m.hh, m.doc_id)
         |      - ntok.n_tokens AS prefix
         |  FROM mixed m JOIN ntok USING (doc_id))
         |SELECT doc_id, lang, mix_source, CAST(shard AS BIGINT) AS shard,
         |  CAST(prefix // 64 AS BIGINT) AS seq_idx, n_tokens
         |FROM p ORDER BY doc_id""".stripMargin,
    // trigram shingles mirror TextFunctions.wordShingles: indices
    // 1..max(len-2, 1), slice truncated at the end, per-doc distinct
    "decontam_overlap" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 1)+1),
        |      i -> array_to_string(t[i:i+2], ' ')))) AS sh
        |  FROM toks),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 20)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS hits
        |FROM corpus c JOIN bench b USING (sh)
        |GROUP BY c.doc_id HAVING COUNT(*) >= 1
        |ORDER BY doc_id""".stripMargin,
    // the ingest funnel replayed as a CTE chain: quality gate,
    // batch-internal keep-min-id + corpus anti on the normalized
    // content key, exact unigram-Jaccard near-dup vs corpus and
    // within-batch (== the r=2 recall-1 banding the Spark side runs),
    // trigram decontamination, then corpus UNION survivors — the
    // relation the VersionedTable append makes visible at the latest
    // version
    "pipeline_ingest" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source, n_chars, text FROM documents
        |  WHERE doc_id < 300),
        |corpus AS (SELECT * FROM base WHERE doc_id >= 20 AND doc_id % 10 != 3),
        |batch AS (
        |  SELECT * FROM base WHERE doc_id >= 20 AND doc_id % 10 = 3
        |  UNION ALL
        |  SELECT doc_id + 200000, lang, source, n_chars, text
        |  FROM corpus WHERE doc_id % 7 = 6
        |  UNION ALL
        |  SELECT doc_id + 300000, lang, source, n_chars, text || ' addendum'
        |  FROM corpus WHERE doc_id % 7 = 2),
        |q AS (
        |  SELECT doc_id, lang, source, n_chars, text FROM (
        |    SELECT *, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS nrt,
        |      CAST(length(text) AS DOUBLE) /
        |        CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) AS mtl
        |    FROM batch)
        |  WHERE nrt >= 20 AND mtl <= 12.0),
        |qk AS (SELECT *, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ck FROM q),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM qk GROUP BY ck),
        |ckc AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ck FROM corpus),
        |e2 AS (SELECT qk.* FROM qk JOIN keep USING (doc_id)
        |       LEFT JOIN ckc ON qk.ck = ckc.ck WHERE ckc.ck IS NULL),
        |bt AS (SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
        |       FROM e2 WHERE length(trim(text)) > 0),
        |ct AS (SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ts
        |       FROM corpus WHERE length(trim(text)) > 0),
        |dropc AS (SELECT DISTINCT b.doc_id FROM bt b JOIN ct c ON
        |  CAST(len(list_intersect(b.ts, c.ts)) AS DOUBLE) /
        |    (len(b.ts) + len(c.ts) - len(list_intersect(b.ts, c.ts))) >= 0.7),
        |dropi AS (SELECT DISTINCT b.doc_id FROM bt b JOIN bt a ON a.doc_id < b.doc_id AND
        |  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= 0.7),
        |n1 AS (SELECT e2.doc_id, lang, source, n_chars, text FROM e2
        |  LEFT JOIN dropc ON e2.doc_id = dropc.doc_id
        |  LEFT JOIN dropi ON e2.doc_id = dropi.doc_id
        |  WHERE dropc.doc_id IS NULL AND dropi.doc_id IS NULL),
        |nt AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM n1),
        |dsh AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 1)+1),
        |      i -> array_to_string(t[i:i+2], ' ')))) AS sh
        |  FROM nt),
        |btoks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM base WHERE doc_id < 20),
        |bsh AS (SELECT DISTINCT
        |    unnest(list_distinct(list_transform(range(1, greatest(len(t)-2, 1)+1),
        |      i -> array_to_string(t[i:i+2], ' ')))) AS sh
        |  FROM btoks),
        |contaminated AS (SELECT DISTINCT doc_id FROM dsh JOIN bsh USING (sh)),
        |surv AS (SELECT n1.* FROM n1 LEFT JOIN contaminated c ON n1.doc_id = c.doc_id
        |         WHERE c.doc_id IS NULL)
        |SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5 FROM (
        |  SELECT doc_id, lang, source, n_chars, text FROM corpus
        |  UNION ALL
        |  SELECT doc_id, lang, source, n_chars, text FROM surv)
        |ORDER BY doc_id""".stripMargin,
  )
}
