package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.BloomPrune
import TextFunctions._

/** Document deduplication strategies for a large-scale training-data
  * pipeline. Four families, all shuffle-disciplined for 100 TB:
  *
  *  - exact: one hash aggregate on a content key (the only shuffle);
  *  - MinHash+LSH: per-row signatures (narrow, codegen'd) → explode
  *    band keys → ONE shuffle on (band, key) to co-locate candidates →
  *    pair verify. Never an O(n²) cross join: cost is bounded by bucket
  *    sizes, the standard web-scale dedup shape;
  *  - SimHash: per-row 64-bit sketch → pigeonhole banding into 4
  *    16-bit chunks (hamming ≤ 3 ⇒ ≥ 1 chunk equal) → bucket join →
  *    exact hamming verify;
  *  - n-gram Jaccard: exact verify used standalone on a bounded subset
  *    (the oracle-checkable reference semantics for the approximate
  *    paths above).
  *
  * No reference counterpart (SURVEY.md §2.3) — the closest reference op
  * is the reducer-HashMap offspring dedup
  * (/root/reference/src/edu/illinois/incr_ga/IncMapReduce.java:302-325),
  * which `exact` generalizes.
  */
object Dedup {

  /** Explicit exchange width for the CPU-dense self-join / verify
    * stages below — scale-adaptive (defaultParallelism tracks the
    * cluster), pinned so AQE's byte-targeted coalescing cannot fold a
    * compute-heavy-but-byte-light exchange to one partition and
    * serialize quadratic pair evaluation (observed at gate scale on
    * every banding family member). */
  private def par(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism


  /** Exact dedup on whitespace-normalized content: keeps the smallest
    * doc_id per group ("first wins"), reports group size. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(normText(col("text"))).as("content_key"))
      .groupBy("content_key")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dups"))

  /** Candidate near-dup pairs via MinHash-LSH over word-shingle sets,
    * verified with exact Jaccard. Returns (id_a, id_b, j).
    *
    * Shuffle discipline (the 100 TB shape): the bucket join and the
    * pair `distinct` run over NARROW (doc_id, band, bkey) rows — token
    * arrays never ride the wide exchange. Verified token sets are
    * joined back onto the (small) surviving pair set afterwards.
    * Candidate volume is corpus-dependent: a corpus where everything
    * resembles everything (like the synthetic word-salad test docs
    * under unigram shingles) is inherently quadratic in TRUE pairs;
    * discriminative shingles (n >= 3) keep bucket sizes bounded on
    * real corpora. */
  def minhashPairs(docs: DataFrame, shingleN: Int = 3, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be a multiple of bands=$bands " +
        "(a remainder would silently drop tail hashes from every band)")
    val banded = bandedKeys(docs, shingleN, k, bands)
      // explicit hash partitioning on the join keys: both self-join
      // branches now share ONE identical exchange subtree, which
      // ReuseExchange collapses — the signatures are computed once at
      // ANY scale (even when the planner picks a broadcast join, whose
      // build side would otherwise recompute the whole pipeline).
      // NOT persisted: a library function must not strand cache blocks
      // in the caller's session — the round-2 spelling persisted here
      // and leaked both datasets for the session lifetime
      // (PlanAuditSpec asserts the reuse, DedupSpec the no-leak).
      .repartition(par(docs), col("band"), col("bkey"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    // narrow candidate pairs; distinct collapses multi-band agreement
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // token-set join-back: repartition BELOW the per-side renames (the
    // embeddingNearDup pattern) so the id_a and id_b branches reference
    // ONE identical exchange subtree — ReuseExchange collapses them and
    // the corpus is tokenized exactly once (renaming first would give
    // each branch its own exchange; whether canonicalization unifies
    // those is planner-version luck, and round-3 measured it NOT
    // reusing: tokenization ran twice). PlanAuditSpec asserts both this
    // reuse and the banded self-join's.
    val ts = docs.select(col("doc_id"), tokenSet(col("text")).as("ts"))
      .repartition(par(docs), col("doc_id"))
    pairs
      .join(ts.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(ts.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .withColumn("j", jaccard(col("ts_a"), col("ts_b")))
      .filter(col("j") >= threshold)
      .select("id_a", "id_b", "j")
  }

  /** (doc_id, band, bkey) LSH bucket keys per document — the shared
    * candidate-generation front half of minhashPairs and
    * incrementalMinhashPairs. */
  private def bandedKeys(docs: DataFrame, shingleN: Int, k: Int,
      bands: Int): DataFrame = {
    val r = k / bands
    docs
      // blank/NULL docs all tokenize to the same degenerate shingle
      // set, so every one of them would collide with every other on
      // every band — candidate volume quadratic in the number of empty
      // docs (and genuinely-empty shingle arrays would all carry
      // MinHashSignature's identical all-sentinel signature, same
      // blowup). A doc with no content has nothing to NEAR-dup
      // against — exact dedup owns that class; drop before banding.
      .filter(length(trim(col("text"))) > 0)
      // bind tokens before shingling — an unbound split expression
      // inside the shingle lambda re-evaluates per element (quadratic
      // per doc; see TextFunctions.shinglesOfTokens)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesOfTokens(col("toks"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      // native one-pass signature (graft.functions.MinHashSignature);
      // the HOF spelling in TextFunctions.minhashSignature uses a
      // different (k-string-hash) member of the same family and stays
      // as the declarative reference
      .withColumn("sig",
        graft.functions.MinHashSignature.minhashSignature(col("sh"), k))
      .select(col("doc_id"),
        posexplode(lshBands(col("sig"), bands, r)).as(Seq("band", "bkey")))
  }

  /** Incremental near-dup detection: pairs between a NEW batch and an
    * EXISTING corpus, plus new-vs-new — but never corpus-vs-corpus,
    * which was settled when the corpus was built. This is the daily
    * ingestion shape (the batch analog of the reference's incremental
    * GA entry point, /root/reference/src/edu/illinois/incr_ga/
    * IncMapReduce.java, which re-evaluates only the offspring against
    * accumulated state): each batch pays banding for ITS OWN rows plus
    * one bucket join against the corpus's bucket keys. At 100 TB the
    * corpus side is a precomputed signature table stored bucketed by
    * (band, bkey), so a batch run shuffles only batch-sized data; here
    * both sides band from text to keep the function self-contained.
    *
    * doc_ids must be disjoint across the two inputs (they are one id
    * space — a shared id would alias a pair into self-comparison and
    * be dropped by the a < b guard). Returns (id_a, id_b, j) with at
    * least one side from `newDocs`, exact-Jaccard verified. */
  def incrementalMinhashPairs(newDocs: DataFrame, corpus: DataFrame,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be a multiple of bands=$bands " +
        "(a remainder would silently drop tail hashes from every band)")
    val both =
      bandedKeys(newDocs, shingleN, k, bands).withColumn("is_new", lit(true))
        .unionByName(
          bandedKeys(corpus, shingleN, k, bands).withColumn("is_new", lit(false)))
        // one exchange shared by both self-join branches (the
        // minhashPairs ReuseExchange discipline)
        .repartition(par(newDocs), col("band"), col("bkey"))
    val a = both.alias("a")
    val b = both.alias("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id") &&
          (col("a.is_new") || col("b.is_new")))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val ts = newDocs.select(col("doc_id"), col("text"))
      .unionByName(corpus.select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokenSet(col("text")).as("ts"))
      .repartition(par(newDocs), col("doc_id"))
    pairs
      .join(ts.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(ts.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .withColumn("j", jaccard(col("ts_a"), col("ts_b")))
      .filter(col("j") >= threshold)
      .select("id_a", "id_b", "j")
  }

  /** Exact batch-vs-corpus novelty filter with an INVERTED Bloom
    * prune — "which keys in this batch has the corpus never seen":
    * the incremental-ingest membership question every continuously-fed
    * pipeline asks before reprocessing (new (user, action) combos, new
    * content hashes, new URLs).
    *
    * The naive anti-join shuffles the CORPUS on the key — at 100 TB
    * that one exchange dwarfs everything else. Inverted prune: sketch
    * the BATCH's distinct keys (small side, kilobytes-to-megabytes of
    * mergeable state via one aggregate), ship the sketch to the corpus
    * scan as a scalar subquery, and keep only corpus rows that MIGHT
    * collide with a batch key. The corpus is read once with NO
    * shuffle; only the surviving suspects — |batch ∩ corpus| true
    * matches plus fpp·|corpus| false positives, both tiny next to the
    * corpus — ride the exact anti-join that removes false positives.
    * Result is therefore EXACTLY the plain anti-join (hash-gated
    * against it), at a fraction of its exchange volume; size
    * `expectedBatchKeys` to the batch so fpp stays low.
    *
    * NULL keys: the probe hashes NULL like any value, but the exact
    * anti-join's null-rejecting equality keeps every NULL-keyed batch
    * row — matching the SQL ANTI JOIN the oracle runs.
    *
    * Emits the batch's distinct novel key tuples. */
  def novelKeys(batch: DataFrame, corpus: DataFrame, keyCols: Seq[String],
      expectedBatchKeys: Long = 1000000L): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val bk = batch.select(keyCols.map(col): _*).distinct()
    val sketch = BloomPrune.sketchOfKeys(bk, keyCols, expectedBatchKeys)
    val aliased = keyCols.map(k => s"__graft_corpus_$k")
    val suspects = corpus
      .select(keyCols.zip(aliased).map { case (k, a) => col(k).as(a) }: _*)
      .filter(BloomPrune.mightContainKeys(sketch, aliased.map(col)))
    val cond = keyCols.zip(aliased)
      .map { case (k, a) => bk(k) === col(a) }.reduce(_ && _)
    bk.join(suspects, cond, "left_anti")
  }

  /** 64-bit SimHash per document — the native fused expression
    * (graft.functions.SimHash64). The built-ins-only spelling
    * (TextFunctions.simhashCounters/simhashFromCounters) computes the
    * identical value and remains the cross-check in DedupSpec. */
  def simhashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(tokens(col("text"))).as("simhash"))

  /** Near-dup pairs with hamming(simhash) <= maxHamming, found via
    * 4-chunk pigeonhole banding (exact for maxHamming <= 3). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // same empty-doc discipline as minhashPairs: blank docs share one
    // degenerate sketch and would pair quadratically
    val sh = simhashes(docs.filter(length(trim(col("text"))) > 0))
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map { c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
        }: _*)).as(Seq("chunk", "ckey")))
    val a = sh.alias("a")
    val b = sh.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (token-set) Jaccard pairs over a bounded id range —
    * the oracle-checkable ground truth for the approximate paths.
    * O(subset²) by construction; keep maxId small. */
  def ngramJaccardPairs(docs: DataFrame, maxId: Long, threshold: Double): DataFrame = {
    // same blank-doc discipline as the approximate paths: two
    // content-empty docs share the degenerate token set [""] (Jaccard
    // 1), but "no content" is exact dedup's class, not near-dup's —
    // and the exact generator must agree with minhashPairs here, or
    // the LSH-fed and exact-fed clusterings (which share one oracle)
    // would diverge on any corpus containing two blank docs
    val t = docs.filter(col("doc_id") < maxId)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), tokenSet(col("text")).as("ts"))
    val a = t.alias("a")
    val b = t.alias("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        jaccard(col("a.ts"), col("b.ts")).as("j"))
      .filter(col("j") >= threshold)
  }

  /** Exact Jaccard-threshold similarity JOIN at scale via prefix
    * filtering (the SSJoin/All-Pairs family: Chaudhuri et al. ICDE'06,
    * Bayardo et al. WWW'07) — recall-1 near-dup pairs WITHOUT the
    * O(n²) cross join ngramJaccardPairs needs and WITHOUT the
    * probabilistic misses of MinHash banding. Returns (id_a, id_b, j),
    * identical to ngramJaccardPairs on any input.
    *
    * The filter: order the token universe globally by ascending
    * document frequency (rarest first, ties by token — a total order
    * both sides share). For J(A,B) >= t the overlap must satisfy
    * |A∩B| >= t·|∪| >= t·max(|A|,|B|) >= t·|A|, and a pair whose
    * overlap is >= o must share a token within the first |x|-o+1
    * tokens of EACH side's ordering (if all shared tokens sat past
    * that point, fewer than o would fit). So probing only each doc's
    * length |x| - ⌊t·|x|⌋ + 1 prefix generates a candidate SUPERSET —
    * ⌊·⌋ rather than the tight ⌈·⌉ deliberately: one token of margin
    * means fp jitter in t·|x| can never shorten the prefix below the
    * required length. Rarest-first ordering makes prefix buckets the
    * SMALLEST buckets in the corpus — the same reason the cost stays
    * bucket-bounded at 100 TB (cf. minhashPairs, whose buckets are
    * hash-random instead, trading exactness for fewer probes).
    *
    * Shuffle shape: df count (one agg on tok), per-doc rank (window
    * on doc_id — per-doc state only, no global sort), candidate
    * equi-join on tok, pair distinct, then exact-Jaccard verify joined
    * back on the (small) surviving pair set — every shuffle is on
    * narrow keyed rows; token arrays ride only the final verify join.
    * A size-compatibility prune (min(|A|,|B|) >= t·max - ε) drops
    * impossible pairs before the distinct; ε=1e-9 keeps integer-sized
    * boundary pairs (e.g. |A|=4, |B|=5 at t=0.8) from being rejected
    * by fp round-up of t·max, and only ever ADMITS candidates — the
    * verify is exact. */
  def prefixJaccardPairs(docs: DataFrame, threshold: Double,
      shingleN: Int = 1): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    // same blank-doc discipline as ngramJaccardPairs/minhashPairs:
    // content-empty docs are exact dedup's class, not near-dup's.
    // shingleN=1 is the token-set semantics the oracle spells; larger
    // n (discriminative shingles) is the production setting on corpora
    // whose token sets are non-discriminative — same reason
    // minhashPairs defaults to trigrams
    val t = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesOfTokens(col("toks"), shingleN).as("ts"))
      .filter(size(col("ts")) > 0)
    val dfreq = t.select(explode(col("ts")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))
    val prefix = t
      .select(col("doc_id"), size(col("ts")).as("n"), explode(col("ts")).as("tok"))
      .join(dfreq, "tok")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        col("n") - floor(lit(threshold) * col("n")).cast("int") + 1)
      .select(col("doc_id"), col("tok"), col("n"))
    val cand = prefix.select(col("doc_id").as("id_a"), col("tok"),
        col("n").as("na"))
      .join(prefix.select(col("doc_id").as("id_b"), col("tok"),
        col("n").as("nb")), Seq("tok"))
      .filter(col("id_a") < col("id_b") &&
        least(col("na"), col("nb")).cast("double") >=
          lit(threshold) * greatest(col("na"), col("nb")) - lit(1e-9))
      .select("id_a", "id_b").distinct()
    cand
      .join(t.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(t.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("ts_a"), col("ts_b")).as("j"))
      .filter(col("j") >= threshold)
  }

  /** Exact CONTAINMENT join: pairs where |A∩B|/|A| >= t — doc A's
    * token set is (nearly) contained in doc B's. The asymmetric
    * sibling of the Jaccard join: Jaccard misses a short quote inside
    * a long document (the union term drowns it); containment is how a
    * pipeline finds sub-document duplication, quotation, and
    * boilerplate embedding. Returns (id_a, id_b, containment) for
    * ordered pairs a != b (a is the contained side — both directions
    * of every doc pair are evaluated independently).
    *
    * Candidate generation is the asymmetric prefix filter: A probes
    * only its |A| - ⌊t·|A|⌋ + 1 RAREST tokens (same ⌊·⌋ fp margin as
    * prefixJaccardPairs — overlap >= ⌈t·|A|⌉ forces a shared token in
    * that prefix regardless of |B|), while the container side indexes
    * ALL its tokens (containment puts no lower bound on B's overlap
    * fraction, so B cannot be prefix-pruned). Probe cost is
    * rare-token-bounded; the index side is the full posting list —
    * the standard cost shape for containment joins (cf. the
    * SSJoin/All-Pairs family). Blank docs are excluded on both sides
    * (exact dedup's class). */
  def containmentPairs(docs: DataFrame, threshold: Double,
      shingleN: Int = 1): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val t = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesOfTokens(col("toks"), shingleN).as("ts"))
      .filter(size(col("ts")) > 0)
    val dfreq = t.select(explode(col("ts")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val exploded = t
      .select(col("doc_id"), size(col("ts")).as("n"), explode(col("ts")).as("tok"))
      .join(dfreq, "tok")
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))
    val probe = exploded
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        col("n") - floor(lit(threshold) * col("n")).cast("int") + 1)
      .select(col("doc_id").as("id_a"), col("tok"))
    val index = exploded.select(col("doc_id").as("id_b"), col("tok"))
    val cand = probe.join(index, Seq("tok"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val ts = t.repartition(par(t), col("doc_id"))
    cand
      .join(ts.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(ts.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ts_a"), col("ts_b"))).cast("double") /
          size(col("ts_a"))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Edit-distance fuzzy dedup: pairs whose normalized-text PREFIXES
    * are within `maxDist` Levenshtein edits — the character-level dedup
    * family (catches typo-level near-copies that token-set Jaccard
    * misses, e.g. OCR noise). The prefix bound caps the O(len²) DP per
    * pair; like ngramJaccardPairs this exact quadratic verify is for
    * bounded subsets — the scale path generates candidates with
    * MinHash/SimHash banding first and verifies survivors here. */
  def fuzzyPairs(docs: DataFrame, maxId: Long, maxDist: Int,
      prefixLen: Int = 40): DataFrame = {
    val t = docs.filter(col("doc_id") < maxId)
      .select(col("doc_id"),
        substring(normText(col("text")), 1, prefixLen).as("s"))
    val a = t.alias("a")
    val b = t.alias("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Sorted-neighborhood near-dup blocking (the merge/purge method,
    * Hernández & Stolfo SIGMOD'95): order the corpus by a blocking
    * key, slide a window of `window` consecutive positions, and
    * exact-Jaccard-verify only the in-window pairs — O(n·window)
    * candidates REGARDLESS of how skewed the corpus is, which makes it
    * the third member of the candidate-generation family: hash-random
    * buckets (minhashPairs) bound cost probabilistically, rarest-token
    * prefixes (prefixJaccardPairs) bound it by token rarity, and the
    * neighborhood bounds it unconditionally. The price is recall tied
    * to key quality: a true pair sorted further than `window`-1
    * positions apart is missed (multi-pass with different keys is the
    * classic remedy). Blocking key: (n_chars, doc_id) — near-dup texts
    * have near-equal lengths, and doc_id totalizes the order so the
    * pair set is deterministic on any engine.
    *
    * Scale shape: the global position comes from a range-partitioned
    * sort + zipWithIndex over NARROW (doc_id, n_chars) rows — two
    * passes, no single-task funnel (a global ROW_NUMBER() window would
    * pull the whole corpus through one task); candidates are one
    * explode(1..window-1) + equi-join on position (still narrow); the
    * surviving O(n·window) pair ids get token sets joined back with
    * the repartition-below-rename ReuseExchange discipline
    * (cf. minhashPairs), so the corpus tokenizes exactly once.
    * Each unordered pair arises from exactly one (position, offset),
    * so no distinct is needed. Returns (id_a, id_b, j). */
  def sortedNeighborhoodPairs(docs: DataFrame, threshold: Double,
      window: Int = 5): DataFrame = {
    require(window >= 2, s"window must cover at least 2 rows, got $window")
    val spark = docs.sparkSession
    val clean = docs.filter(length(trim(col("text"))) > 0)
    // narrow global index in blocking-key order (no single-task window)
    val keyed = clean.select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars"), col("doc_id"))
    val idxRdd = keyed.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(i, r.getLong(0))
    }
    val ids = spark.createDataFrame(idxRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rn",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val probes = ids
      .select(col("rn"), col("doc_id").as("id_x"))
      .withColumn("off", explode(sequence(lit(1), lit(window - 1))))
      .select((col("rn") + col("off")).as("rn_b"), col("id_x"))
    val pairIds = probes
      .join(ids.select(col("rn").as("rn_b"), col("doc_id").as("id_y")), "rn_b")
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
    val ts = clean.select(col("doc_id"), tokenSet(col("text")).as("ts"))
      .repartition(par(clean), col("doc_id"))
    pairIds
      .join(ts.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(ts.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .withColumn("j", jaccard(col("ts_a"), col("ts_b")))
      .filter(col("j") >= threshold)
      .select("id_a", "id_b", "j")
  }

  /** Near-dup CLUSTERS: connected components over a near-dup pair set,
    * labeling every doc with the minimum doc_id reachable through
    * near-dup edges (singletons label themselves). This is the step
    * that turns pairwise dedup output into an actionable keep/drop
    * decision: keep component == doc_id, drop the rest.
    *
    * Min-label propagation: each iteration is one join + one
    * aggregate (two shuffles) and halves the remaining label distance;
    * iterations = O(component diameter), and near-dup components are
    * shallow by construction (dup clusters are dense). The same
    * alternating propagate/aggregate shape is how large-scale CC is
    * run in practice (cf. the map-reduce CC literature); a fixpoint
    * check per iteration (empty "changed" set) terminates the loop.
    * localCheckpoint per iteration cuts the growing lineage — the
    * identical discipline to the GA generation loop. */
  def nearDupClusters(docs: DataFrame, maxId: Long, threshold: Double,
      maxIterations: Int = 20): DataFrame =
    clusterPairs(
      ngramJaccardPairs(docs, maxId, threshold).select(col("id_a"), col("id_b")),
      docs.filter(col("doc_id") < maxId).select(col("doc_id")),
      maxIterations)

  /** Connected components over an ARBITRARY near-dup pair set — the
    * production composition point: feed it `minhashPairs` /
    * `simhashPairs` / `embeddingNearDup` output at corpus scale (the
    * convenience overload above wires in the bounded exact generator
    * for oracle-checkable demos). `pairs` must carry (id_a, id_b);
    * `ids` the full id universe as a single `doc_id` column
    * (singletons label themselves). */
  def clusterPairs(pairs: DataFrame, ids: DataFrame,
      maxIterations: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // pair generation stays declarative (it IS a query); the label
    // LOOP runs on the RDD core like the cGA iteration driver — a CC
    // iteration is one co-partitioned join + one reduceByKey, and at
    // O(diameter) iterations per run the per-iteration Catalyst
    // planning would dominate the actual work (the same measurement
    // that moved Cga.runLoop; GraphX makes the identical trade).
    // partitions sized to the LABEL set, not the core count — a
    // 100-node component graph on 32 partitions pays 32 task launches
    // per tiny job (the manual twin of AQE's partition coalescing,
    // which RDD loops must do themselves); ~50k labels per partition.
    // Sizing costs one count() of the narrow id column — noise next
    // to the O(diameter) loop it right-sizes.
    val nIds = ids.count()
    // empty universe: nothing to label — return the empty relation
    // BEFORE building (and persisting) any loop state
    if (nIds == 0)
      return ids.select(col("doc_id"), col("doc_id").as("component"))
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (nIds / 50000L).toInt + 1))
    val part = new org.apache.spark.HashPartitioner(parts)
    val edges = pairs.select(col("id_a"), col("id_b")).as[(Long, Long)].rdd
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = ids.select(col("doc_id")).as[Long].rdd
      .map(id => (id, id)).partitionBy(part)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // min-label propagation: labels only ever DECREASE, so the label
    // sum is a strictly decreasing convergence witness — no extra
    // old-vs-new join needed per iteration
    var prevSum = labels.values.map(BigInt(_)).reduce(_ + _)
    var converged = false
    var it = 0
    while (!converged && it < maxIterations) {
      val viaNeighbor = edges.join(labels) // co-partitioned: narrow
        .map { case (_, (dst, comp)) => (dst, comp) }
      val next = labels.union(viaNeighbor)
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sum = next.values.map(BigInt(_)).reduce(_ + _)
      converged = sum == prevSum
      prevSum = sum
      labels.unpersist(blocking = false)
      labels = next
      it += 1
    }
    // hand the result its OWN storage before releasing the loop's:
    // localCheckpoint(eager) materializes the converged labels and
    // truncates their lineage, so unpersisting edges/labels neither
    // strands loop caches in the caller's session (the minhashPairs
    // round-2 leak, same discipline) nor leaves the returned frame
    // lazily recomputing O(diameter) iterations. The checkpoint
    // blocks belong to the result — the ContextCleaner reaps them
    // when the caller drops it, like any Dataset the caller cached.
    val out = labels.toDF("doc_id", "component").localCheckpoint(true)
    edges.unpersist(blocking = false)
    labels.unpersist(blocking = false)
    out
  }

  /** Embedding near-dup: pairs with cosine >= threshold, candidate-
    * generated by MULTI-TABLE random-hyperplane LSH (the
    * Similarity.lshTopK scheme), verified with exact cosine.
    *
    * Why multi-table: a single table of p planes finds a true pair at
    * angle θ with probability (1−θ/π)^p — at the default threshold
    * (cos 0.95, θ ≈ 0.32 rad) 12 planes collide with probability
    * ≈ 0.28, silently dropping ~72% of boundary near-dups. L
    * independent tables lift recall to 1−(1−p₁)^L while still scoring
    * only bucket-mates: the defaults here (8 planes × 8 tables) give
    * ≈ 0.99 at cos 0.95. `planes` trades candidate volume (halved per
    * plane on unstructured data) against per-table recall; `tables`
    * buys recall linearly in cost. DedupSpec asserts the recall floor
    * on pairs planted AT the threshold boundary.
    *
    * Shuffle discipline (same as minhashPairs): the bucket self-join
    * and the pair `distinct` run over NARROW (vec_id, table, bucket)
    * rows — vectors never ride the wide exchange; the explicit
    * repartition makes both self-join branches one ReuseExchange'd
    * subtree. Vectors are joined back onto the (small) surviving
    * candidate set for the exact verify. */
  def embeddingNearDup(emb: DataFrame, planes: Int = 8, tables: Int = 8,
      seed: Long = 42L, threshold: Double = 0.95, dim: Int = 64): DataFrame = {
    val rng = new java.util.Random(seed)
    val hyper = Array.fill(tables, planes, dim)(rng.nextGaussian())
    // the RAW float array feeds the native expressions directly:
    // DotProduct/CosineSim widen float elements exactly like the
    // transform(cast) spelling (bit-identical results, VectorOpsSpec),
    // while the HOF cast (a) runs interpreted and (b) gets DUPLICATED
    // into every one of the tables×planes dot products when the
    // optimizer collapses the projections — measured 500µs/row on the
    // gate shape, ~50× the arithmetic. Float arrays also halve the
    // join-back exchange bytes (guide §2.3, narrower types).
    val e = emb.select(col("vec_id"), col("embedding").as("e"))
    // ONE fused expression computes every table's bucket (identical
    // bits to the per-(table,plane) DotProduct subtree spelling —
    // HyperplaneBuckets doc): tables×planes separate fused loops in
    // one projection overflow the JIT's method-size budget and drop
    // the banding stage to interpreted bytecode
    // EXPLICIT partition counts (scale-adaptive: defaultParallelism
    // tracks the cluster) on the self-join/verify exchanges: these
    // stages are CPU-dense per byte (quadratic within-bucket pair
    // generation, per-pair cosine), and AQE's byte-targeted coalescing
    // would legally fold the tiny gate-scale exchanges to ONE
    // partition — serializing the pair evaluation on one core while
    // the rest idle. REPARTITION_BY_NUM pins the width.
    val par = emb.sparkSession.sparkContext.defaultParallelism
    val banded = e
      .select(col("vec_id"),
        posexplode(graft.functions.VectorOps
          .hyperplaneBuckets(col("e"), hyper)).as(Seq("t", "bucket")))
      .repartition(par, col("t"), col("bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    // narrow candidates; distinct collapses multi-table agreement so
    // every surviving pair is verified exactly once
    val cand = a.join(b,
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    // vector join-back: one exchange subtree (repartitioned BELOW the
    // renames) feeds both the id_a and id_b sides via ReuseExchange
    val ev = e.repartition(par, col("vec_id"))
    cand
      .join(ev.select(col("vec_id").as("id_a"), col("e").as("e_a")), "id_a")
      .join(ev.select(col("vec_id").as("id_b"), col("e").as("e_b")), "id_b")
      .withColumn("cos", Similarity.cosine(col("e_a"), col("e_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Substring-overlap candidate pairs from winnowing fingerprints
    * (the FOURTH candidate-generation family, after MinHash banding,
    * SimHash chunks, and sorted-neighborhood windows): two documents
    * pair when they share ≥ `minShared` sampled k-gram fingerprints —
    * which the winnowing guarantee ties to shared token RUNS of
    * ≥ window+k−1, so this finds partial/quoted duplication that
    * whole-document similarity scores dilute away (a 10-line license
    * header inside two otherwise-different files).
    *
    * Scale shape: the self-join key is the fingerprint hash — bucket
    * sizes are bounded by dropping fingerprints seen in more than
    * `maxDf` documents first (boilerplate phrases pair everything and
    * discriminate nothing — the banding family's blank-doc filter
    * generalized to frequency), and the sampled density is only
    * 2/(window+1) per token to begin with. The df filter is a COUNT
    * window over the same fp_hash partitioning the self-join needs —
    * one explicit repartition below everything, so the expensive
    * fingerprint pipeline (md5 per k-gram) feeds every consumer
    * through ONE ReuseExchange-collapsed exchange instead of running
    * once per join branch.
    *
    * Returns (id_a, id_b, shared) — exact shared-fingerprint counts,
    * engine-portable (the oracle reproduces them verbatim). */
  def winnowingOverlapPairs(docs: DataFrame, k: Int = 3, window: Int = 4,
      minShared: Int = 2, maxDf: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fps = TextAnalysis.winnowingFingerprints(docs, k, window)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .repartition(par(docs), col("fp_hash"))
    val keyed = fps
      .withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("fp_hash"))))
      .filter(col("__df") <= maxDf)
      .select(col("fp_hash"), col("doc_id"))
    keyed.select(col("fp_hash"), col("doc_id").as("id_a"))
      .join(keyed.select(col("fp_hash"), col("doc_id").as("id_b")),
        "fp_hash")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Semantic dedup (the SemDeDup recipe, Abbas et al. 2023): cluster
    * embeddings with a sampled k-means coarse quantizer — the IVF
    * machinery `Similarity.ivfTopK` already trains — and compare pairs
    * ONLY within a cell. Near-identical semantic content lands in the
    * same cell, so candidate cost drops from n² to Σ|cell|² ≈ n²/nCells
    * (with nCells sized ~√n at 100 TB, n·√n total — and each cell's
    * quadratic work is an independent task, so skewed cells parallelize
    * across cores, not against a driver). The declared approximation:
    * a true pair split across a cell boundary is missed — the gate row
    * carries an in-plan recall column vs the exact generator (the
    * embeddingNearDup discipline), and the spec plants boundary pairs.
    *
    * Distinct from `embeddingNearDup` (hyperplane LSH): LSH recall is
    * tunable per pair via table count, but its buckets ignore the
    * corpus's own density; k-means cells adapt to where the mass
    * actually sits — the two are complementary candidate generators
    * over the same exact-cosine verify.
    *
    * `nAssign` is the soft-assignment width (multi-probe): each vector
    * joins its top-nAssign cells, so a true pair near a cell boundary
    * is found whenever ANY of their cells overlap. Measured on the
    * UNSTRUCTURED gate embeddings (the worst case for density-adaptive
    * cells — no cluster structure to adapt to): recall 0.34 hard
    * (nAssign=1), 0.75 top-2, 0.96 top-3, at ≤ nAssign² the candidate
    * cost; on clustered data (the SemDeDup regime, DedupSpec fixture)
    * recall is 1.0 at any width. Duplicate matches through two shared
    * cells collapse in the final distinct (cos is a pure function of
    * the pair).
    *
    * Returns (id_a, id_b, cos) with cos ≥ threshold. */
  def semanticNearDup(emb: DataFrame, threshold: Double = 0.95,
      nCells: Int = 16, nAssign: Int = 2, seed: Long = 42L,
      trainIters: Int = 8, sampleSize: Int = 512): DataFrame = {
    require(nAssign >= 1 && nAssign <= nCells,
      s"nAssign=$nAssign must be in [1, nCells=$nCells]")
    // raw float arrays for the per-row dots and the pair cosine (the
    // embeddingNearDup rationale); the cast survives ONLY on the
    // training-sample input, whose driver-side decode needs doubles
    val e = emb.select(col("vec_id"), col("embedding").as("e"))
    val sample = Similarity.trainingSample(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e")),
      "vec_id", "e", sampleSize, seed)
    // empty corpus: nothing to train on, nothing to pair — return the
    // empty pair set like every other dedup family member
    if (sample.isEmpty)
      return e.select(col("vec_id").as("id_a"),
        col("vec_id").as("id_b"), lit(0.0d).as("cos"))
        .where(lit(false))
    val centroids = Similarity.kmeans(sample, nCells, trainIters, seed)
    def dot(v: Column, c: Array[Double]): Column =
      graft.functions.VectorOps.dotProduct(v,
        array(c.toIndexedSeq.map(lit): _*))
    val sims = array(centroids.toIndexedSeq.map(c => dot(col("e"), c)): _*)
    // top-nAssign cells per row WITHOUT a window: sort (−sim, idx)
    // structs ascending, slice the head — all per-row expressions
    // (sims bound first, the ivfTopK discipline); then one explicit
    // cell repartition feeds both self-join branches via ReuseExchange
    val assigned = e.withColumn("sims", sims)
      .withColumn("cells",
        slice(transform(
          array_sort(zip_with(col("sims"),
            sequence(lit(1), lit(centroids.length)),
            (s, i) => struct((-s).as("ns"), i.as("i")))),
          x => x("i")), 1, nAssign))
      .drop("sims")
      .select(col("vec_id"), col("e"), explode(col("cells")).as("cell"))
      // explicit width: the within-cell self-join is CPU-dense per
      // byte (Σ|cell|² cosines) — AQE's byte-targeted coalescing would
      // serialize it at gate scale (the embeddingNearDup rationale)
      .repartition(emb.sparkSession.sparkContext.defaultParallelism,
        col("cell"))
    val a = assigned.alias("a")
    val b = assigned.alias("b")
    a.join(b, col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** EXACT substring-level dedup (the "Deduplicating Training Data
    * Makes Language Models Better" pattern, Lee et al. ACL'22): find
    * every maximal token span that occurs MORE THAN ONCE corpus-wide
    * at length-`L` granularity. Whole-document dedup (exact/MinHash/
    * SimHash) misses the dominant duplication mode in web corpora —
    * long shared passages embedded in otherwise-distinct pages — and
    * winnowing only *fingerprints* overlap; this op localizes it
    * exactly: a token run shared between any two documents (or
    * repeated within one) is covered by duplicated L-grams, and
    * merging their overlapping-or-abutting extents reconstructs the
    * maximal duplicated region ±(L−1) boundary tokens — the same
    * granularity bound the suffix-array formulation has at its merge
    * threshold.
    *
    * Dataflow (2 exchanges total, gram TEXT never shuffles):
    *  1. per doc, all L-token-gram xxhash64 keys with positions — a
    *     narrow codegen'd projection (rows are 24-byte
    *     (doc, pos, hash) triples, not L-token strings);
    *  2. corpus-wide multiplicity as COUNT over the hash partitioning
    *     (a window on the SAME exchange a groupBy would need — no
    *     second shuffle, no join back, the winnowing-overlap df-cap
    *     discipline); keep hashes seen more than once;
    *  3. per-doc gaps-and-islands merge (lag + running sum on the
    *     doc partitioning) → maximal spans.
    * Duplication is decided on the 64-bit hash: at 10¹² grams the
    * expected number of colliding PAIRS is n²/2⁶⁵ ≈ 10⁻²·n/corpus —
    * negligible, and a collision only widens a span by one false
    * gram; pair two seeds (128 bits) if even that matters.
    *
    * Returns (doc_id, span_start, span_end, n_dup_grams): 1-based
    * inclusive token positions of each maximal duplicated span. */
  def duplicatedSpans(docs: DataFrame, L: Int = 5): DataFrame = {
    require(L >= 2, s"gram length must be >= 2 tokens, got $L")
    val bound = docs.select(col("doc_id"),
      filter(tokens(col("text")), t => length(t) > 0).as("toks"))
    val hashed = bound.select(col("doc_id"),
      when(size(col("toks")) >= L,
        transform(sequence(lit(1), size(col("toks")) - (L - 1)),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(L))))))
        .otherwise(array().cast("array<bigint>")).as("ghs"))
    // posexplode_OUTER, not posexplode: the inner explode makes
    // InferFiltersFromGenerate add `size(ghs) > 0 AND isnotnull(ghs)`
    // and push it to the SCAN — which inlines the whole tokenize+
    // gram-hash expression into a filter lambda where `split` is no
    // longer bound, re-evaluating it per sequence element: a hidden
    // per-doc O(tokens²) that dominated this op (6.8 s → 1.3 s at
    // sf0.1 from this line). The outer explode infers nothing; short
    // docs surface one NULL row each, dropped by a post-explode
    // filter that cannot be pushed below the Generate.
    val grams = hashed
      .select(col("doc_id"), posexplode_outer(col("ghs")).as(Seq("p0", "gh")))
      .filter(col("gh").isNotNull)
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("gh"))
    val dup = grams
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("gh"))))
      .filter(col("cnt") > 1)
    // islands: consecutive duplicated starts ≤ L apart overlap or abut
    // — one contiguous duplicated block either way (first row: lag is
    // NULL, NULL <= L is NULL, otherwise-branch opens the span)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wDoc) <= L, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("span_id", sum(col("brk")).over(wDoc))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (L - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_dup_grams"))
  }

  /** Per-document substring-duplication summary — the removal-policy
    * input (cut the spans, or drop docs whose duplicated fraction
    * exceeds a threshold). Span token counts come from
    * `duplicatedSpans` (maximal ⇒ disjoint ⇒ a plain sum); the join
    * back to the corpus is a hash join keyed on doc_id (span side ≪
    * corpus, but corpus-sized in the worst case — deliberately NOT
    * broadcast). Docs with no duplication report zeros. */
  def substringDupStats(docs: DataFrame, L: Int = 5): DataFrame = {
    val perDoc = duplicatedSpans(docs, L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1L).as("n_dup_tokens"))
    docs
      .select(col("doc_id"),
        size(filter(tokens(col("text")), t => length(t) > 0))
          .cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        try_divide(coalesce(col("n_dup_tokens"), lit(0L)).cast("double"),
          col("n_tokens").cast("double")).as("dup_fraction"))
  }

  /** Exact all-pairs cosine over a bounded id range — the O(subset²)
    * ground truth for `embeddingNearDup`'s recall (the embedding
    * family's twin of `ngramJaccardPairs`). Keep maxId small. */
  def exactCosinePairs(emb: DataFrame, maxId: Long, threshold: Double): DataFrame = {
    // raw float arrays: CosineSim widens element-wise exactly like the
    // transform(cast) spelling (see embeddingNearDup) — half the
    // nested-loop join's broadcast bytes, zero interpreted HOFs
    val e = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding").as("e"))
    // the subset reads as ONE scan partition (one parquet file), so
    // the nested-loop pair evaluation would run as a single task —
    // O(subset²) cosine work on one core while 31 idle. Spreading the
    // STREAM side by key splits the pair evaluation across the
    // session's parallelism; one tiny exchange of ≤maxId narrow rows
    // buys it (same pairs, same per-row arithmetic — layout only).
    val a = e.repartition(par(emb), col("vec_id")).alias("a")
    val b = e.alias("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
