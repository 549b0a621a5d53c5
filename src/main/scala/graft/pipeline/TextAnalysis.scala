package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Text analysis for training-data curation (SURVEY.md §2.3): token
  * counting, quality scoring, heuristic language ID, content
  * fingerprinting. Every op is a narrow, codegen'd projection — the
  * shape that streams at scan speed over 100 TB.
  */
object TextAnalysis {

  /** Whitespace + regex ("BPE-ish": word pieces vs punctuation runs)
    * token counts. */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      length(col("text")).as("n_chars_measured"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]+"), lit(0)))
        .as("n_subtokens"))
  }

  /** Quality signals: mean token length, punctuation density, stopword
    * ratio. Each ratio is a single IEEE division of exact integers —
    * correctly rounded, so bit-identical across engines — and is kept
    * as DOUBLE (decimal output columns canonicalize differently across
    * the oracle engines' client stacks, round-1 driver gate). */
  def qualityScores(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks,
      t => array_contains(array(stopwords.map(lit): _*), t))).cast("double")
    val punct = size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
      .cast("double")
    // try_divide: ANSI-safe NULL on empty docs (zero chars/tokens)
    // instead of DIVIDE_BY_ZERO — scraped corpora contain empties
    docs.select(
      col("doc_id"),
      try_divide(length(col("text")).cast("double"), nTok).as("mean_tok_len"),
      try_divide(punct, length(col("text")).cast("double")).as("punct_ratio"),
      try_divide(stopHits, nTok).as("stop_ratio"))
  }

  /** Per-language stopword lexicons for the heuristic language ID.
    * Tiny by design — the heuristic is "count function-word hits per
    * language, argmax, fixed precedence on ties". */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una"),
  )

  /** Heuristic language ID: stopword-hit counts per language (over the
    * token multiset), predicted language = first max in lexicon order,
    * "und" when nothing hits. */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    def hits(lex: Seq[String]): Column =
      size(filter(toks, t => array_contains(array(lex.map(lit): _*), t)))
    val hitCols = lexicons.map { case (lang, lex) => lang -> hits(lex) }
    val best = hitCols.map(_._2).reduce((a, b) => greatest(a, b))
    // first-max-wins in declared lexicon order (en outermost)
    val predFirst = hitCols.reverse.foldLeft(lit("und")) { case (els, (lang, h)) =>
      when(h === best && best > 0, lit(lang)).otherwise(els)
    }
    docs.select(col("doc_id") +: hitCols.map { case (l, c) => c.as(s"${l}_hits") }
      :+ predFirst.as("pred_lang"): _*)
  }

  /** Corpus-level top-k token bigrams — the n-gram counting half of
    * corpus analysis (vocabulary/contamination checks). Per-doc bigram
    * generation is a narrow codegen'd projection; the count is one
    * partial+final aggregate; the top-k ORDER BY runs over the
    * (already tiny) aggregated set. */
  def topBigrams(docs: DataFrame, topK: Int): DataFrame = {
    val toks = tokens(col("text"))
    // zip tokens with their own 1-shifted tail rather than indexing via
    // a transform lambda: element_at(split(...), i) inside a lambda
    // re-evaluates the regex split PER ELEMENT (quadratic per doc —
    // measured 6 s at sf0.1); zip_with evaluates each array input once
    // per row. The shorter shifted side is null-padded by zip_with;
    // those sentinel pairs are dropped by the higher-order filter.
    val shifted = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val bigrams = filter(
      zip_with(toks, shifted,
        (x, y) => when(y.isNull, lit(null)).otherwise(concat_ws(" ", x, y))),
      b => b.isNotNull)
    docs.select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(topK)
  }

  /** Per-document (w1, w2) bigram pairs via the same zip-shift trick
    * as [[topBigrams]] (never index inside a lambda — quadratic). */
  private def bigramPairs(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val shifted = slice(toks, lit(2), greatest(size(toks) - 1, lit(0)))
    val pairs = filter(
      zip_with(toks, shifted, (x, y) =>
        when(y.isNull, lit(null))
          .otherwise(struct(x.as("w1"), y.as("w2")))),
      b => b.isNotNull)
    docs.select(col("doc_id"), explode(pairs).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
  }

  /** CCNet-style statistical quality filter (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): train an add-one-smoothed BIGRAM language model on a
    * REFERENCE corpus (the curated in-domain sample — CCNet uses
    * Wikipedia), score every document by its mean log2 conditional
    * probability P(w_i | w_{i-1}) = (c(w1,w2)+1) / (c(w1)+|V|), and
    * verdict against `threshold`: 'keep' / 'drop' / 'short' (no
    * bigrams to score). Higher = more reference-like; OOV bigram
    * count rides along as its own signal.
    *
    * Scale posture: the model is two aggregates over the REFERENCE
    * corpus only (bounded by design — a curated sample, not the
    * 100 TB crawl); scoring shuffles the corpus bigrams against the
    * model on (w1, w2) and the contexts on w1 — AQE broadcasts either
    * side when it fits and both degrade to co-partitioned shuffles
    * when it doesn't. The vocabulary size joins as a broadcast 1-row
    * frame, so the whole op is ONE declarative plan with no
    * driver-side model and no collect. Per-bigram log2 is a single
    * transcendental over exact integer counts; consumers gating on
    * the score compare against a threshold, where the ±1-ulp
    * cross-engine wiggle of log2 is immaterial. */
  def lmScore(docs: DataFrame, ref: DataFrame,
      threshold: Double): DataFrame = {
    val refBigrams = bigramPairs(ref)
    val model = refBigrams.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
    val contexts = refBigrams.groupBy("w1")
      .agg(count(lit(1)).as("c1"))
    val vocab = ref
      .select(explode(tokens(col("text"))).as("w"))
      .agg(count_distinct(col("w")).as("v_size"))
    val scored = bigramPairs(docs)
      .join(model, Seq("w1", "w2"), "left")
      .join(contexts, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        when(col("c12").isNull, 1L).otherwise(0L).as("oov"),
        log2((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v_size"))
            .cast("double")).as("lp"))
    val perDoc = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("oov")).as("oov_bigrams"),
      avg(col("lp")).as("lm_score"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov_bigrams"), lit(0L)).as("oov_bigrams"),
        col("lm_score"),
        when(col("n_bigrams").isNull, lit("short"))
          .when(col("lm_score") >= threshold, lit("keep"))
          .otherwise(lit("drop")).as("verdict"))
  }

  /** PII redaction (the C4-style scrub pass): per-document counts of
    * email / IPv4 matches and the post-redaction length. Patterns are
    * deliberately RE2-compatible (no lookarounds, no backrefs) so the
    * DuckDB oracle runs them verbatim; per-row regex work, no shuffle.
    * The redacted text itself is produced the same single-pass way a
    * production scrub would (nested regexp_replace) — the gate row
    * surfaces its length rather than the string to keep output columns
    * scalar and collation-free. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactionStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pattern), lit(0)))
        .cast("long").as("n_ipv4"),
      length(regexp_replace(
        regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>")).cast("long").as("clean_len"))

  /** Inverted-index term statistics: for the topK terms by document
    * frequency, (term, df, tf) where df = #docs containing the term and
    * tf = total occurrences. This is the index-BUILD dataflow (the
    * grouped posting-list aggregation without materializing the lists):
    * explode tokens → one partial+final aggregate keyed by (doc, term)
    * to collapse within-doc repeats cheaply (map-side combine does most
    * of it), then by term. Counts are exact BIGINTs; the topK boundary
    * is total-ordered by (df DESC, tf DESC, term). */
  def postings(docs: DataFrame, topK: Int): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("n")).as("tf"))
      .orderBy(col("df").desc, col("tf").desc, col("term"))
      .limit(topK)

  /** Repetition signals (the Gopher-style repetition filters): distinct
    * token ratio and the share of the document owned by its single most
    * frequent token — low distinct ratio / high top-token share marks
    * degenerate boilerplate and generation loops. Computed per row with
    * NO shuffle: the multiplicity scan is O(distinct·n) inside the doc,
    * embarrassingly parallel — the alternative (explode + groupBy(doc,
    * token) + window max) costs two full-corpus shuffles at 100 TB for
    * the same numbers. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val distinctToks = array_distinct(toks)
    val nTok = size(toks).cast("double")
    val maxMult = array_max(
      transform(distinctToks, d => size(filter(toks, x => x === d))))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      try_divide(size(distinctToks).cast("double"), nTok).as("distinct_ratio"),
      try_divide(maxMult.cast("double"), nTok).as("top_token_share"))
  }

  /** Context-window packing: split each document's token stream into
    * fixed-size chunks — the sequence-packing step that turns a curated
    * corpus into training windows. Pure column expressions over a bound
    * token column (one scan, no shuffle, no UDF): chunk i is tokens
    * [i·size+1, (i+1)·size], the final chunk ragged. Emits
    * (doc_id, chunk_idx, n_chunk_tokens, chunk_text). */
  def chunkTokens(docs: DataFrame, chunkSize: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ((size(col("toks")) - 1) / lit(chunkSize)).cast("int")),
          i => slice(col("toks"), i * chunkSize + 1, lit(chunkSize))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }

  /** Content fingerprints: exact MD5 of normalized text + a modular
    * rolling hash over token lengths (Karp-Rabin structure, exact
    * int64 arithmetic in both engines). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(normText(col("text"))).as("content_md5"),
      rollingFingerprint(tokens(col("text"))).as("rolling_fp"))

  /** Winnowing document fingerprints (the MOSS algorithm, Schleimer et
    * al. SIGMOD'03): hash every token k-gram, slide a window of
    * `window` consecutive k-gram hashes, and keep the minimum of each
    * window (ties to the smallest position). Guarantee: any shared
    * token run of length ≥ window + k − 1 between two documents yields
    * at least one SHARED fingerprint — substring-granularity overlap
    * detection that whole-document shingling (MinHash) structurally
    * misses, at an expected density of only 2/(window+1) fingerprints
    * per position.
    *
    * Engine-portable construction, so the output hash-gates: k-gram
    * hash = the first 10 hex chars of md5 (40 bits, exact in any
    * engine); window minima are taken over the single int64 key
    * h·2²⁰ + pos — the lexicographic (hash, position) order without a
    * struct comparator, valid while docs stay under 2²⁰ = 1M k-grams
    * (CHECKED: an oversize doc trips raise_error instead of silently
    * corrupting every downstream overlap result — at 100 TB, chunk
    * longer docs upstream first). The whole selection is PER ROW —
    * k-gram keys and each window's array_min are array expressions on
    * the document's own row, so there is NO per-doc window funnel and
    * no shuffle before the final DISTINCT: the round-8 Window spelling
    * shuffled+sorted every k-gram row on doc_id and was 3× slower at
    * identical output (BENCH text_winnow 2.30 s → this spelling).
    *
    * Returns (doc_id, fp_pos, fp_hash) — fp_pos is the 1-based k-gram
    * position the fingerprint was sampled at (MOSS reports positions
    * for match localization). */
  /** Sliding minimum over every length-`w` window of an int64 array,
    * as ⌈log₂ w⌉+1 whole-array zip_with passes (the sparse-table
    * doubling trick — min is idempotent, so the final step may overlap
    * ranges): after the pass covering span s, element i holds
    * min(arr[i..i+s−1]); the closing pass joins spans at offset w−s.
    * Windows truncated by the array end fall back to the elements that
    * exist (coalesce), so element 1 of a short array is the whole-array
    * min. The naive spelling — array_min(slice(arr, i, w)) per start —
    * allocates a fresh w-array per POSITION and was the dominant cost
    * of the round-8 winnowing row; this is O(m·log w) with no
    * per-element allocation. */
  private def slidingMin(arr: Column, w: Int): Column = {
    def shifted(a: Column, d: Int): Column =
      slice(a, lit(d + 1), greatest(size(a) - d, lit(0)))
    def zipMin(a: Column, d: Int): Column =
      zip_with(a, shifted(a, d), (x, y) => least(x, coalesce(y, x)))
    var span = 1
    var cur = arr
    while (span * 2 <= w) { cur = zipMin(cur, span); span *= 2 }
    if (span < w) zipMin(cur, w - span) else cur
  }

  def winnowingFingerprints(docs: DataFrame, k: Int = 3,
      window: Int = 4): DataFrame = {
    require(k >= 1, s"k-gram size must be >= 1, got $k")
    require(window >= 1, s"window must be >= 1, got $window")

    val bound = docs.select(col("doc_id"),
      filter(tokens(col("text")), t => length(t) > 0).as("toks"))
    val kgrams = bound.select(col("doc_id"),
      when(size(col("toks")) >= k,
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
        .otherwise(array().cast("array<string>")).as("kgrams"))
    // the 2^20 position-packing limit is guarded INSIDE the packing
    // lambda (one int compare per k-gram): a separate filter on the
    // k-gram count gets predicate-pushed below the projection, where
    // Catalyst inlines the alias and re-runs the whole k-gram
    // construction once more just to size it (+70% measured)
    val keyed = kgrams.select(col("doc_id"),
      size(col("kgrams")).as("m"),
      transform(col("kgrams"), (g, idx) =>
        when(idx >= 1048575,
          raise_error(concat(
            lit("winnowingFingerprints: doc "), col("doc_id").cast("string"),
            lit(" has > 2^20-1 k-grams — position packing would corrupt; " +
              "chunk long documents upstream"))))
          .otherwise(conv(substring(md5(g), 1, 10), 16, 10).cast("long") *
            1048576L + idx + 1L)).as("keys"))
    // window minima per start position 1..max(m−window+1, 1); a doc
    // with 0 < m < window yields one whole-doc minimum (slidingMin's
    // truncation fallback), m = 0 slices to an empty array — no
    // k-grams, no prints
    keyed.select(col("doc_id"),
        explode(slice(slidingMin(col("keys"), window), lit(1),
          when(col("m") > 0, greatest(col("m") - (window - 1), lit(1)))
            .otherwise(lit(0)))).as("sel"))
      .filter(col("sel").isNotNull)
      .distinct()
      .select(col("doc_id"), (col("sel") % 1048576L).as("fp_pos"),
        // integer `div`, NOT `/`: the key tops 2^60 and a double
        // quotient would lose low bits past 2^53
        expr("sel div 1048576").as("fp_hash"))
  }

  /** Vocabulary coverage / out-of-vocabulary rates: build the corpus's
    * own top-`vocabSize` token vocabulary (total-ordered cutoff, the
    * heavy-hitters discipline), then score every document by how much
    * of it the vocabulary covers. The first question a tokenizer
    * budget decision asks — a corpus whose OOV mass is high under the
    * planned vocab wastes context window on fallback bytes.
    *
    * Exact integer counts; the only float is the final per-doc
    * division (one correctly-rounded op), so the DOUBLE hash-gates.
    *
    * At 100 TB: one count aggregate + TakeOrderedAndProject for the
    * vocab (k-sized driver state), vocab broadcast back, one per-doc
    * aggregate — the corpus never shuffles wide. */
  def vocabOov(docs: DataFrame, vocabSize: Int = 100): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Corpus-wide skip-gram co-occurrence counts: ordered token pairs
    * (a, b) with b at most `window` positions after a — the
    * co-occurrence matrix construction under every count-based
    * embedding (GloVe/PMI) and collocation miner. Generalizes
    * topBigrams (window = 1 is exactly it).
    *
    * Scale shape: pair generation is PER ROW — each distance d zips
    * the bound token array with its own d-shifted tail (zip_with
    * evaluates each input once; the shorter side's null padding is
    * dropped), so the corpus is never self-joined on position and the
    * only shuffle is the final partial+final count; top-k runs on the
    * aggregated set under a total order. */
  def cooccurrence(docs: DataFrame, window: Int = 2,
      topK: Int = 20): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val bound = docs.select(tokens(col("text")).as("toks"))
    val pairArrays = (1 to window).map { d =>
      val shifted = slice(col("toks"), lit(d + 1),
        greatest(size(col("toks")) - d, lit(0)))
      filter(
        zip_with(col("toks"), shifted,
          (x, y) => when(y.isNull, lit(null))
            .otherwise(concat_ws(" ", x, y))),
        b => b.isNotNull)
    }
    bound.select(explode(pairArrays.reduce(concat(_, _))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }

  /** Token-budget SEQUENCE PACKING — assign whole documents to
    * training sequences of ~`budget` tokens (the example-packing step
    * between curation and the trainer: short docs share a context
    * window instead of wasting it on padding). Documents are dealt
    * into `shards` pseudo-random shards by a Lehmer hash of `doc_id`
    * (the Sampling hash — deterministic, engine-portable), ordered
    * within each shard by the same hash (a reproducible corpus
    * shuffle), and packed greedily: a doc opens a new sequence when
    * the tokens before it fill the current budget. Whole docs are
    * never split; a sequence may overshoot by at most one document
    * (the standard greedy-packing contract — truncation is the
    * trainer's policy decision, not the packer's).
    *
    * Scale shape: the running prefix sum is a window PARTITIONED BY
    * shard — parallelism = `shards`, each shard's funnel is
    * |corpus|/shards rows, and shards can be sized to the cluster
    * (contrast with a single global ORDER BY cumsum, which funnels
    * the corpus through one task). Emits (doc_id, shard, seq_idx,
    * n_tokens), hash-gated by a DuckDB twin running the identical
    * integer arithmetic. */
  def packSequences(docs: DataFrame, budget: Int, shards: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(shards > 0, "shard count must be positive")
    val P = Sampling.P
    val A = Sampling.A
    val h = (col("doc_id") % P) * A % P * A % P
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    docs.select(col("doc_id"), h.as("__h"),
        pmod(h, lit(shards.toLong)).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("seq_idx",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens"))
          / budget.toLong))
      .select("doc_id", "shard", "seq_idx", "n_tokens")
  }

  /** Conjunctive keyword search — the retrieval half of the postings
    * op (`postings` builds the index statistics; this executes the
    * classic AND query): for each named query, the documents
    * containing EVERY query term, ranked by total term frequency
    * (exact integer score — the log-free core of BM25-style ranking,
    * chosen so the gate hash-matches; idf weights multiply in
    * per-term without changing the dataflow).
    *
    * At 100 TB: query terms are a literal relation — the corpus term
    * stream hits a BROADCAST hash join (the inverted-index seek,
    * spelled as a semi-structured probe: only rows whose term is in
    * some query survive the map side), then one partial+final
    * aggregate keyed (query, doc). The ranked relation entering the
    * window is candidate-sized (≤ Σ df over query terms, never the
    * corpus), and the rank≤k predicate pushes into WindowGroupLimit.
    *
    * Output: (qid, doc_id, score, rank), rank 1-based per query. */
  def searchConjunctive(docs: DataFrame,
      queries: Seq[(String, Seq[String])], k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.forall(_._2.nonEmpty), "every query needs terms")
    require(k > 0, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (q, ts) => ts.map(t => (q, t.toLowerCase)) }
      .distinct.toDF("qid", "term")
    val qsizes = queries
      .map { case (q, ts) => (q, ts.map(_.toLowerCase).distinct.size.toLong) }
      .toDF("qid", "n_terms")
    val matched = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .join(broadcast(qterms), "term")
      .groupBy(col("qid"), col("doc_id"))
      .agg(countDistinct(col("term")).as("n_matched"),
        count(lit(1)).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    matched.join(broadcast(qsizes), "qid")
      .filter(col("n_matched") === col("n_terms"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("score"), col("rank"))
  }

  /** Corpus-frequency boilerplate removal — the CCNet/RefinedWeb
    * "line dedup" pattern (drop lines repeated across many documents:
    * headers, footers, cookie banners, license blurbs) re-expressed
    * over deterministic token chunking, since this corpus has no line
    * structure. Boilerplate is DEFINED by corpus-wide repetition: a
    * chunk whose document frequency exceeds `maxDf` is removed from
    * every document, and each document is reassembled from its
    * surviving chunks in original order. Documents left with zero
    * chunks drop out entirely (the fully-boilerplate page).
    *
    * Scale shape (100 TB): the blocklist is SMALL by construction —
    * mass above a df threshold concentrates on few distinct texts —
    * so the per-chunk filter is a broadcast LEFT ANTI join against
    * the corpus-sized chunk relation. Total cost: the df aggregate
    * (one key-partitioned shuffle with map-side partial counts, μ+σ
    * bounded by distinct-chunk count, not corpus size) plus the
    * per-document regroup. Reassembly uses sort_array over collected
    * (idx, text) structs — no per-document Window funnel.
    *
    * Emits (doc_id, n_kept_chunks, clean_text), hash-gated by a
    * DuckDB twin (string_agg ORDER BY chunk_idx).
    */
  def boilerplateRemoval(docs: DataFrame, chunkSize: Int,
      maxDf: Int): DataFrame = {
    require(maxDf >= 1, "maxDf must be at least 1")
    // one explicit chunk_text exchange BELOW both consumers: the df
    // aggregate and the anti-join probe otherwise each re-run the
    // tokenize+chunk scan (measured: two single-task ~0.3 s stages per
    // rep at gate scale — and at corpus scale, two full scans).
    // ReuseExchange collapses them, so the corpus chunks exactly once;
    // the df aggregate's shuffle was already chunk-keyed, so this adds
    // no net exchange. Width pinned scale-adaptively (the Dedup.par
    // rationale: byte-targeted AQE coalescing must not serialize the
    // chunk aggregate).
    val chunks = chunkTokens(docs, chunkSize)
      .select("doc_id", "chunk_idx", "chunk_text")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("chunk_text"))
    val blocklist = chunks
      .groupBy("chunk_text")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDf)
      .select("chunk_text")
    chunks
      .join(broadcast(blocklist), Seq("chunk_text"), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept_chunks"),
        sort_array(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
          .as("cs"))
      .select(col("doc_id"), col("n_kept_chunks"),
        concat_ws(" ", transform(col("cs"), c => c("chunk_text")))
          .as("clean_text"))
  }
}
