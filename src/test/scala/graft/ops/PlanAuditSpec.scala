package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Mechanical plan-quality audit: the 100 TB posture claims in the
  * Scaladoc (filter pushdown, column pruning, broadcast dims,
  * single-aggregate shapes) asserted against the ACTUAL physical
  * plans, so a refactor that silently de-optimizes a query fails CI
  * rather than a future benchmark. */
class PlanAuditSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def countOccurrences(s: String, pat: String): Int =
    pat.r.findAllIn(s).length

  test("q1: both predicates and the 3-column projection reach the parquet scan") {
    val p = plan(Relational.q1FilterProject(spark, dir))
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThan(l_discount,0.05)") &&
      p.contains("EqualTo(l_returnflag,R)"), p)
    // pruned read schema: exactly the projected + filtered columns
    assert(!p.contains("l_extendedprice") && !p.contains("l_shipdate"),
      "scan reads columns the query never uses")
  }

  test("q4/q16: dimension joins broadcast — the fact side never shuffles for a join") {
    for (q <- Seq(Relational.q4JoinChain _, Relational.q16StarJoin _)) {
      val p = plan(q(spark, dir))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"),
        "a dimension join fell back to sort-merge")
    }
  }

  test("q19: semi join builds on the broadcast filtered key set") {
    val p = plan(Relational.q19SemiJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin LeftSemi"), p)
  }

  test("q2/q22: one hash-aggregate pair, one data exchange (plus the output sort)") {
    for (q <- Seq(Relational.q2Agg _, Relational.q22Pivot _)) {
      val p = plan(q(spark, dir))
      // partial+final = exactly 2 HashAggregate nodes
      assert(countOccurrences(p, "\\(\\d+\\) HashAggregate") == 2, p)
      // exactly 2 exchanges: hash (aggregate) + range (ORDER BY)
      assert(countOccurrences(p, "\\(\\d+\\) Exchange") == 2, p)
    }
  }

  test("q13: genome fitness stays inside whole-stage codegen") {
    // AQE finalizes the physical plan lazily — execute, then audit the
    // final plan for fused codegen spans
    val df = Relational.q13GenomeFitness(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(N)" prefixes mark WholeStageCodegen membership; the fitness
    // projection must carry one (the HOF aggregate/transform spelling
    // does not — lambdas are not codegen-supported)
    assert("\\*\\(\\d+\\) Project \\[.*popcount_array".r.findFirstIn(p).isDefined,
      p.take(800))
  }

  test("q6: top-k uses a ranking window, not a global sort of the fact table") {
    val p = plan(Relational.q6TopK(spark, dir))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    // the rn <= 2 filter must sit above the window, pre-pruning rows
    // before the final output sort
    assert(p.contains("WindowGroupLimit") || p.contains("Filter"), p)
  }

  test("sga mix: one hash exchange, no range/global sort") {
    import SparkSpec.session.implicits._
    val cfg = graft.core.GaConfig(nBits = 64, popSize = 64,
      tournamentSize = 5, numPartitions = 2, seed = 1, maxGenerations = 1)
    val pop = graft.sga.Sga.evaluate(graft.sga.Sga.initPopulation(spark, cfg))
    val p = plan(graft.sga.Sga.mix(pop, cfg, 0).toDF())
    assert(countOccurrences(p, "\\(\\d+\\) Exchange") == 1, p)
    assert(!p.contains("rangepartitioning"),
      "mix must hash-repartition, not range-sort globally")
  }

  test("similarity: query side broadcasts; candidates never cross-join") {
    val p = plan(graft.pipeline.Similarity.bruteForceTopK(
      Tables.embeddings(spark, dir), 5L, 3))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"),
      "top-k degenerated into a cartesian product")
  }

  test("curation funnel: two data shuffles end-to-end, dedup keys broadcast back") {
    val p = plan(graft.pipeline.Curation.curate(
      Tables.documents(spark, dir)))
    // dedup aggregate + final per-lang stats = 2 hash exchanges; the
    // output ORDER BY adds one range exchange; the keep-id semi join
    // must be a broadcast, never a shuffle
    assert(countOccurrences(p, "\\(\\d+\\) Exchange") <= 3, p)
    assert(p.contains("BroadcastHashJoin LeftSemi"), p)
  }

  test("q23: the median window ranks aggregated (flag, price) rows, not the raw fact table") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LogicalWindow}
    val lp = Relational.q23MedianRank(spark, dir).queryExecution.optimizedPlan
    val windows = lp.collect { case w: LogicalWindow => w }
    assert(windows.nonEmpty, lp.toString)
    // every window's input subtree must contain the pre-aggregate —
    // the round-2 plan sorted RAW fact rows in 3 window partitions
    windows.foreach { w =>
      assert(w.find { case _: Aggregate => true; case _ => false }.isDefined,
        s"window input must be the aggregated relation:\n$lp")
    }
  }

  test("minhash: the banded self-join reuses one exchange instead of recomputing signatures") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // at sort-merge scale (broadcast off = the 100 TB shape) both
      // sides of the band-bucket self-join must come from ONE shuffle
      val df = graft.pipeline.Dedup.minhashPairs(
        Tables.documents(spark, dir), shingleN = 1, k = 16, bands = 4,
        threshold = 0.9)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // TWO reuses: the banded self-join's signature pipeline AND the
      // token-set join-back (id_a/id_b sides share one tokenization)
      val reuses = countOccurrences(p, "ReusedExchange") +
        countOccurrences(p, "ReusedQueryStage")
      assert(reuses >= 2, s"expected 2 reused exchanges, got $reuses:\n" +
        p.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q28: the salt rides the join exchange — no single-task key funnel") {
    val df = Relational.q28SkewJoin(spark, dir)
    val p = plan(df)
    // the skew demo must run in the shuffle-join regime (broadcast has
    // no shuffle to skew) ...
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    // ... and the join-side hash partitioning must include the salt,
    // so a hot l_returnflag value spreads across `salts` partitions
    // instead of funneling through one task
    assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(p).isDefined,
      p.take(2000))
  }

  test("q29: the range join runs as a binned equi-join, never a nested loop") {
    val p = plan(Relational.q29RangeJoin(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "range join degenerated into an O(n*m) nested loop:\n" + p.take(1500))
    // the bin key must be a real equi-join key
    assert(p.contains("__bin"), p.take(1500))
  }

  test("domain cap: the rank<=k filter is pushed into partitions (WindowGroupLimit)") {
    val p = plan(graft.ops.PipelineQueries.pipelineDomainCap(spark, dir))
    assert(p.contains("WindowGroupLimit"),
      "per-domain cap lost its group-limit pushdown:\n" + p.take(1200))
  }

  test("stream enrich: the static dim joins by broadcast, the stream never shuffles for it") {
    val p = plan(graft.ops.StreamQueries.enrich(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the static dim fell back to a shuffle join")
  }

  test("sample_hash: the sampling predicate reaches the scan pipeline as a filter") {
    val p = plan(graft.pipeline.Sampling.hashSample(
      Tables.documents(spark, dir), "doc_id", 100))
    assert(p.contains("Filter"), p)
    assert(!p.contains("Exchange"), "a pure filter must not shuffle")
  }

  test("sample_stratified: the per-group quota is pushed into partitions (WindowGroupLimit)") {
    val p = plan(graft.pipeline.Sampling.stratifiedSample(
      Tables.documents(spark, dir), "lang", "doc_id", 25))
    assert(p.contains("WindowGroupLimit"),
      "stratified sample lost its group-limit pushdown:\n" + p.take(1200))
  }

  test("prefix/incremental similarity joins carry no cartesian or nested-loop node") {
    // the whole point of both operators is replacing the O(n²) join
    // with equi-joins on narrow keys — a planner regression to a
    // cartesian/BNLJ would still produce correct rows, slowly
    for (q <- Seq(
        PipelineQueries.dedupPrefixJaccard _,
        PipelineQueries.dedupIncremental _)) {
      val p = plan(q(spark, dir))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "similarity join regressed to an all-pairs plan:\n" + p.take(1500))
    }
  }

  test("stats_heavy_hitters: top-k is TakeOrderedAndProject, never a global sort") {
    val p = plan(PipelineQueries.statsHeavyHitters(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k lost its per-partition limit:\n" + p.take(1200))
  }

  test("stats_winsorize: the quantile limits join back by broadcast") {
    val p = plan(graft.pipeline.Normalize.winsorizeByGroup(
      Tables.documents(spark, dir), "lang", "n_chars"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "limits join fell back to a corpus shuffle")
  }

  test("stream_asof: the interval-closed dim joins by broadcast with no state") {
    // as-of enrichment is equality-on-key + interval containment: the
    // planner must pick BroadcastHashJoin on the equi conjunct (the
    // range conjuncts ride along as join condition) — a SortMergeJoin
    // would shuffle the event stream per micro-batch, a nested loop
    // would mean the equi key was lost
    val p = plan(StreamQueries.asof(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "as-of join lost its equi-key:\n" + p.take(1500))
  }

  test("profile: all columns profile in ONE aggregation over one scan") {
    // executedPlan prints each scan once (formatted mode lists nodes
    // twice: tree + details); multi-distinct must rewrite through a
    // single Expand, not one scan per column
    val p = PipelineQueries.pipelineProfile(spark, dir)
      .queryExecution.executedPlan.toString
    assert(countOccurrences(p, "Scan parquet") == 1,
      "profile re-scans the corpus per column:\n" + p.take(1500))
  }

  test("histogram: the bounds row broadcasts; the corpus never sort-merges") {
    val p = plan(PipelineQueries.statsHistogram(spark, dir))
    assert(!p.contains("SortMergeJoin"),
      "1-row bounds joined by shuffle:\n" + p.take(1500))
  }

  test("q30: the bucketed fact-fact join runs with NO exchange on either side") {
    // force the shuffle-join regime a real fact-fact join lives in —
    // a broadcast would hide whether bucketing removed the shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Relational.q30BucketJoin(spark, dir)
      df.collect() // materialize so AQE finalizes THIS QueryExecution
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1500))
      // both scans must consume bucket files directly: no exchange may
      // partition on a JOIN key (the post-join aggregation's exchange
      // on o_orderstatus is the one legitimate shuffle)
      assert(countOccurrences(p, "Bucketed: true") >= 2, p.take(1500))
      assert(!p.contains("Exchange hashpartitioning(o_orderkey") &&
        !p.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed join still shuffles an input:\n" + p.take(1500))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_q30_orders")
      spark.sql("DROP TABLE IF EXISTS graft_q30_lineitem")
    }
  }

  test("cooccurrence: pairs are generated per row — no positional self-join") {
    val p = plan(PipelineQueries.textCooccur(spark, dir))
    assert(!p.contains("Join"),
      "co-occurrence must not self-join the corpus on position:\n" +
        p.take(1500))
    // top-k over the aggregated set, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("winnowing overlap: one fingerprint exchange feeds both self-join branches") {
    // broadcast off = the 100 TB sort-merge shape (the minhash audit's
    // discipline): both self-join branches must read ONE shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = PipelineQueries.dedupWinnow(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        "fingerprint pipeline is computed once per self-join branch:\n" +
          p.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("pctrank: the prefix spelling ranks with NO window operator anywhere") {
    val p = plan(PipelineQueries.statsPctrankByLang(spark, dir))
    assert(!p.contains("Window"),
      "the no-funnel spelling must not re-introduce a window:\n" +
        p.take(1500))
  }

  test("behavior funnel: each frontier joins then re-aggregates on the user key") {
    val p = plan(BehaviorQueries.funnel(spark, dir))
    // the per-step frontier stays a hash aggregate (partial+final) —
    // no window or global sort anywhere in the cascade
    assert(!p.contains("Window"), p.take(1500))
  }

  test("pipeline_mix: the whole mix is scans + filters + union — zero data exchanges") {
    // strip the output ORDER BY (presentation, not the operator): audit
    // the mix itself, whose Lehmer predicates are scan-level filters
    val docs = Tables.documents(spark, dir)
    val p = plan(graft.pipeline.Sampling.mixCorpora(Seq(
      ("a", docs.filter(org.apache.spark.sql.functions.col("lang") === "en"), 800),
      ("b", docs.filter(org.apache.spark.sql.functions.col("lang") === "de"), 500)),
      "doc_id"))
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("text_pack: one shard exchange feeds the packing window — never a global sort") {
    val p = plan(graft.pipeline.TextAnalysis.packSequences(
      Tables.documents(spark, dir), budget = 256, shards = 8))
    // exactly one exchange (hashpartitioning by shard, shown in the
    // formatted plan's Arguments line) + the window's within-partition
    // sort; no rangepartitioning (global sort) anywhere
    assert(countOccurrences(p, "\\(\\d+\\) Exchange") == 1, p.take(1500))
    assert(countOccurrences(p, "hashpartitioning\\(shard") == 1, p.take(1500))
    assert(!p.contains("rangepartitioning"), p.take(1500))
  }

  test("pipeline_e2e: stage boundaries materialize; the composed tail plan stays bounded") {
    // the multi-consumer stage outputs (cleaned/exact/near/decon/
    // capped/mixed) MUST be localCheckpoint boundaries: composed lazily
    // the funnel re-expands its upstream once per consumer branch —
    // measured 1035 Exchange nodes in the un-checkpointed plan vs a
    // handful after. The audit pins both halves of that fix:
    val p = plan(graft.ops.PipelineQueries.pipelineE2e(spark, dir))
    // (a) boundaries materialized: the final plan reads the prior
    // stage as an existing-RDD scan, not a re-derivation (no parquet
    // scan of documents should survive into the tail)
    assert(p.contains("ExistingRDD") || p.contains("RDDScan"),
      "stage boundaries lost their localCheckpoint:\n" + p.take(1500))
    // (b) the tail (pack + metadata join + final sort) census: one
    // shard window exchange, the pack/metadata joins, one range
    // partition for the ORDER BY — measured 6 at round 10
    val n = countOccurrences(p, "\\(\\d+\\) Exchange")
    assert(n <= 8, s"pipeline_e2e tail exchange count grew to $n:\n" + p.take(3000))
    assert(countOccurrences(p, "rangepartitioning") <= 1, p.take(2000))
    // per-stage plan claims (broadcast blocklist, WindowGroupLimit
    // cap, zero-exchange mix, single-exchange pack) are audited on the
    // stage operators' own tests in this suite — the boundaries make
    // them invisible here by design.
  }

  test("dedup_substring: no generate-pruning filter re-derives the gram " +
      "pipeline at the scan (the posexplode_outer fix)") {
    // the inner-posexplode spelling let InferFiltersFromGenerate push
    // `size(ghs) > 0` to the scan, inlining tokenize+gram-hash into a
    // filter lambda with `split` unbound — per-element re-evaluation,
    // a hidden per-doc O(tokens²) measured at 5× the op's true cost.
    // Pin the fix mechanically: below the Generate there must be NO
    // Filter whose condition mentions the gram transform (xxhash64 /
    // split), and the tokenizing projection must appear exactly once.
    val p = plan(graft.pipeline.Dedup.duplicatedSpans(
      graft.ops.Tables.documents(spark, dir), L = 5))
    val filterConds = p.linesIterator.filter(_.startsWith("Condition")).toSeq
    assert(filterConds.nonEmpty, "expected at least the gh/cnt filters")
    assert(filterConds.forall(c => !c.contains("xxhash64")),
      "a Filter condition re-derives the gram hashes:\n" +
        filterConds.mkString("\n"))
    assert(countOccurrences(p, "split\\(lower\\(trim") <= 2,
      "the tokenizing expression is inlined beyond its legitimate " +
        "project site(s):\n" + p.take(2000))
  }

  test("changeFeed append fast path: shuffle-free — per-version deltas " +
    "resolve to direct scans of the added dirs, tags are projections") {
    import org.apache.spark.sql.functions._
    import SparkSpec.session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pacdf")
      .resolve("t").toString
    val vt = graft.sources.VersionedTable
    vt.init(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    vt.append(spark, root, Seq((3L, "c")).toDF("id", "s"),
      expectedVersion = 0)
    vt.append(spark, root, Seq((4L, "d")).toDF("id", "s"),
      expectedVersion = 1)
    val feed = vt.changeFeed(spark, root, 0)
    val p = plan(feed)
    assert(!p.contains("Exchange"),
      "the append-only feed shuffled — O(delta) fast path regressed:\n" +
        p.take(1500))
    assert(feed.count() == 4)
    // the keyed GENERAL path (a rewrite in range) pays exactly ONE
    // join's exchanges per rewritten version, never more
    vt.merge(spark, root,
      Seq((2L, "b2", "U")).toDF("id", "s", "op"), "id")
    val keyed = vt.changeFeed(spark, root, 3, key = Some("id"))
    val kp = plan(keyed)
    assert(countOccurrences(kp, "Exchange") <= 4,
      s"keyed single-version feed shuffled more than one join's worth:\n" +
        kp.take(1500))
  }
}
