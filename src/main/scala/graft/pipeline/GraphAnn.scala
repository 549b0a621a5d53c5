package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Graph-based approximate nearest neighbors — the fourth ANN regime
  * beside hashing (LSH), partitioning (IVF), and compression (PQ):
  * a k-NN GRAPH over the corpus, navigated by best-first expansion.
  * Production vector search converged on this family (HNSW/NSG —
  * Malkov & Yashunin arXiv:1603.09320) because a good neighbor's
  * neighbors are the highest-recall-per-probe candidate generator
  * known: each query scores O(hops·beam·degree) vectors regardless of
  * corpus size.
  *
  * Spark-first decomposition (no reference counterpart —
  * SURVEY.md §2.3 extension):
  *
  *  - GRAPH CONSTRUCTION is distributed NN-Descent (Dong et al.
  *    WWW'11): start from random bucket-mates and repeatedly offer
  *    every vertex its neighbors' neighbors, keeping the best k. Each
  *    round is two relational joins (edge ⋈ edge for candidates, one
  *    vector join-back to score) + the Similarity heap/window top-k —
  *    candidate volume is bounded by n·k² per round, never n², and
  *    the graph relation (n·k edges) is the only state.
  *  - QUERY is beam search flattened to relational hops: a broadcast
  *    query relation scores its seed set, then each hop joins the
  *    current per-query beam to the graph's adjacency, scores the
  *    (beam·degree)-bounded frontier, and re-prunes to the beam. A
  *    driver loop of `hops` DataFrame transforms — no per-query
  *    driver work, queries advance in bulk.
  *
  * The declared approximation: recall depends on graph quality and
  * hop budget; the gate row carries an in-plan recall column vs the
  * exact generator (the sim_topk_lsh discipline) and GraphAnnSpec
  * pins a recall floor. Like every family member, navigation ranks by
  * exact cosine on the true vectors — only WHICH vectors get scored
  * is approximate.
  */
object GraphAnn {

  /** Directed k-NN graph (id, nid, cos): for each vector, its best-k
    * discovered neighbors after `iters` NN-Descent rounds.
    *
    * Init: vectors land in ~(k+1)-sized buckets under two independent
    * hash bucketings (all pairs within a bucket — the bucket width
    * bounds the quadratic term at O(n·k) pairs), giving every vertex
    * ~2k starting candidates without assuming contiguous ids.
    * Each round: the UNDIRECTED adjacency (u→v plus v→u — NN-Descent's
    * reverse-neighbor trick: u being close to v is evidence v's
    * neighbors are close to u) self-joins to propose neighbors'
    * neighbors, new pairs are scored by one vector join-back, and
    * each vertex keeps the best k of (current ∪ proposed). The graph
    * localCheckpoints per round — iterative lineage would otherwise
    * replay every prior round (the Cga discipline).
    *
    * 100 TB posture: candidates per round ≤ n·(2k)² narrow rows before
    * the per-vertex top-k prune (heap phase runs map-side), edge state
    * is n·k rows, and the vector join-backs are plain hash joins on a
    * repartitioned relation ReuseExchange collapses. No all-pairs
    * anywhere; rounds are a fixed small count (NN-Descent converges in
    * 4-6 on real data). */
  def nnDescentGraph(emb: DataFrame, k: Int = 8, iters: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"graph degree k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    import emb.sparkSession.implicits._
    val e = Similarity.asDouble(emb).repartition(col("vec_id"))
    val n = e.count()
    if (n == 0)
      return e.select(col("vec_id").as("id"), col("vec_id").as("nid"),
        lit(0.0d).as("cos")).where(lit(false))
    val nBuckets = math.max(1L, n / (k + 1))

    def topKPerVertex(edges: DataFrame): DataFrame = {
      val scored = edges
        .select(col("id").as("qid"), col("nid"), col("cos")).as[Score]
      Similarity.finishTopK(Similarity.partialTopK(scored, k), k)
        .select(col("qid").as("id"), col("nid"), col("rn"))
    }

    // (id, nid, rn) — cos re-derived on demand from vectors; carrying
    // rn keeps the edge relation narrow between rounds
    var graph = topKPerVertex(
        bucketPairs(e, nBuckets, seed)
          .unionByName(bucketPairs(e, nBuckets, seed + 7919))
          .dropDuplicates("id", "nid"))
      .localCheckpoint(true)

    val ev = e.repartition(col("vec_id"))
    var it = 0
    while (it < iters) {
      val und = graph.select(col("id"), col("nid"))
        .unionByName(graph.select(col("nid").as("id"), col("id").as("nid")))
        .dropDuplicates("id", "nid")
      // neighbors' neighbors: u—v and v—w propose (u, w)
      val proposed = und.alias("x").join(und.alias("y"),
          col("x.nid") === col("y.id") && col("x.id") =!= col("y.nid"))
        .select(col("x.id").as("id"), col("y.nid").as("nid"))
        .unionByName(und)
        .dropDuplicates("id", "nid")
      // one scoring pass over the candidate set: vectors join back on
      // both endpoints (the embeddingNearDup join-back discipline)
      val scored = proposed
        .join(ev.select(col("vec_id").as("id"), col("e").as("e_a")), "id")
        .join(ev.select(col("vec_id").as("nid"), col("e").as("e_b")), "nid")
        .select(col("id"), col("nid"),
          Similarity.cosine(col("e_a"), col("e_b")).as("cos"))
        .filter(col("cos").isNotNull)
      graph = topKPerVertex(scored).localCheckpoint(true)
      it += 1
    }
    // return with exact cos attached (one final join-back)
    graph
      .join(ev.select(col("vec_id").as("id"), col("e").as("e_a")), "id")
      .join(ev.select(col("vec_id").as("nid"), col("e").as("e_b")), "nid")
      .select(col("id"), col("nid"),
        Similarity.cosine(col("e_a"), col("e_b")).as("cos"))
  }

  /** Graph-navigated top-k for each query id < maxQueryId: build (or
    * take) a k-NN graph, then run `hops` rounds of relational beam
    * search — score the seeds, expand every query's current best
    * `beam` vertices through the adjacency, score the new frontier,
    * re-prune. Returns (qid, nid, rn), self-matches excluded.
    *
    * Seeds are one hash bucket's worth of vertices shared by all
    * queries (HNSW's fixed entry point, relationally: a broadcast-able
    * seed relation crossed with the query set). Per query per hop the
    * scored set is ≤ beam·k vertices, so total scored work is
    * O(q·hops·beam·k) — independent of corpus size, the graph
    * family's defining property. */
  /** Undirected adjacency of a directed k-NN graph, repartitioned on
    * the expansion key and pinned — build it ONCE per served index
    * (the serving cache's natural unit) so repeated queries skip the
    * symmetrize shuffle. */
  def undirected(graph: DataFrame): DataFrame = {
    val g = graph.select(col("id"), col("nid"))
    g.unionByName(g.select(col("nid").as("id"), col("id").as("nid")))
      .dropDuplicates("id", "nid")
      .repartition(col("id"))
      .localCheckpoint(true)
  }

  def graphTopK(emb: DataFrame, maxQueryId: Long, k: Int,
      graphK: Int = 8, iters: Int = 3, beam: Int = 12, hops: Int = 3,
      seed: Long = 42L,
      prebuilt: Option[DataFrame] = None,
      prebuiltUndirected: Option[DataFrame] = None): DataFrame = {
    require(beam >= k, s"beam=$beam must be >= k=$k")
    import emb.sparkSession.implicits._
    val und = prebuiltUndirected.getOrElse(undirected(
      prebuilt.getOrElse(nnDescentGraph(emb, graphK, iters, seed))))
    val e = Similarity.asDouble(emb)
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    Similarity.finishTopK(
      beamSearch(e, q, und, beam, hops, entrySeeds(e, graphK + 1, seed))
        .as[Score], k)
  }

  /** Pairs within a hash bucket over `rel` (vec_id, e), scored — one
    * bucketing's worth of candidates, O(|rel|·bucketWidth) pairs.
    * Shared by NN-Descent init and [[graphExtend]]'s batch-internal
    * candidate generation. */
  private def bucketPairs(rel: DataFrame, nBuckets: Long,
      whichSeed: Long): DataFrame = {
    val b = rel.select(col("vec_id"), col("e"),
      pmod(xxhash64(col("vec_id") + whichSeed), lit(nBuckets)).as("bkt"))
    b.alias("a").join(b.alias("b"),
        col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("id"), col("b.vec_id").as("nid"),
        Similarity.cosine(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos").isNotNull)
  }

  /** Shared entry points: the vertices of one hash bucket (~nSeeds of
    * them) — every query starts somewhere fixed and cheap (HNSW's
    * fixed entry point, relationally). */
  private def entrySeeds(e: DataFrame, nSeeds: Int, seed: Long): DataFrame =
    e.select(col("vec_id").as("nid"))
      .orderBy(pmod(xxhash64(col("nid") + seed), lit(1000000007L)))
      .limit(nSeeds)

  /** The relational beam-search loop shared by [[graphTopK]] (query
    * serving) and [[graphExtend]] (neighbor discovery for inserted
    * vertices): score the seeds, expand every query's current best
    * `beam` vertices through the adjacency, score the new frontier,
    * re-prune. Returns the final per-query beam (qid, nid, cos) —
    * ≤ beam rows per qid, candidates drawn from `cands` (vec_id, e). */
  private def beamSearch(cands: DataFrame, q: DataFrame, und: DataFrame,
      beam: Int, hops: Int, seeds: DataFrame): DataFrame = {
    import cands.sparkSession.implicits._
    def score(cand: DataFrame): DataFrame = cand
      .join(cands.select(col("vec_id").as("nid"), col("e").as("ne")), "nid")
      .join(broadcast(q), "qid")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qe"), col("ne")).as("cos"))
      .filter(col("cos").isNotNull)

    def topBeam(scored: DataFrame): DataFrame = {
      val s = scored.as[Score]
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
      Similarity.partialTopK(s, beam).toDF()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= beam)
        .select("qid", "nid", "cos")
    }

    var best = topBeam(score(q.select(col("qid")).crossJoin(seeds)))
      .localCheckpoint(true)
    var hop = 0
    while (hop < hops) {
      val frontier = best.select(col("qid"), col("nid").as("id"))
        .join(und, "id")
        .select(col("qid"), col("nid"))
        .dropDuplicates("qid", "nid")
      // the union keeps already-found vertices competitive: beam
      // search must never forget a good hit while exploring
      best = topBeam(score(frontier).unionByName(best)
          .dropDuplicates("qid", "nid"))
        .localCheckpoint(true)
      hop += 1
    }
    best
  }

  /** Per-vertex top-k prune KEEPING the score column — the degree
    * re-prune [[graphExtend]] applies after linking. */
  private def topKeep(edges: DataFrame, k: Int): DataFrame = {
    import edges.sparkSession.implicits._
    val s = edges.select(col("id").as("qid"), col("nid"), col("cos")).as[Score]
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    Similarity.partialTopK(s, k).toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid").as("id"), col("nid"), col("cos"))
  }

  /** Incrementally INSERT a new vector batch into an existing k-NN
    * graph — the [[Similarity.pqIndexExtend]] contract for the graph
    * family: O(batch) search work, no rebuild, the already-linked
    * corpus is touched only where it gains a reverse edge.
    *
    * The HNSW insertion recipe, relationally and in bulk:
    *  1. each new vertex beam-searches the EXISTING graph for its
    *     nearest linked neighbors (new→old candidates; per vertex the
    *     scored set is O(hops·beam·degree), independent of corpus
    *     size);
    *  2. batch-internal candidates come from two seeded hash
    *     bucketings of the batch itself (new→new — without these a
    *     batch of mutual nearest neighbors would only link outward);
    *  3. every new vertex keeps its best k (beam ∪ batch candidates);
    *  4. links go BIDIRECTIONAL: each edge is offered in reverse, and
    *     every RECEIVING vertex re-prunes to degree k over (existing
    *     edges ∪ offered reverse edges) — an old edge evicted by a
    *     closer new vertex is the graph improving, exactly what
    *     NN-Descent's reverse-neighbor trick does in-build. Vertices
    *     receiving no reverse edge pass through untouched (the
    *     left_anti split keeps the re-prune window O(batch·k), not
    *     O(n)).
    *
    * `emb` must carry the vectors of the graph's vertices; `newEmb`
    * the batch (ids disjoint from the graph's). Returns the extended
    * directed graph (id, nid, cos) over old ∪ new vertices, degree
    * ≤ k everywhere.
    *
    * Declared approximation (the family's usual one, GraphAnnSpec
    * pins it): insertion order matters up to beam-search tie-breaks —
    * extend(A∘B) sees A linked while B inserts, extend(A∪B) searches
    * the base graph for both, so edge sets can differ on ties; recall
    * floors hold for every order (the spec's grown-vs-rebuilt bound),
    * and periodic nnDescentGraph rebuilds absorb the drift exactly as
    * pqIndex rebuilds absorb code drift. */
  def graphExtend(graph: DataFrame, emb: DataFrame, newEmb: DataFrame,
      k: Int = 8, beam: Int = 12, hops: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"graph degree k must be >= 1, got $k")
    require(beam >= k, s"beam=$beam must be >= k=$k")
    val e = Similarity.asDouble(emb)
    val nb = Similarity.asDouble(newEmb)
    val nNew = nb.count()
    if (nNew == 0) return graph
    // 1. new→old: beam search over the existing adjacency
    val q = nb.select(col("vec_id").as("qid"), col("e").as("qe"))
    val beamBest = beamSearch(e, q, undirected(graph), beam, hops,
        entrySeeds(e, k + 1, seed))
      .select(col("qid").as("id"), col("nid"), col("cos"))
    // 2. new→new: bucket-mate pairs within the batch
    val nBuckets = math.max(1L, nNew / (k + 1))
    val batchCand = bucketPairs(nb, nBuckets, seed)
      .unionByName(bucketPairs(nb, nBuckets, seed + 7919))
    // 3. each new vertex keeps its best k
    val newAdj = topKeep(beamBest.unionByName(batchCand)
        .dropDuplicates("id", "nid"), k)
      .localCheckpoint(true)
    // 4. bidirectional link + receiver re-prune, affected rows only
    val reverse = newAdj.select(col("nid").as("id"),
      col("id").as("nid"), col("cos"))
    val affected = newAdj.select("id")
      .unionByName(reverse.select("id")).distinct()
    val untouched = graph.join(affected, Seq("id"), "left_anti")
    val repruned = topKeep(
      graph.join(affected, Seq("id"), "left_semi")
        .unionByName(newAdj).unionByName(reverse)
        .dropDuplicates("id", "nid"), k)
    untouched.unionByName(repruned)
  }
}
