package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** (query id, neighbor id, cosine) — the scored-pair row. */
case class Score(qid: Long, nid: Long, cos: Double)

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.3; no reference counterpart).
  *
  * Scale design:
  *  - the QUERY side is broadcast (queries are few; candidates are the
  *    100 TB side and never shuffle for the join);
  *  - top-k is two-phase: a per-partition k-heap (mapPartitions — the
  *    genuine imperative case) prunes each partition to ≤ q·k rows, and
  *    a final window over ≤ partitions·q·k rows finishes exactly. A
  *    single global Window.partitionBy(qid) would funnel every
  *    candidate row through q reducers — the classic top-k skew trap;
  *  - the LSH variant buckets candidates by random-hyperplane signs so
  *    only same-bucket candidates are scored (recall < 1, the knob is
  *    `planes`).
  */
object Similarity {

  /** Cosine similarity of two float/double arrays — the native fused
    * CosineSim expression (graft.functions.VectorOps). NULL for
    * zero-norm vectors (the try_divide discipline). The HOF spelling
    * (`try_divide(aggregate(zip_with(...)), ...)`) computes identical
    * bits (VectorOpsSpec asserts it) but lambda expressions are not
    * codegen-supported and would run the scoring loop interpreted. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosineSim(a, b)

  private[pipeline] def asDouble(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))

  /** The `n` vectors whose ids Lehmer-hash smallest — the bounded,
    * seeded, deterministic training sample every quantizer here uses
    * (IVF cells, PQ codebooks, embedding k-means, semantic dedup).
    *
    * Selection is the same criterion the previous
    * `orderBy(hash).limit(n).collect()` spelling planned as
    * TakeOrdered, with an id tie-break making the order TOTAL (the
    * window spelling left hash ties to partition layout). The
    * execution shape is the round-9 advice: a treeAggregate of
    * per-partition bounded heaps, merged executor-side in a tree — the
    * driver receives exactly n rows ONCE, where TakeOrdered's final
    * merge hands it n·partitions rows (cosmetic at bench configs,
    * unbounded at a 10⁵-partition corpus scan). Deterministic under
    * any partitioning: "n smallest under a total order" is
    * associative and commutative, so the merge tree's shape cannot
    * change the result. */
  private[pipeline] def trainingSample(df: DataFrame, idCol: String,
      vecCol: String, n: Int, seed: Long): Array[Array[Double]] = {
    import df.sparkSession.implicits._
    type Entry = (Long, Long, Array[Double])
    // max-heap on (hash, id): head = current worst of the kept n
    val ord = Ordering.by[Entry, (Long, Long)](e => (e._1, e._2))
    val rows = df.select(
        pmod(xxhash64(col(idCol) + seed), lit(1000000007L)).as("_1"),
        col(idCol).cast("long").as("_2"), col(vecCol).as("_3"))
      .as[(Long, Long, Seq[Double])]
    def insert(h: scala.collection.mutable.PriorityQueue[Entry],
        e: Entry) = {
      if (h.size < n) h.enqueue(e)
      else if (ord.lt(e, h.head)) { h.dequeue(); h.enqueue(e) }
      h
    }
    val heap = rows.rdd.treeAggregate(
      scala.collection.mutable.PriorityQueue.empty[Entry](ord))(
      (h, r) => insert(h, (r._1, r._2, r._3.toArray)),
      (a, b) => { b.foreach(insert(a, _)); a })
    heap.toArray.sortBy(e => (e._1, e._2)).map(_._3)
  }

  /** All (query, candidate) cosine scores; query side broadcast. */
  private def scores(emb: DataFrame, maxQueryId: Long): Dataset[Score] = {
    import emb.sparkSession.implicits._
    val e = asDouble(emb)
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qe"), col("e")).as("cos"))
      // zero-norm vectors score NULL (try_divide); drop them before the
      // non-nullable Score decode — "no direction" can't rank anyway
      .filter(col("cos").isNotNull)
      .as[Score]
  }

  /** Exact brute-force cosine top-k for each query id < maxQueryId.
    * Baseline & oracle twin; the LSH route below is the scale path. */
  def bruteForceTopK(emb: DataFrame, maxQueryId: Long, k: Int): DataFrame =
    finishTopK(partialTopK(scores(emb, maxQueryId), k), k)

  /** Phase 1: per-partition top-k heaps — narrow, bounds the data that
    * reaches the final window to partitions·q·k rows. */
  private[pipeline] def partialTopK(s: Dataset[Score], k: Int): Dataset[Score] = {
    import s.sparkSession.implicits._
    s.mapPartitions { it =>
      // total order: higher cos wins, ties broken by smaller nid —
      // identical to the final window's (cos DESC, nid ASC)
      val ord = Ordering.by[Score, (Double, Long)](sc => (-sc.cos, sc.nid))
      val heaps = scala.collection.mutable.Map[Long, scala.collection.mutable.PriorityQueue[Score]]()
      it.foreach { sc =>
        val h = heaps.getOrElseUpdate(sc.qid,
          scala.collection.mutable.PriorityQueue.empty[Score](ord))
        if (h.size < k) h.enqueue(sc)
        else if (ord.lt(sc, h.head)) { h.dequeue(); h.enqueue(sc) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  /** Phase 2: exact finish over the pruned rows. */
  private[pipeline] def finishTopK(s: Dataset[Score], k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    s.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "rn")
  }

  /** IVF (inverted-file) ANN top-k — the coarse-quantizer scale path
    * next to LSH: k-means centroids partition the corpus into cells;
    * a query probes only its `nprobe` nearest cells, so the scored
    * fraction is ~nprobe/nCells of the corpus.
    *
    * Scale shape: the quantizer trains on a BOUNDED driver-side sample
    * (the standard IVF recipe — at 100 TB you sample the corpus, never
    * scan it, to fit 10^2..10^5 centroids); cell assignment is a pure
    * codegen'd expression (nCells dot products + argmin — centroids
    * ship as literals, same discipline as the LSH hyperplanes); the
    * probe join is an equi-join on cell id with the tiny query side
    * broadcast. No cross join anywhere.
    */
  def ivfTopK(emb: DataFrame, maxQueryId: Long, k: Int,
      nCells: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      trainIters: Int = 8, sampleSize: Int = 512, dim: Int = 64): DataFrame = {
    import emb.sparkSession.implicits._
    val e = asDouble(emb)
    // --- train the coarse quantizer on a bounded, seeded sample ---
    val sample = trainingSample(e, "vec_id", "e", sampleSize, seed)
    val centroids = kmeans(sample, nCells, trainIters, seed)
    // --- cell assignment as a declarative argmin expression ---
    def dot(v: Column, c: Array[Double]): Column =
      graft.functions.VectorOps.dotProduct(v, array(c.toIndexedSeq.map(lit): _*))
    // nearest centroid by (normalized) inner product: cells follow the
    // cosine geometry the search uses
    def sims(v: Column): Column =
      array(centroids.toIndexedSeq.map(c => dot(v, c)): _*)
    // bind sims to a named column so the argmin reads it instead of
    // duplicating the nCells x dim dot-product tree
    val indexed = e.withColumn("sims", sims(col("e")))
      .withColumn("cell", array_position(col("sims"), array_max(col("sims"))))
      .drop("sims")
    // --- queries probe their nprobe nearest cells ---
    val probeW = Window.partitionBy("qid").orderBy(col("sim").desc, col("pcell"))
    val probes = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        posexplode(sims(col("e"))).as(Seq("pcell0", "sim")))
      .withColumn("pcell", col("pcell0") + 1)
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qe"), col("pcell"))
    val s = indexed.join(broadcast(probes),
        col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("qe"), col("e")).as("cos"))
      .filter(col("cos").isNotNull)
      .as[Score]
    finishTopK(partialTopK(s, k), k)
  }

  /** Lloyd's iterations over an in-memory sample (quantizer training —
    * driver-side by design, see ivfTopK). Empty cells re-seed from the
    * sample deterministically. */
  private[pipeline] def kmeans(sample: Array[Array[Double]], kCells: Int,
      iters: Int, seed: Long,
      init: Array[Array[Double]] = null): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty training sample")
    val rng = new java.util.Random(seed)
    val dim = sample.head.length
    val centroids =
      if (init != null) { require(init.length == kCells); init.map(_.clone()) }
      else Array.tabulate(kCells)(i => sample(i % sample.length).clone())
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < kCells) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = v(j) - centroids(c)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kCells)(new Array[Double](dim))
      val counts = new Array[Int](kCells)
      sample.foreach { v =>
        val c = nearest(v)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      var c = 0
      while (c < kCells) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } else {
          centroids(c) = sample(rng.nextInt(sample.length)).clone()
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** Multi-table LSH ANN top-k: `tables` independent random-hyperplane
    * sign buckets (planes seeded on the driver, shipped as literal
    * arrays); a candidate is scored iff it shares ANY table's bucket
    * with the query, then deduped and exact-ranked.
    *
    * Single-table sign-LSH recall for a neighbor at angle θ is
    * (1-θ/π)^planes — on unstructured data that collapses fast (6
    * planes at cos 0.3 ≈ 4%); L tables lift it to 1-(1-p)^L while
    * still scoring only bucket-mates. `planes`/`tables` trade recall
    * against candidate volume; the data never gets cross-joined. */
  def lshTopK(emb: DataFrame, maxQueryId: Long, k: Int,
      planes: Int = 4, tables: Int = 8, seed: Long = 42L,
      dim: Int = 64): DataFrame = {
    import emb.sparkSession.implicits._
    val rng = new java.util.Random(seed)
    val hyper = Array.fill(tables, planes, dim)(rng.nextGaussian())
    // ONE fused expression for every table's bucket (identical bits to
    // the per-(table,plane) DotProduct subtree spelling, including the
    // planes = 0 degenerate all-covering bucket the verified twin
    // uses): tables×planes separate fused loops in one projection
    // overflow the JIT's method-size budget and leave the banding
    // stage interpreted — see HyperplaneBuckets
    val e = asDouble(emb)
      .select(col("vec_id"), col("e"),
        posexplode(graft.functions.VectorOps
          .hyperplaneBuckets(col("e"), hyper)).as(Seq("t", "bucket")))
    val qRenamed = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("t").as("qt"),
        col("bucket").as("qbucket"), col("e").as("qe"))
    val s = e.join(broadcast(qRenamed),
        col("t") === col("qt") && col("bucket") === col("qbucket") &&
          col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), col("qe"), col("e"))
      .dropDuplicates("qid", "nid")
      .select(col("qid"), col("nid"), cosine(col("qe"), col("e")).as("cos"))
      .filter(col("cos").isNotNull)
      .as[Score]
    finishTopK(partialTopK(s, k), k)
  }

  /** Product-quantization codes: the d-dim vector (L2-normalized
    * first, so inner product = cosine) splits into `m` subvectors and
    * each subspace gets its own `codebookSize`-way k-means codebook
    * trained driver-side on a bounded seeded sample (the IVF recipe,
    * per subspace). A vector stores only its per-subspace
    * nearest-centroid indexes — at m=8 that is 8 small ints in place
    * of 64 floats (~32×), which is what lets a 100 TB corpus's index
    * live in cluster memory. Assignment is a pure expression tree
    * (codebooks ride as literals; per subspace the argmin is spelled
    * argmax of dot − ½‖c‖², the monotone equivalent that reuses the
    * fused dot product).
    *
    * Returns (vec_id, e (normalized), code array<int> 1-based) plus
    * the trained codebooks for the query side. */
  /** L2-normalize and drop zero vectors — the shared front half of
    * training and encoding (cosine geometry needs unit vectors). */
  private[pipeline] def normalized(emb: DataFrame): DataFrame = {
    val e0 = asDouble(emb)
    val norm = sqrt(graft.functions.VectorOps.dotProduct(col("e"), col("e")))
    e0.filter(norm > 0.0)
      .withColumn("__n", norm)
      .select(col("vec_id"),
        transform(col("e"), x => x / col("__n")).as("e"))
  }

  /** Encode vectors against EXISTING codebooks — assignment is a pure
    * expression tree (codebooks ride as literals; per subspace the
    * argmin is spelled argmax of dot − ½‖c‖², the monotone equivalent
    * that reuses the fused dot product). Shared by initial coding and
    * incremental index extension. */
  private def pqEncode(n: DataFrame,
      books: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val m = books.length
    val codebookSize = books(0).length
    // every (subspace, centroid) dot in ONE fused expression
    // (SubspaceDots — identical bits to the per-(j,c) dot(slice(e))
    // subtree spelling, whose m·codebookSize subtrees cost more to
    // analyze per statement than the job runs); the per-subspace
    // argmax then reads scalar slots out of the one array
    val withSims = (0 until m).foldLeft(
      n.withColumn("__sd",
        graft.functions.VectorOps.subspaceDots(col("e"), books))) {
      (df, j) =>
        df.withColumn(s"__s$j",
          array((0 until codebookSize).map(c =>
            element_at(col("__sd"), j * codebookSize + c + 1) -
              lit(0.5 * books(j)(c).map(x => x * x).sum)): _*))
    }
    withSims
      .withColumn("code", array((0 until m).map(j =>
        array_position(col(s"__s$j"), array_max(col(s"__s$j")))
          .cast("int")): _*))
      .select(col("vec_id"), col("e"), col("code"))
  }

  private def pqAssign(emb: DataFrame, m: Int, codebookSize: Int,
      seed: Long, trainIters: Int, sampleSize: Int, dim: Int)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val n = normalized(emb)
    val sample = trainingSample(n, "vec_id", "e", sampleSize, seed)
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      kmeans(sample.map(v => v.slice(j * sub, (j + 1) * sub)),
        codebookSize, trainIters, seed + j)
    }
    (pqEncode(n, books, dim), books)
  }

  /** Incrementally EXTEND a PQ index with a new vector batch — encode
    * the batch against the index's EXISTING codebooks and append the
    * coded rows; no retraining, no touch of the already-coded corpus
    * (O(batch) work, the VersionedTable.append discipline applied to
    * the ANN index). This is how a production vector index absorbs
    * continuous ingest: codebooks train once on a representative
    * sample and stay fixed so old codes remain comparable; periodic
    * full rebuilds (pqIndex) absorb distribution drift — the
    * compact() of this lifecycle. Quantization error on the new batch
    * matches what training-time encoding would produce as long as the
    * batch resembles the training distribution. */
  def pqIndexExtend(idx: PqIndex, newEmb: DataFrame): PqIndex =
    PqIndex(idx.coded.unionByName(pqEncodeBatch(newEmb, idx.books))
      .localCheckpoint(true), idx.books)

  /** Encode a raw embedding batch against EXISTING codebooks — the
    * batch half shared by [[pqIndexExtend]], [[ivfPqIndexExtend]] and
    * [[AnnIndexStore]]'s persisted extends. The vector dimension is
    * DERIVED from the codebook geometry (m subspaces × subvector
    * width) rather than trusted from a caller: a mismatched dim would
    * silently slice the wrong subspaces and produce garbage codes
    * that still look valid. */
  private[pipeline] def pqEncodeBatch(newEmb: DataFrame,
      books: Array[Array[Array[Double]]]): DataFrame =
    pqEncode(normalized(newEmb), books, dim = books.length * books(0)(0).length)

  /** Nearest-coarse-centroid assignment as a pure expression column —
    * shared by [[ivfPqIndex]], [[ivfPqIndexExtend]] and the persisted
    * extend path. */
  private[pipeline] def cellAssign(df: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = {
    def dot(v: Column, c: Array[Double]): Column =
      graft.functions.VectorOps.dotProduct(v,
        array(c.toIndexedSeq.map(lit): _*))
    val sims = array(centroids.toIndexedSeq.map(c => dot(col("e"), c)): _*)
    df.withColumn("sims", sims)
      .withColumn("cell",
        array_position(col("sims"), array_max(col("sims"))).cast("int"))
      .drop("sims")
  }

  /** PQ ANN top-k by asymmetric distance computation (ADC) with exact
    * re-ranking: database vectors are first scored through their codes
    * ONLY — per query the dot with every codebook centroid is
    * tabulated once driver-side (m·codebookSize entries) and a
    * vector's approximate cosine is m table lookups instead of a
    * d-wide dot product — then the ADC top-(refine·k) candidates are
    * re-ranked with their exact vectors (the standard PQ refine step:
    * ADC deliberately collapses near-identical vectors onto one code,
    * so the fine ranking must come from a bounded exact pass). This is
    * the memory-compression member of the ANN trio (LSH =
    * hash-bounded, IVF = partition-bounded, PQ =
    * bytes-per-vector-bounded); a deployment composes IVF cells over
    * PQ codes (IVF-PQ) so the scan is sub-linear AND the index fits
    * in RAM. Recall is approximate by construction — the gate row
    * carries the in-plan recall column (the sim_topk_lsh
    * discipline). */
  /** A trained PQ index: the coded relation (materialized once — it
    * feeds the ADC scan AND the exact re-rank) plus the codebooks.
    * This is the OFFLINE artifact of the build/serve split: train and
    * code once, serve many query batches against it (the FAISS
    * lifecycle, and the same discipline as GraphAnn's prebuilt
    * graph). */
  final case class PqIndex(coded: DataFrame,
      books: Array[Array[Array[Double]]])

  /** Build the PQ index for [[pqTopK]]'s `prebuilt` parameter. */
  def pqIndex(emb: DataFrame, m: Int = 8, codebookSize: Int = 16,
      seed: Long = 42L, trainIters: Int = 8, sampleSize: Int = 512,
      dim: Int = 64): PqIndex = {
    val (coded0, books) = pqAssign(emb, m, codebookSize, seed,
      trainIters, sampleSize, dim)
    PqIndex(coded0.localCheckpoint(true), books)
  }

  def pqTopK(emb: DataFrame, maxQueryId: Long, k: Int, m: Int = 8,
      codebookSize: Int = 16, refine: Int = 4, seed: Long = 42L,
      trainIters: Int = 8, sampleSize: Int = 512,
      dim: Int = 64, prebuilt: Option[PqIndex] = None): DataFrame = {
    require(refine >= 1, s"refine factor must be >= 1, got $refine")
    val spark = emb.sparkSession
    import spark.implicits._
    val PqIndex(coded, books) = prebuilt.getOrElse(
      pqIndex(emb, m, codebookSize, seed, trainIters, sampleSize, dim))
    // queries stay a RELATION: the per-query ADC lookup table is a
    // per-row expression (codebooks ride as literals, the cell-assign
    // discipline), broadcast to the scan — the round-8 spelling
    // collect()ed the query rows and tabulated LUTs driver-side, which
    // OOMs the driver on a 10⁶-query batch; this shape is bounded only
    // by what broadcast can ship
    val qdf = queries(coded, maxQueryId, books, dim)
      .select(col("qid"), col("lut"))
    val adc = coded.join(broadcast(qdf), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0d),
          (acc, j) => acc + element_at(col("lut"),
            (j * codebookSize).cast("int") +
              element_at(col("code"), (j + 1).cast("int")))).as("cos"))
      .as[Score]
    // ADC shortlist: refine·k per query survives the heap+window pass
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    val shortlist = partialTopK(adc, refine * k)
      .withColumn("rn0", row_number().over(w))
      .filter(col("rn0") <= refine * k)
      .select("qid", "nid")
    // exact re-rank of the bounded shortlist (vectors are normalized,
    // so the dot IS the cosine)
    val qe = coded.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val exact = shortlist
      .join(coded.select(col("vec_id").as("nid"), col("e").as("ne")), "nid")
      .join(broadcast(qe), "qid")
      .select(col("qid"), col("nid"),
        graft.functions.VectorOps.dotProduct(col("qe"), col("ne"))
          .as("cos"))
      .as[Score]
    finishTopK(exact, k)
  }

  /** The bounded query side of a PQ scan, AS A RELATION: (qid, qe,
    * lut) where lut[j·codebookSize + c] = ⟨qe-subvector j,
    * codebook j centroid c⟩, computed per ROW with the codebooks as
    * literal arrays — never on the driver. The m·codebookSize dot
    * products per query are sub-dim wide each, i.e. exactly the d·
    * codebookSize multiplies the ADC recipe budgets per query. */
  private def queries(coded: DataFrame, maxQueryId: Long,
      books: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    // lut[j·codebookSize + c] IS SubspaceDots' output ordering — one
    // fused expression in place of m·codebookSize dot subtrees (the
    // pqEncode rationale)
    coded.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
      .withColumn("lut",
        graft.functions.VectorOps.subspaceDots(col("qe"), books))
  }

  /** IVF-PQ — the composition a production vector index actually runs
    * (the FAISS IVFPQ layout): IVF cells bound WHICH vectors a query
    * scans (~nprobe/nCells of the corpus), PQ codes bound the BYTES
    * per scanned vector (m small ints), ADC makes the scan a
    * lookup-table sum, and the exact refine pass restores fine
    * ranking on the bounded shortlist. Both quantizers train
    * driver-side on one bounded sample; query LUTs and probe lists
    * are PER-ROW expressions over a broadcast query relation
    * (centroids and codebooks ride as literals) — query vectors are
    * never collected, so the batch is bounded by broadcast size, not
    * driver heap.
    *
    * Per-query work: (n·nprobe/nCells) LUT sums + refine·k exact dots
    * — sub-linear scan AND compressed residency, vs pqTopK's full
    * scan and ivfTopK's full-width vectors. */
  /** A trained IVF-PQ index: the cell-assigned coded relation
    * (materialized once) plus codebooks and coarse centroids — the
    * offline artifact of the FAISS IVFPQ lifecycle. */
  final case class IvfPqIndex(coded: DataFrame,
      books: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]])

  /** Build the IVF-PQ index for [[ivfPqTopK]]'s `prebuilt`
    * parameter: PQ codes + a coarse quantizer on the SAME normalized
    * vectors (cells follow the cosine geometry), both trained on the
    * bounded-sample recipe. */
  def ivfPqIndex(emb: DataFrame, nCells: Int = 16, m: Int = 16,
      codebookSize: Int = 16, seed: Long = 42L, trainIters: Int = 8,
      sampleSize: Int = 512, dim: Int = 64): IvfPqIndex = {
    val (coded0, books) = pqAssign(emb, m, codebookSize, seed,
      trainIters, sampleSize, dim)
    val sample = trainingSample(coded0, "vec_id", "e", sampleSize, seed)
    val centroids = kmeans(sample, nCells, trainIters, seed + 7919)
    // feeds probe scan AND exact refine once
    val coded = cellAssign(coded0, centroids).localCheckpoint(true)
    IvfPqIndex(coded, books, centroids)
  }

  /** Incrementally EXTEND an IVF-PQ index: encode + cell-assign the
    * new batch against the index's FIXED codebooks and centroids,
    * append the coded rows — the [[pqIndexExtend]] contract with the
    * coarse quantizer included. O(batch) work; cell populations drift
    * as the corpus grows, so rebuild (ivfPqIndex) when probe recall
    * degrades — the same build/extend/rebuild lifecycle FAISS
    * deployments run. */
  def ivfPqIndexExtend(idx: IvfPqIndex, newEmb: DataFrame): IvfPqIndex =
    IvfPqIndex(idx.coded.unionByName(
        cellAssign(pqEncodeBatch(newEmb, idx.books), idx.centroids))
      .localCheckpoint(true), idx.books, idx.centroids)

  /** Per-row PQ quantization error — squared L2 between the
    * normalized vector and its codebook reconstruction, decomposed
    * per subspace (‖x_j‖² − 2·x_j·c + ‖c‖² at the row's assigned
    * code), as a pure expression over (e, code). Codebooks ride as
    * literals; no shuffle, no UDF. */
  private def quantizationErrorCol(
      books: Array[Array[Array[Double]]]): Column = {
    val m = books.length
    val cb = books(0).length
    val sub = books(0)(0).length
    // ‖x_j‖² and every ⟨x_j, c⟩ come from the two fused expressions
    // (SubspaceSelfDots / SubspaceDots — the pqEncode rationale); the
    // per-subspace error keeps the legacy spelling's exact arithmetic
    // order: (selfdot − 2·dot) + ‖c‖², with ‖c‖² picked from a literal
    // array by the row's assigned code
    val sd = graft.functions.VectorOps.subspaceDots(col("e"), books)
    val self = graft.functions.VectorOps
      .subspaceSelfDots(col("e"), m, sub)
    (0 until m).map { j =>
      val norms = array(books(j).toIndexedSeq.map(c =>
        lit(c.map(x => x * x).sum)): _*)
      val cj = element_at(col("code"), j + 1)
      element_at(self, j + 1) -
        lit(2.0) * element_at(sd, (cj + (j * cb)).cast("int")) +
        element_at(norms, cj)
    }.reduce(_ + _)
  }

  /** Quantization-DRIFT audit: the rebuild-decision half of the
    * build/extend lifecycle. [[pqIndexExtend]]/[[ivfPqIndexExtend]]
    * encode new batches against FIXED quantizers, which stays accurate
    * only while ingest resembles the training distribution — under
    * drift, quantization error creeps up and ADC rankings silently
    * degrade. This op measures exactly that: mean squared
    * quantization error over the index's existing coded corpus (the
    * achieved-at-build baseline) vs the same error on a candidate
    * batch encoded with the same codebooks, and recommends a rebuild
    * when the ratio exceeds `rebuildThreshold` (FAISS deployments run
    * the same check before choosing re-train vs add).
    *
    * At 100 TB: two scans — corpus and batch — each folding the
    * per-row error expression into a partial+final avg, then a
    * broadcast cross join of two single-row aggregates. No
    * full-width shuffle anywhere; the audit costs what a count
    * costs. Returns one row: n_corpus, n_batch, corpus_mse,
    * batch_mse, drift_ratio, rebuild (0/1 — BIGINT so the row is
    * driver-canonicalizable). */
  def pqDriftAudit(coded: DataFrame, books: Array[Array[Array[Double]]],
      batch: DataFrame, rebuildThreshold: Double = 2.0): DataFrame = {
    require(rebuildThreshold > 0, "rebuildThreshold must be positive")
    val err = quantizationErrorCol(books)
    val corpus = coded.agg(count(lit(1)).as("n_corpus"),
      avg(err).as("corpus_mse"))
    val b = pqEncodeBatch(batch, books).agg(count(lit(1)).as("n_batch"),
      avg(err).as("batch_mse"))
    corpus.crossJoin(b)
      .withColumn("drift_ratio", col("batch_mse") / col("corpus_mse"))
      .withColumn("rebuild",
        (col("drift_ratio") > rebuildThreshold).cast("long"))
  }

  /** [[pqDriftAudit]] over a PQ index. */
  def pqDriftAudit(idx: PqIndex, batch: DataFrame,
      rebuildThreshold: Double): DataFrame =
    pqDriftAudit(idx.coded, idx.books, batch, rebuildThreshold)

  /** [[pqDriftAudit]] over an IVF-PQ index (the PQ layer is where
    * reconstruction error lives; cell-population drift shows up in
    * the same ratio since cells and codes share the geometry). */
  def pqDriftAudit(idx: IvfPqIndex, batch: DataFrame,
      rebuildThreshold: Double): DataFrame =
    pqDriftAudit(idx.coded, idx.books, batch, rebuildThreshold)

  def ivfPqTopK(emb: DataFrame, maxQueryId: Long, k: Int,
      nCells: Int = 16, nprobe: Int = 4, m: Int = 16,
      codebookSize: Int = 16, refine: Int = 8, seed: Long = 42L,
      trainIters: Int = 8, sampleSize: Int = 512,
      dim: Int = 64, prebuilt: Option[IvfPqIndex] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCells,
      s"nprobe=$nprobe must be in [1, nCells=$nCells]")
    val spark = emb.sparkSession
    import spark.implicits._
    val IvfPqIndex(coded, books, centroids) = prebuilt.getOrElse(
      ivfPqIndex(emb, nCells, m, codebookSize, seed, trainIters,
        sampleSize, dim))
    def dot(v: Column, c: Array[Double]): Column =
      graft.functions.VectorOps.dotProduct(v,
        array(c.toIndexedSeq.map(lit): _*))
    // query relation: LUT per row (the pqTopK helper), probe list per
    // row — top-nprobe cells by centroid similarity WITHOUT a window:
    // argsort (−sim, idx) structs and slice the head (the
    // semanticNearDup multi-probe spelling), then explode to
    // (qid, pcell, lut) and broadcast
    val qsims = array(centroids.toIndexedSeq.map(c => dot(col("qe"), c)): _*)
    val probeDf = queries(coded, maxQueryId, books, dim)
      .withColumn("__qsims", qsims)
      .withColumn("__probes",
        slice(transform(
          array_sort(zip_with(col("__qsims"),
            sequence(lit(1), lit(centroids.length)),
            (s0, i) => struct((-s0).as("ns"), i.as("i")))),
          x => x("i")), 1, nprobe))
      .select(col("qid"), col("lut"),
        explode(col("__probes")).as("pcell"))
    val adc = coded
      .join(broadcast(probeDf),
        col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0d),
          (acc, j) => acc + element_at(col("lut"),
            (j * codebookSize).cast("int") +
              element_at(col("code"), (j + 1).cast("int")))).as("cos"))
      .as[Score]
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    val shortlist = partialTopK(adc, refine * k)
      .withColumn("rn0", row_number().over(w))
      .filter(col("rn0") <= refine * k)
      .select("qid", "nid")
    val qe = coded.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val exact = shortlist
      .join(coded.select(col("vec_id").as("nid"), col("e").as("ne")), "nid")
      .join(broadcast(qe), "qid")
      .select(col("qid"), col("nid"),
        graft.functions.VectorOps.dotProduct(col("qe"), col("ne"))
          .as("cos"))
      .as[Score]
    finishTopK(exact, k)
  }
}
