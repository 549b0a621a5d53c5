package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate inputs through the text/dedup/multimodal surface: an
  * engine that will meet 100 TB of scraped data must not throw on
  * empty, whitespace-only, unicode, or single-token documents. */
class EdgeCaseSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val weird = Seq(
    (0L, ""),
    (1L, "   "),
    (2L, "one"),
    (3L, "naïve café résumé — 日本語 テスト"),
    (4L, "a\tb\nc\r\nd"),
    (5L, "!!! ??? ..."),
  ).toDF("doc_id", "text")

  test("token counts survive degenerate docs") {
    val r = TextAnalysis.tokenCounts(weird).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(2L) == 1)
    assert(r(4L) == 4) // tab/newline/CRLF all split
    assert(r.size == 6) // nothing threw, nothing dropped
  }

  test("quality scores: no exceptions; empty docs yield nulls not crashes") {
    val rows = TextAnalysis.qualityScores(weird, Seq("a", "the")).collect()
    assert(rows.length == 6)
    // empty text: length 0 -> punct ratio division by zero -> null
    val empty = rows.find(_.getLong(0) == 0L).get
    assert(empty.isNullAt(2))
  }

  test("language id handles no-hit and unicode docs") {
    val r = TextAnalysis.languageId(weird).collect()
      .map(x => x.getLong(0) -> x.getString(5)).toMap
    assert(r(3L) == "und")
    assert(r(5L) == "und")
    assert(r(4L) == "en") // contains "a"
  }

  test("fingerprints and exact dedup on degenerate docs") {
    assert(TextAnalysis.fingerprints(weird).count() == 6)
    // "" and "   " normalize to "" and "" -> same content key, deduped
    val groups = Dedup.exact(weird).collect()
    assert(groups.map(_.getLong(2)).sum == 6)
    val emptyGroup = groups.find(_.getLong(1) == 0L).get
    assert(emptyGroup.getLong(2) == 2L, "empty and whitespace-only collapse")
  }

  test("minhash/simhash do not throw on degenerate docs") {
    assert(Dedup.minhashPairs(weird, 1, 16, 4, 0.9).count() >= 0)
    assert(Dedup.simhashes(weird).count() == 6)
  }

  test("blank docs never form near-dup candidate pairs (exact dedup owns them)") {
    // docs 0 ("") and 1 ("   ") are content-empty: banding them would
    // pair every blank doc with every other — quadratic in blanks
    val mh = Dedup.minhashPairs(weird, 1, 16, 4, 0.0)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!mh.contains(0L) && !mh.contains(1L), s"blank doc paired: $mh")
    val sh = Dedup.simhashPairs(weird, maxHamming = 64)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!sh.contains(0L) && !sh.contains(1L), s"blank doc paired: $sh")
  }

  test("postings on degenerate docs: empty/whitespace docs contribute their normalized token") {
    val r = TextAnalysis.postings(weird, topK = 100).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    // "" and "   " both tokenize to the single empty token
    assert(r.get("").exists(_._1 == 2L))
    assert(r("one") == (1L, 1L))
    // nothing threw; every df <= corpus size
    assert(r.values.forall(_._1 <= 6L))
  }

  test("postings and keep-best on an EMPTY corpus return empty, not errors") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.postings(empty, topK = 10).count() == 0)
    val comp = Dedup.nearDupClusters(
      empty.withColumn("n_chars", length(col("text"))), maxId = 10L,
      threshold = 0.7)
    assert(comp.count() == 0)
  }

  test("multimodal plumbing on empty payloads") {
    val media = Multimodal.asMedia(weird)
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.length == 6)
    assert(f.forall(_.features.length == Multimodal.FeatureDim))
  }

  test("pluggable decoder: open/close bracket every batch, custom decode applies") {
    val media = Multimodal.asMedia(weird)
    val decoder = new MediaDecoder {
      @transient private var opened = false
      override def open(): Unit = {
        EdgeCaseSpec.opens.incrementAndGet(); opened = true
      }
      override def close(): Unit = EdgeCaseSpec.closes.incrementAndGet()
      override def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
        require(opened, "decode before open()")
        Array.fill(2)(meta.nBytes.toFloat)
      }
    }
    EdgeCaseSpec.opens.set(0); EdgeCaseSpec.closes.set(0)
    val f = Multimodal.extractFeatures(media, decoder).collect()
    assert(f.length == 6)
    assert(f.forall(r => r.features.toSeq == Seq(r.nBytes.toFloat, r.nBytes.toFloat)))
    // local[4] runs executors in this JVM: lifecycle counts are visible
    assert(EdgeCaseSpec.opens.get() > 0)
    assert(EdgeCaseSpec.opens.get() == EdgeCaseSpec.closes.get(),
      "every open() must be paired with close()")
  }

  test("round-7 operators survive empty and degenerate inputs") {
    val empty = weird.filter(lit(false))
    assert(Dedup.prefixJaccardPairs(empty, 0.8).count() == 0L)
    assert(Dedup.prefixJaccardPairs(weird, 0.8, shingleN = 3).count() == 0L)
    // blank-only corpus: every doc filtered before banding
    assert(Dedup.prefixJaccardPairs(
      weird.filter(col("doc_id") < 2), 0.5).count() == 0L)
    assert(Dedup.incrementalMinhashPairs(empty, weird,
      shingleN = 1).count() == 0L)
    assert(Dedup.incrementalMinhashPairs(weird, empty,
      shingleN = 1).collect().forall(r => r.getLong(0) != r.getLong(1)))
    assert(Normalize.winsorizeByGroup(empty, "doc_id", "doc_id")
      .count() == 0L)
    assert(Multimodal.perceptualNearDup(Multimodal.asMedia(empty))
      .count() == 0L)
    // single-doc media: no self-pairs
    assert(Multimodal.perceptualNearDup(
      Multimodal.asMedia(weird.filter(col("doc_id") === 2))).count() == 0L)
  }

  test("round-8 operators survive empty and degenerate inputs") {
    val empty = weird.filter(lit(false))
    // winnowing: blank/short docs yield no fingerprints, never throw
    assert(TextAnalysis.winnowingFingerprints(weird).count() ===
      TextAnalysis.winnowingFingerprints(
        weird.filter(col("doc_id") >= 3)).count())
    assert(TextAnalysis.winnowingFingerprints(empty).count() == 0L)
    assert(Dedup.winnowingOverlapPairs(empty).count() == 0L)
    assert(Dedup.winnowingOverlapPairs(
      weird.filter(col("doc_id") === 2)).count() == 0L)
    // co-occurrence: blank and single-token docs contribute no pairs
    assert(TextAnalysis.cooccurrence(
      weird.filter(col("doc_id") < 3), window = 2).count() == 0L)
    assert(TextAnalysis.cooccurrence(empty).count() == 0L)
    // robust scale / equi-depth on empty input: empty out, no throw
    assert(Normalize.robustScaleByGroup(empty, "doc_id", "doc_id")
      .count() == 0L)
    assert(Profile.histogramEquiDepth(empty, "doc_id", "doc_id")
      .count() == 0L)
    // merge: empty snapshot takes the changeset's upserts verbatim
    val cs = weird.limit(2).withColumn("op", lit("U"))
    assert(Merge.applyChangeset(empty, cs, "doc_id").count() == 2L)
    // behavior ops on empty events
    val emptyEv = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    assert(graft.ops.Behavior.funnel(emptyEv, Seq("a", "b"))
      .collect().map(_.getLong(2)).toSeq === Seq(0L, 0L))
    assert(graft.ops.Behavior.retention(emptyEv).count() == 0L)
    assert(graft.ops.Behavior.anomalyDays(emptyEv).count() == 0L)
    assert(graft.ops.Behavior.resampleHourly(
      emptyEv.withColumn("value", lit(1.0d))).count() == 0L)
    // semantic dedup: empty corpus returns the empty pair set (the
    // dedup family contract) rather than a quantizer training error
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semanticNearDup(emptyEmb).count() == 0L)
    // drift on two empty slices: no groups, no rows
    assert(Profile.distributionDrift(
      weird.filter(lit(false)).withColumnRenamed("text", "t"),
      weird.filter(lit(false)).withColumnRenamed("text", "t"),
      "t", "doc_id").count() == 0L)
  }

  test("round-9 operators survive empty and degenerate inputs") {
    val empty = weird.filter(lit(false))
    // novelty: empty batch -> empty; empty corpus -> every batch key
    assert(Dedup.novelKeys(empty, weird, Seq("doc_id")).count() == 0L)
    assert(Dedup.novelKeys(weird, empty, Seq("doc_id")).count() ==
      weird.count())
    // boilerplate removal: degenerate docs pass through or drop, never
    // throw; empty corpus -> empty
    assert(TextAnalysis.boilerplateRemoval(empty, 2, 1).count() == 0L)
    assert(TextAnalysis.boilerplateRemoval(weird, 2, 10).count() ==
      weird.count())
    // sequence packing: empty corpus -> empty; degenerate docs all
    // assigned exactly once (blank docs pack as 1-token sequences —
    // the tokens() normalization owns that contract)
    assert(TextAnalysis.packSequences(empty, 16, 4).count() == 0L)
    assert(TextAnalysis.packSequences(weird, 16, 4)
      .select("doc_id").distinct().count() == weird.count())
    // mixing: empty sources contribute nothing, never throw
    assert(Sampling.mixCorpora(
      Seq(("e", empty, 1000), ("w", weird, 1000)), "doc_id").count() ==
      weird.count())
    // snapshot diff of a corpus against itself: everything unchanged;
    // against empty: everything removed / added respectively
    val self = Profile.snapshotDiff(weird, weird, "doc_id", "text", "text")
      .select("status").distinct().collect().map(_.getString(0)).toSeq
    assert(self == Seq("unchanged"))
    assert(Profile.snapshotDiff(weird, empty, "doc_id", "text", "text")
      .agg(sum("n")).collect().head.getLong(0) == weird.count())
    assert(Profile.snapshotDiff(empty, empty, "doc_id", "text", "text")
      .count() == 0L)
  }

  test("round-10 operators survive empty and degenerate inputs") {
    val empty = weird.filter(lit(false))
    def words(prefix: String, n: Int) =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val real = Seq(100L -> words("alpha", 25)).toDF("doc_id", "text")
    // ingest: empty batch -> no survivors; degenerate batch -> quality
    // gate removes everything; empty corpus -> clean batch lands whole
    assert(Curation.ingest(empty, real, empty).count() == 0L)
    assert(Curation.ingest(weird, real, empty).count() == 0L)
    assert(Curation.ingest(real, empty, empty)
      .collect().map(_.getLong(0)).toSeq == Seq(100L))
    // leakage-safe split: empty components -> empty, never throws
    val comps = empty.select(col("doc_id"),
      col("doc_id").as("component"))
    assert(Sampling.leakageSafeSplit(comps).count() == 0L)
    // drift audit: an EMPTY batch yields NULL batch stats and a NULL
    // (not spuriously true/false) rebuild flag — visible, not thrown
    val emb = Seq(1L -> Seq.fill(64)(1.0f)).toDF("vec_id", "embedding")
    val idx = Similarity.pqIndex(emb, m = 8, codebookSize = 2,
      sampleSize = 4)
    val r = Similarity.pqDriftAudit(idx,
      emb.filter(lit(false)), rebuildThreshold = 2.0).collect().head
    assert(r.getAs[Long]("n_batch") == 0L)
    assert(r.isNullAt(r.fieldIndex("batch_mse")) &&
      r.isNullAt(r.fieldIndex("rebuild")))
  }
}

object EdgeCaseSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
}
