package graft.syntax

import graft.SparkSpec
import graft.ops.Tables

class SyntaxSpec extends SparkSpec {

  test("fluent API: documents surface") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    assert(docs.dedupExact().count() > 0)
    assert(docs.tokenCounts().columns.contains("n_tokens"))
    assert(docs.qualityScores().columns.contains("punct_ratio"))
    assert(docs.languageId().columns.contains("pred_lang"))
    assert(docs.fingerprints().columns.contains("rolling_fp"))
    assert(docs.nearDupClusters(50L).columns.toSeq ==
      Seq("doc_id", "component"))
    assert(docs.topBigrams(5).count() == 5)
    assert(docs.hashSample(1000).count() == docs.count())
    assert(docs.curate().columns.contains("mean_tokens"))
    assert(docs.repetitionStats().columns.contains("top_token_share"))
    assert(docs.chunkTokens(64).columns.contains("chunk_text"))
    val bench = docs.filter("doc_id < 10")
    assert(docs.filter("doc_id >= 10").contaminatedBy(bench)
      .columns.toSeq == Seq("doc_id", "hits"))
    assert(docs.clusterPairs(docs.nearDupsMinhash(shingleN = 1, k = 16,
      bands = 8, threshold = 0.9).select("id_a", "id_b")).count() > 0)
    assert(docs.filter("doc_id < 50").nearDupsPrefix(0.8)
      .columns.toSeq == Seq("id_a", "id_b", "j"))
    assert(docs.filter("doc_id >= 450").nearDupsAgainst(
      docs.filter("doc_id < 50"), shingleN = 1)
      .columns.toSeq == Seq("id_a", "id_b", "j"))
    assert(docs.zscoreBy("lang", "n_chars").columns.contains("z"))
    assert(docs.winsorizeBy("lang", "n_chars").columns.contains("clipped"))
    assert(docs.semiJoinPruned(docs.filter("doc_id < 100"),
      "doc_id", "doc_id").count() == 100)
    assert(docs.filter("doc_id < 50").nearDupsSortedNeighborhood(0.8)
      .columns.toSeq == Seq("id_a", "id_b", "j"))
    assert(docs.corrBy("lang", "n_chars", "doc_id").columns.contains("r"))
    assert(docs.profileColumns("lang", "n_chars").count() == 2)
    assert(docs.validateRules(
      "nonblank" -> (org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) > 0))
      .columns.toSeq == Seq("rule", "n_rows", "n_violations"))
    assert(docs.histogramBy("lang", "n_chars").columns.contains("bucket"))
    assert(docs.robustScaleBy("lang", "n_chars").columns.contains("robust_z"))
    assert(docs.histogramEquiDepthBy("lang", "n_chars")
      .columns.toSeq == Seq("lang", "bucket", "cnt"))
    assert(docs.winnowFingerprints().columns.toSeq ==
      Seq("doc_id", "fp_pos", "fp_hash"))
    assert(docs.cooccurrenceTopK(window = 2, topK = 5).count() == 5)
    assert(docs.filter("doc_id < 50").winnowOverlapPairs()
      .columns.toSeq == Seq("id_a", "id_b", "shared"))
  }

  test("fluent API: event-behavior surface") {
    val ev = Tables.events(spark, sf("sf0.001"))
    assert(ev.funnelSteps("view", "click", "purchase").count() == 3)
    assert(ev.retentionCohorts().columns.toSeq ==
      Seq("cohort_day", "day_offset", "active_users"))
    assert(ev.anomalyDays().columns.contains("is_anomaly"))
  }

  test("fluent API: embeddings surface") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    assert(emb.cosineTopK(3L, 2).count() == 6)
    assert(emb.cosineTopKApprox(3L, 2).count() <= 6)
    assert(emb.cosineTopKIvf(3L, 2).count() <= 6)
    assert(emb.semanticNearDups(threshold = 0.3, nCells = 4)
      .columns.toSeq == Seq("id_a", "id_b", "cos"))
    assert(emb.pcaProject(k = 2).columns.contains("proj"))
  }
}
