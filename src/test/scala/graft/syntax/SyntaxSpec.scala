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
  }

  test("fluent API: embeddings surface") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    assert(emb.cosineTopK(3L, 2).count() == 6)
    assert(emb.cosineTopKApprox(3L, 2).count() <= 6)
  }
}
