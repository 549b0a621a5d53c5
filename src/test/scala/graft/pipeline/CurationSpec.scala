package graft.pipeline

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  test("curation funnel: gates, dedups, samples, aggregates per language") {
    val docs = Seq(
      // kept: 6 tokens, short words, en
      (0L, "the cat sat on the mat", "en"),
      // exact dup of 0 after normalization -> deduped (keep 0)
      (2L, "the  cat sat on the  mat", "en"),
      // too short (< 5 tokens)
      (4L, "too short doc", "en"),
      // gibberish: mean token length 31 > 12
      (6L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb ccccccccccccccccccccccccccccccc ddddddddddddddddddddddddddddddd eeeeeeeeeeeeeeeeeeeeeeeeeeeeeee", "en"),
      // kept, de
      (8L, "der hund und die katze sind tiere", "de"),
      (10L, "", "en"), // empty -> null mean_tok_len -> dropped
    ).toDF("doc_id", "text", "lang")
    // permille=1000: keep every survivor, so the assertion is exact
    val r = Curation.curate(docs, samplePermille = 1000)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("en") == ((1L, 6L, 6.0)), s"en row: ${r.get("en")}")
    assert(r("de") == ((1L, 7L, 7.0)), s"de row: ${r.get("de")}")
    assert(r.size == 2)
  }

  test("sampling stage composes: permille=0 empties the funnel") {
    val docs = Seq((0L, "the cat sat on the mat", "en")).toDF("doc_id", "text", "lang")
    assert(Curation.curate(docs, samplePermille = 0).count() == 0L)
  }
}
