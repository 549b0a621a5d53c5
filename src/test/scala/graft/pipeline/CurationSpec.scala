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

  test("ingest funnel: corpus wins near-dups, batch-internal drops the " +
      "larger id, exact re-crawls and contaminated docs never land") {
    // distinct vocabularies so only the PLANTED relationships pair
    def words(prefix: String, n: Int) =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val corpus = Seq(
      (100L, words("alpha", 25)),
      (101L, words("beta", 25)),
      (102L, words("gamma", 25))).toDF("doc_id", "text")
    val bench = Seq((0L, words("bench", 25))).toDF("doc_id", "text")
    val batch = Seq(
      // fresh, clean: the only doc that should land
      (200L, words("delta", 25)),
      // exact re-crawl of corpus 100 (whitespace-normalized equal)
      (201L, words("alpha", 25).replace(" ", "  ")),
      // near re-crawl of corpus 101: J = 25/26 >= 0.7 -> corpus wins
      (202L, words("beta", 25) + " extra0"),
      // near-dup pair WITHIN the batch: larger id drops
      (203L, words("epsilon", 25)),
      (204L, words("epsilon", 25) + " extra1"),
      // contaminated: shares a trigram run with the bench doc
      (205L, words("zeta", 22) + " bench3 bench4 bench5"),
      // fails the quality gate (3 tokens < 20)
      (206L, "too short doc")).toDF("doc_id", "text")
    val surv = Curation.ingest(batch, corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(200L, 203L), s"survivors: $surv")
    // determinism: a rerun lands the identical set
    assert(Curation.ingest(batch, corpus, bench)
      .collect().map(_.getLong(0)).toSet == surv)
  }
}
