package graft.pipeline

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val benchmark = Seq(
    (100L, "the capital of france is paris"),
    (101L, "water boils at one hundred degrees"),
  ).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    // verbatim benchmark sentence embedded mid-document -> contaminated
    (0L, "trivia dump: the capital of france is paris obviously"),
    // shares words but no trigram -> clean
    (1L, "paris is the largest capital in france"),
    (2L, "a completely unrelated document about spark"),
    // short doc (< n tokens) must not throw
    (3L, "tiny"),
  ).toDF("doc_id", "text")

  test("verbatim benchmark n-grams flag the doc; word overlap alone does not") {
    val r = Decontamination.contaminated(corpus, benchmark, n = 3, minHits = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.contains(0L), s"embedded benchmark sentence not flagged: $r")
    // "the capital of france is paris" = 6 tokens -> 4 trigrams, all
    // present verbatim in doc 0
    assert(r(0L) == 4L, s"expected 4 trigram hits, got ${r(0L)}")
    assert(!r.contains(1L), "word-level overlap must not flag without a shared trigram")
    assert(!r.contains(2L) && !r.contains(3L))
  }

  test("minHits raises the evidence bar") {
    val r = Decontamination.contaminated(corpus, benchmark, n = 3, minHits = 5)
      .collect()
    assert(r.isEmpty, "4 hits < minHits=5 must not flag")
  }

  test("benchmark side is deduplicated and broadcast") {
    val p = Decontamination.contaminated(corpus, benchmark, n = 3)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("substring contamination: a quoted run is caught, word soup is not") {
    // w=4, k=3 ⇒ any shared run of ≥ 6 tokens guarantees ≥ 1 shared
    // fingerprint; the planted 8-token quote yields ≥ 2
    val bench = Seq(
      (100L, "ignore this preamble the quick brown fox jumps over the " +
        "lazy dog and some closing words")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "report intro: the quick brown fox jumps over the lazy dog " +
        "end of quote"),
      // same words, scrambled order — no shared token run
      (1L, "dog lazy the over jumps fox brown quick the analysis"),
      (2L, "entirely unrelated content"),
    ).toDF("doc_id", "text")
    val r = Decontamination.contaminatedSubstring(docs, bench,
        k = 3, window = 4, minShared = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.contains(0L), s"quoted passage not flagged: $r")
    assert(!r.contains(1L), "scrambled words must not flag")
    assert(!r.contains(2L))
  }

  test("substring contamination: benchmark fingerprints broadcast") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val p = Decontamination.contaminatedSubstring(corpus, bench)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }
}
