package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {

  import SparkSpec.session.implicits._
  import UnicodeNormalize.unicodeNormalize

  // "é" composed (U+00E9) vs decomposed (e + U+0301 combining acute)
  private val composed = "caf\u00e9"
  private val decomposed = "cafe\u0301"

  test("NFC unifies composed and decomposed encodings of the same text") {
    val df = Seq((0L, composed), (1L, decomposed)).toDF("id", "t")
    val norm = df.select(unicodeNormalize(col("t"), "NFC")).collect()
      .map(_.getString(0))
    assert(norm(0) == norm(1), "NFC must canonicalize to one encoding")
    assert(norm(0) == composed, "NFC composes")
    // and the downstream consequence: exact dedup now groups them
    val grouped = graft.pipeline.Dedup.exact(
      df.select(col("id").as("doc_id"),
        unicodeNormalize(col("t"), "NFC").as("text")))
      .collect()
    assert(grouped.length == 1 && grouped.head.getLong(2) == 2L,
      "normalized dup pair must collapse to one group")
  }

  test("NFKC folds compatibility characters NFC leaves alone") {
    val ligature = "\ufb01le" // "file" with the fi ligature
    val df = Seq(Tuple1(ligature)).toDF("t")
    val r = df.select(
      unicodeNormalize(col("t"), "NFC").as("nfc"),
      unicodeNormalize(col("t"), "NFKC").as("nfkc")).collect().head
    assert(r.getString(0) == ligature, "NFC must not fold the ligature")
    assert(r.getString(1) == "file", "NFKC must fold the ligature")
  }

  test("codegen and interpreted paths agree; NULL propagates") {
    val df = Seq(Some(decomposed), None).toDF("t")
    def run() = df.select(unicodeNormalize(col("t"), "NFC")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq
    val gen = run()
    assert(gen == Seq(Some(composed), None))
    val conf = spark.conf
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == gen)
    finally {
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("an invalid form name fails at analysis, not per row") {
    val df = Seq(Tuple1("x")).toDF("t")
    val e = intercept[Exception] {
      df.select(unicodeNormalize(col("t"), "NOT_A_FORM")).collect()
    }
    assert(e.getMessage.contains("NFC") || e.getMessage.contains("form"),
      s"unexpected error: ${e.getMessage}")
  }
}
