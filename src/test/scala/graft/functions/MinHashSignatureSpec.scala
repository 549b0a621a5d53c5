package graft.functions

import graft.SparkSpec
import graft.pipeline.TextFunctions
import org.apache.spark.sql.functions._

class MinHashSignatureSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // identical set
    (2L, "the quick brown fox leaps over the lazy dog"), // 1 token off
    (3L, "entirely different vocabulary here"),
  ).toDF("doc_id", "text")

  private def sigs(k: Int): Map[Long, Seq[Long]] =
    docs.select(col("doc_id"),
      MinHashSignature.minhashSignature(
        TextFunctions.tokenSet(col("text")), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  test("identical token sets get identical signatures; disjoint ones differ") {
    val s = sigs(32)
    assert(s(0L) == s(1L))
    assert(s(0L) != s(3L))
    assert(s.values.forall(_.length == 32))
  }

  test("signature agreement rate tracks Jaccard similarity") {
    val s = sigs(256)
    def agree(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y } / a.length.toDouble
    // docs 0 and 2 share 8 of 9 distinct tokens -> J ~= 0.8
    val near = agree(s(0L), s(2L))
    assert(near > 0.6 && near < 0.95, s"near-dup agreement $near")
    // unrelated docs agree on almost nothing
    assert(agree(s(0L), s(3L)) < 0.2)
  }

  test("codegen and interpreted paths agree") {
    val expr = MinHashSignature.minhashSignature(
      TextFunctions.tokenSet(col("text")), 16)
    val on = docs.select(expr).collect().map(_.getSeq[Long](0).toSeq)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = docs.select(expr).collect().map(_.getSeq[Long](0).toSeq)
      assert(on.toSeq == off.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("empty input yields the MaxValue sentinel signature") {
    val r = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(MinHashSignature.minhashSignature(col("sh"), 4))
      .collect().head.getSeq[Long](0)
    assert(r == Seq.fill(4)(Long.MaxValue))
  }
}
