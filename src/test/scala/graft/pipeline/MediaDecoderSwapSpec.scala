package graft.pipeline

import graft.SparkSpec
import org.apache.spark.util.LongAccumulator

/** The declared multimodal refusal scope, asserted as a CONTRACT: no
  * image/audio codec exists in this container, so `Multimodal.decode`
  * is stubbed — but the swap-in boundary (`MediaDecoder`) must carry a
  * real codec without touching anything downstream. This spec injects
  * a fake codec at that boundary and proves:
  *   1. the injected decoder's output flows through unchanged
  *      (behavior swaps exactly at the boundary);
  *   2. the batch lifecycle holds (open/close once per
  *      DecodeBatchSize batch, close even though decode ran) — the
  *      amortization contract a real model/codec depends on;
  *   3. every payload-path op that does NOT decode (resize,
  *      frame-sample, perceptual hash) is bit-identical regardless of
  *      the decoder — the swap cannot leak.
  */
class MediaDecoderSwapSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def fixture(n: Int) = Multimodal.asMedia(
    (0 until n).map(i => (i.toLong, "x" * (i % 17 + 1), "en"))
      .toDF("doc_id", "text", "lang"))

  test("injected codec's output flows through the feature path unchanged") {
    val sc = spark.sparkContext
    val (o, c, d) = (sc.longAccumulator, sc.longAccumulator, sc.longAccumulator)
    val media = fixture(10)
    val feats = Multimodal.extractFeatures(media, new CountingDecoder(o, c, d))
      .collect().map(f => f.doc_id -> f).toMap
    // schema/shape identical to the stub path
    val stub = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats.keySet == stub.keySet)
    assert(feats.values.forall(_.features.length == Multimodal.FeatureDim))
    // values are the INJECTED codec's, not the stub's: feature j =
    // payload length + j, byte length known from the fixture text
    for ((id, f) <- feats) {
      val expectLen = (id % 17 + 1).toFloat
      assert(f.features.toSeq == (0 until Multimodal.FeatureDim)
        .map(j => expectLen + j), s"doc $id decoded through the wrong codec")
      assert(f.nBytes == expectLen.toLong)
    }
    assert(d.value == 10L)
  }

  test("batch lifecycle: open/close once per DecodeBatchSize batch, " +
      "close runs even when decode is exercised") {
    val sc = spark.sparkContext
    val (o, c, d) = (sc.longAccumulator, sc.longAccumulator, sc.longAccumulator)
    val n = Multimodal.DecodeBatchSize * 2 + 7 // 3 batches on one partition
    val media = fixture(n).repartition(1)
    Multimodal.extractFeatures(media, new CountingDecoder(o, c, d)).count()
    assert(d.value == n.toLong)
    assert(o.value == 3L, s"expected 3 batch opens, got ${o.value}")
    assert(c.value == o.value, "every open must be paired with a close")
  }

  test("non-decode payload ops are decoder-independent (the swap cannot leak)") {
    val media = fixture(20)
    // none of these take a decoder; assert they are deterministic and
    // byte-identical across two independent plans — the downstream the
    // refusal scope promises stays unchanged under any codec swap
    def render(v: Any): String = v match {
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case r: org.apache.spark.sql.Row => r.toSeq.map(render).mkString("[", ",", "]")
      case x => String.valueOf(x)
    }
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => render(r)).sorted.toSeq
    assert(sig(Multimodal.resize(media, 8).toDF()) ==
      sig(Multimodal.resize(media, 8).toDF()))
    assert(sig(Multimodal.sampleFrames(media, 4)) ==
      sig(Multimodal.sampleFrames(media, 4)))
    assert(sig(Multimodal.perceptualHashes(media)) ==
      sig(Multimodal.perceptualHashes(media)))
  }
}

/** A "real codec" stand-in: constant-feature decode plus
  * accumulator-counted lifecycle calls (accumulators because the
  * decoder runs on executors; a plain var would count nothing).
  * Top-level so serializing it does not drag the spec instance along
  * — exactly the constraint a production codec implementation faces.
  */
private class CountingDecoder(opens: LongAccumulator,
    closes: LongAccumulator, decodes: LongAccumulator)
    extends MediaDecoder {
  override def open(): Unit = opens.add(1)
  override def close(): Unit = closes.add(1)
  override def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    decodes.add(1)
    Array.tabulate(Multimodal.FeatureDim)(j => payload.length.toFloat + j)
  }
}
