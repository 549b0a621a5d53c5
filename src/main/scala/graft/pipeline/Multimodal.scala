package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata accompanying an opaque media payload. */
case class MediaMeta(nBytes: Long, kind: String)

/** One media row: opaque payload bytes + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Extracted feature vector for one media row. */
case class MediaFeatures(doc_id: Long, nBytes: Long, features: Array[Float])

/** Multimodal-column plumbing (SURVEY.md §2.3): image/audio/video
  * modeled as opaque `binary` columns with typed metadata, flowing
  * through Parquet/Spark untouched until an explicit decode stage.
  *
  * The decode itself is STUBBED — no image/audio libraries exist in
  * this environment — with a deterministic fake, but every Spark-side
  * concern is real and tested: the binary schema, the batched
  * per-partition decode shape (the Scala twin of a `mapInPandas`
  * batch UDF: decoders amortize model/codec init per BATCH, not per
  * row), the fixed-width feature schema, and the frame-sampling
  * column expression.
  *
  * The test tables carry no real media, so `documents.text` bytes
  * stand in as the payload.
  */
/** Pluggable decode contract: a real deployment implements this with
  * an image/audio codec + model (libraries absent in this container);
  * the engine owns the distribution concerns — batching, per-batch
  * `open()`/`close()` lifecycle, schema. Implementations must be
  * Serializable (shipped to executors once, opened per batch). */
trait MediaDecoder extends Serializable {
  /** Called once per decode batch before any `decode` — amortize
    * codec/model initialization here. */
  def open(): Unit = ()
  /** Called once per batch after the last `decode`. */
  def close(): Unit = ()
  def decode(payload: Array[Byte], meta: MediaMeta): Array[Float]
}

object Multimodal {

  val FeatureDim = 8
  val DecodeBatchSize = 64

  /** The container-default decoder: deterministic in the payload bytes
    * (see decodeStub) so the pipeline is testable without codecs. */
  object StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] =
      decodeStub(payload)
  }

  /** Present documents as media rows: payload = utf8 bytes, metadata
    * derived in-plan. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text")).cast("long").as("nBytes"),
        lit("text/plain").as("kind")).as("meta"))

  /** STUB decode: a real pipeline would decode the payload with an
    * image/audio codec here (the libraries are absent in this
    * container). The fake is deterministic in the payload bytes so
    * tests are stable: feature j = normalized splitmix64 of
    * (byteHash, j). */
  private[pipeline] def decodeStub(payload: Array[Byte]): Array[Float] = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < payload.length) {
      h = (h ^ payload(i)) * 0xBF58476D1CE4E5B9L
      i += 1
    }
    Array.tabulate(FeatureDim) { j =>
      var z = h + j * 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toFloat / (1L << 53).toFloat
    }
  }

  /** Batched feature extraction over media rows: grouped into
    * fixed-size batches inside each partition — the real decode-UDF
    * shape (batch-level codec/model amortization via the decoder's
    * open/close lifecycle). */
  def extractFeatures(media: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        decoder.open()
        try batch.map { row =>
          MediaFeatures(row.doc_id, row.meta.nBytes,
            decoder.decode(row.payload, row.meta))
        } finally decoder.close()
      }
    }
  }

  /** Resize as a decode-stage operation: payload downsampled to at
    * most `targetBytes` via 1-D nearest-neighbor selection (index
    * ⌊i·n/m⌋) — the actual resize algorithm, applied to raw bytes
    * because the pixel decode is stubbed (a real deployment decodes
    * with a codec first and resamples in pixel space; the Spark-side
    * shape — typed rows in, typed rows out, metadata updated in step —
    * is identical). Never upsamples: bytes cannot be invented without
    * a codec. */
  def resize(media: DataFrame, targetBytes: Int): Dataset[MediaRow] = {
    require(targetBytes >= 0)
    import media.sparkSession.implicits._
    media.as[MediaRow].map { row =>
      val n = row.payload.length
      val m = math.min(targetBytes, n)
      val out =
        if (m == 0) Array.emptyByteArray
        else Array.tabulate(m)(i => row.payload((i.toLong * n / m).toInt))
      MediaRow(row.doc_id, out, MediaMeta(m.toLong, row.meta.kind))
    }
  }

  /** 64-bit average-hash (aHash) per media row — the classic
    * perceptual fingerprint: downsample the payload to 64 "pixels"
    * (nearest-neighbor index ⌊i·n/64⌋, the resize op's kernel), bit i
    * = pixel i above the mean. Runs in the decode stage (typed rows),
    * like every payload-touching op here; with a real codec the same
    * 64 samples come from an 8×8 grayscale resize — the algorithm and
    * everything downstream are unchanged. Empty payloads hash to 0
    * and are excluded by the pair generator (the blank-doc discipline
    * of the text dedup family). */
  def perceptualHashes(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].map { row =>
      val n = row.payload.length
      val h =
        if (n == 0) 0L
        else {
          val px = Array.tabulate(64)(i =>
            row.payload((i.toLong * n / 64).toInt) & 0xFF)
          val mean = px.sum.toDouble / 64
          var acc = 0L
          var b = 0
          while (b < 64) {
            if (px(b) > mean) acc |= 1L << b
            b += 1
          }
          acc
        }
      (row.doc_id, n.toLong, h)
    }.toDF("doc_id", "n_bytes", "phash")
  }

  /** Near-duplicate media pairs: aHash hamming distance <= maxHamming,
    * found via the same 4-chunk pigeonhole banding as the text
    * SimHash family (exact for maxHamming <= 3: 4 chunks, <= 3
    * differing bits, so >= 1 chunk matches). The 100 TB shape is the
    * bucket join on (chunk, ckey) — never an all-pairs comparison. */
  def perceptualNearDup(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-chunk pigeonhole banding is exact only for maxHamming <= 3, " +
        s"got $maxHamming")
    val ph = perceptualHashes(media)
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("phash"),
        posexplode(array((0 until 4).map { c =>
          shiftright(col("phash"), c * 16).bitwiseAND(lit(0xFFFFL))
        }: _*)).as(Seq("chunk", "ckey")))
    val a = ph.alias("a")
    val b = ph.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        graft.pipeline.TextFunctions.hamming64(
          col("a.phash"), col("b.phash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame sampling as a pure column expression: split the payload into
    * `frames` fixed-width byte slices (think keyframe extraction),
    * emitted (doc_id, frame_idx, frame_bytes). Runs in-plan — no UDF. */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    val frameSize = (octet_length(col("payload")) / frames).cast("int")
    media
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)),
          i => col("payload").substr((i * frameSize + 1).cast("int"),
            frameSize))).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"))
  }
}
