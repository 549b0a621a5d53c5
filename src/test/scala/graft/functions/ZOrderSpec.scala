package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def reference(a: Long, b: Long): Long = {
    val am = a & ZOrderInterleave.Mask31
    val bm = b & ZOrderInterleave.Mask31
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | (((am >> i) & 1L) << (2 * i + 1)) | (((bm >> i) & 1L) << (2 * i))
    }
  }

  test("magic-number spread matches the bit-by-bit reference") {
    val rng = new scala.util.Random(31)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (ZOrderInterleave.Mask31,
      ZOrderInterleave.Mask31), (-1L, -5L), (Long.MaxValue, Long.MinValue)) ++
      (0 until 200).map(_ => (rng.nextLong(), rng.nextLong()))
    for ((a, b) <- cases)
      assert(ZOrderInterleave.interleave(a, b) == reference(a, b),
        s"mismatch at ($a, $b)")
  }

  test("expression: codegen and interpreted paths agree, NULLs propagate") {
    val df = Seq((Some(5L), Some(9L)), (Some(0L), Some(0L)),
      (Option.empty[Long], Some(3L)), (Some(3L), Option.empty[Long]))
      .toDF("a", "b")
    def run(): Seq[Option[Long]] = df
      .select(ZOrderInterleave.zorder2(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val gen = run()
    assert(gen == Seq(Some(reference(5, 9)), Some(0L), None, None))
    val conf = spark.conf
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == gen)
    finally {
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("z-order layout prunes files for a predicate on the SECOND column") {
    // the data-skipping claim made measurable: 4096 uniform points,
    // chunked 64-per-"file"; a file is read iff its min/max footer
    // rectangle intersects the predicate. Under a-sorted layout every
    // file spans (nearly) the full b range, so a b-only predicate
    // reads everything; under z-order files are square-ish, so the
    // same predicate prunes most of them — the multi-column win.
    val rng = new scala.util.Random(42)
    val pts = Array.fill(4096)((rng.nextInt(1 << 20).toLong,
      rng.nextInt(1 << 20).toLong))
    def rects(sorted: Array[(Long, Long)]): Seq[(Long, Long)] =
      sorted.grouped(64).map { c =>
        (c.map(_._2).min, c.map(_._2).max)
      }.toSeq
    val (loB, hiB) = (1L << 19, (1L << 19) + (1L << 14)) // narrow b slab
    def filesRead(sorted: Array[(Long, Long)]): Int =
      rects(sorted).count { case (mn, mx) => mn <= hiB && mx >= loB }
    val zRead = filesRead(
      pts.sortBy { case (a, b) => ZOrderInterleave.interleave(a, b) })
    val aRead = filesRead(pts.sortBy(_._1))
    val files = pts.length / 64
    assert(aRead > files / 2,
      s"fixture broken: a-sorted layout should read ~all files, read $aRead/$files")
    assert(zRead * 4 <= aRead,
      s"z-order pruning missing: read $zRead/$files files vs $aRead under a-sort")
  }
}
