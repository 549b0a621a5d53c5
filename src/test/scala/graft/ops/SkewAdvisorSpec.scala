package graft.ops

import graft.SparkSpec
import graft.sources.{QuantileStats, VersionedTable}
import org.apache.spark.sql.functions._

/** The quantile-driven skew advisor ([[SkewAdvisor]]): the chosen
  * salt must TRACK a planted skew — uniform high-cardinality key →
  * salt 1 (don't salt), 90%-one-key → salt ≈ parallelism — and the
  * advisor must refuse to guess when no statistics cover the column.
  * The advised join must stay exactly the plain join's answer. */
class SkewAdvisorSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("skewadv").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  test("modalMass reads a planted heavy hitter off the sketch: 90% " +
    "one value reads ~0.9, uniform reads ~1/n") {
    val hot = org.apache.datasketches.kll.KllDoublesSketch
      .newHeapInstance(200)
    (1 to 900).foreach(_ => hot.update(5.0))
    (1 to 100).foreach(i => hot.update(1000.0 + i))
    val m = QuantileStats.modalMass(hot).get
    assert(math.abs(m - 0.9) < 0.05, s"hot mass ~0.9, got $m")
    val uni = org.apache.datasketches.kll.KllDoublesSketch
      .newHeapInstance(200)
    (1 to 1000).foreach(i => uni.update(i.toDouble))
    val mu = QuantileStats.modalMass(uni).get
    assert(mu < 0.05, s"uniform mass ~0.001, got $mu")
    assert(QuantileStats.modalMass(
      org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200))
      .isEmpty, "empty sketch has no mass")
  }

  test("saltFor sizing: clamps to [1, parallelism], tracks the share") {
    assert(SkewAdvisor.saltFor(0.001, 32) == 1, "uniform: don't salt")
    assert(SkewAdvisor.saltFor(0.9, 32) == 29)
    assert(SkewAdvisor.saltFor(1.0, 32) == 32)
    assert(SkewAdvisor.saltFor(2.0, 32) == 32, "clamped at parallelism")
    assert(SkewAdvisor.saltFor(1.0 / 3, 32) == 11, "ndv-3 floor")
  }

  test("a planted 90%-one-key column advises salt ~parallelism from " +
    "the KLL pin; a uniform key advises 1; the salted join is exact") {
    val root = freshRoot()
    // key: 90% of rows carry 0, the rest spread over 1..96
    val df = spark.range(0, 2000).select(
      $"id",
      when($"id" % 10 =!= 0, lit(0L))
        .otherwise($"id" % 96 + 1).as("k"),
      ($"id" * 3 % 101).as("u"))
    VersionedTable.init(spark, root, df)
    intercept[IllegalArgumentException] {
      SkewAdvisor.advise(spark, root, "k", 32)
    }
    VersionedTable.enableQuantileStats(spark, root, Seq("k", "u"))
    val hot = SkewAdvisor.advise(spark, root, "k", 32)
    assert(hot.basis == "kll-mass")
    assert(math.abs(hot.hotShare - 0.9) < 0.05,
      s"measured hot share ~0.9, got $hot")
    assert(hot.salt >= 26 && hot.salt <= 32,
      s"salt tracks the planted skew (~29), got $hot")
    val uni = SkewAdvisor.advise(spark, root, "u", 32)
    assert(uni.salt == 1, s"uniform key: don't salt, got $uni")
    // the advised salt preserves the join answer exactly
    val big = VersionedTable.read(spark, root)
    val dim = spark.range(0, 97).select($"id".as("k"),
      concat(lit("d"), $"id").as("attr"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").collect().map(_.toSeq).toSeq
    val plain = canon(big.join(dim, Seq("k"))
      .select($"id", $"k", $"attr"))
    val advised = canon(
      Skew.saltedJoin(big, dim, Seq("k"), salts = hot.salt)
        .select($"id", $"k", $"attr"))
    assert(advised == plain)
  }

  test("NDV floor: a quantile-less string key with ndv < parallelism " +
    "advises the pigeonhole minimum; high-ndv string advises 1") {
    val root = freshRoot()
    val df = spark.range(0, 999).select(
      $"id",
      concat(lit("s"), $"id" % 3).as("low"),
      concat(lit("x"), $"id").as("high"))
    VersionedTable.init(spark, root, df)
    VersionedTable.enableNdvStats(spark, root, Seq("low", "high"))
    val low = SkewAdvisor.advise(spark, root, "low", 32)
    assert(low.basis == "ndv-floor" && low.salt == 11,
      s"ndv=3 floor: ceil(32/3)=11, got $low")
    val high = SkewAdvisor.advise(spark, root, "high", 32)
    assert(high.salt == 1, s"high-ndv floor is no salt, got $high")
  }

  test("composite keys use the projection bound: one uniform covered " +
    "key proves the composite uniform; hot-only coverage bounds from " +
    "above; no measured coverage refuses") {
    val root = freshRoot()
    // k hot (90% one value), u uniform, s uncovered string
    val df = spark.range(0, 2000).select(
      $"id",
      when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 96 + 1).as("k"),
      ($"id" * 7 % 997).as("u"),
      concat(lit("x"), $"id").as("s"))
    VersionedTable.init(spark, root, df)
    VersionedTable.enableQuantileStats(spark, root, Seq("k", "u"))
    // (k, u): u's uniform marginal caps the composite — salt 1 even
    // though k alone is 90%-hot
    val both = SkewAdvisor.adviseComposite(spark, root,
      Seq("k", "u"), 32)
    assert(both.salt == 1 && both.basis == "composite-min(u)",
      s"uniform marginal proves the composite uniform, got $both")
    // (k, s): only the hot marginal is covered — a sound upper bound
    val hotOnly = SkewAdvisor.adviseComposite(spark, root,
      Seq("k", "s"), 32)
    assert(hotOnly.salt >= 26 && hotOnly.basis == "composite-min(k)",
      s"hot-only coverage bounds from above, got $hotOnly")
    // exact: the composite-salted join equals the plain join
    val big = VersionedTable.read(spark, root)
    val dim = spark.range(0, 97).crossJoin(
        spark.range(0, 10).select(($"id" * 7 % 997).as("u")))
      .select($"id".as("k"), $"u", concat(lit("d"), $"id").as("attr"))
      .dropDuplicates("k", "u")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"id", $"k", $"u", $"attr").orderBy("id")
        .collect().map(_.toSeq).toSeq
    assert(canon(Skew.saltedJoin(big, dim, Seq("k", "u"),
        salts = hotOnly.salt)) ==
      canon(big.join(dim, Seq("k", "u"))))
    // nothing measured → refusal
    intercept[IllegalArgumentException] {
      SkewAdvisor.adviseComposite(spark, root, Seq("s"), 32)
    }
  }

  test("kll-mass wins over ndv-floor when both are pinned (measured " +
    "beats bound)") {
    val root = freshRoot()
    val df = spark.range(0, 1000).select(
      $"id",
      when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"))
    VersionedTable.init(spark, root, df)
    VersionedTable.enableNdvStats(spark, root, Seq("k"))
    VersionedTable.enableQuantileStats(spark, root, Seq("k"))
    val a = SkewAdvisor.advise(spark, root, "k", 32)
    assert(a.basis == "kll-mass", s"measured mass preferred, got $a")
  }
}
