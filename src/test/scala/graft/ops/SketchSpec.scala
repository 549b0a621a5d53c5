package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("HLL cardinality estimate within rsd bounds of exact") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val row = docs.select(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text"), 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    // 2% rsd sketch: allow 5 sigma
    assert(math.abs(approx - exact) / exact < 0.10,
      s"approx $approx vs exact $exact")
  }

  test("approx quantiles track the exact rank median within accuracy bounds") {
    val r = PipelineQueries.statsQuantiles(spark, sf("sf0.01")).head()
    val exact = r.getDouble(0) // percentile() interpolates -> double
    val approx = r.getDouble(1) // surfaced as scalar DOUBLE for the gate
    // accuracy=1000 bounds the rank error to n/1000 ranks; on 5k docs
    // the value error at the median is small
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
    val (p10, p90) = (r.getDouble(2), r.getDouble(3))
    assert(p10 <= approx && approx <= p90, "p10 <= median <= p90")
  }

  test("stats_median exact half matches a driver-side exact computation") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val r = PipelineQueries.statsMedian(spark, sf("sf0.01")).head()
    val chars = docs.select(col("n_chars").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    val n = chars.length
    val expect =
      if (n % 2 == 1) chars(n / 2)
      else (chars(n / 2 - 1) + chars(n / 2)) / 2.0
    assert(r.getDouble(0) == expect, s"${r.getDouble(0)} vs $expect")
    assert(r.getLong(1) == n)
  }

  test("sketch is partitioning-invariant (mergeable state)") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val a = docs.repartition(1)
      .select(approx_count_distinct(col("text"), 0.02)).head().getLong(0)
    val b = docs.repartition(13)
      .select(approx_count_distinct(col("text"), 0.02)).head().getLong(0)
    assert(a == b, "HLL merge must not depend on partitioning")
  }

  test("grouped HLL: every language's in-plan rel_err stays inside the rsd budget") {
    val rows = PipelineQueries.statsHllByLang(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // rsd 0.02 -> 3-sigma budget 6%; exact column must be the truth
      assert(r.getDouble(3) < 0.06,
        s"lang ${r.getString(0)}: rel_err ${r.getDouble(3)}")
      assert(r.getLong(1) > 0)
    }
  }

  test("CMS top-k: estimates carry the one-sided guarantee (est >= exact, overcount <= eps*N)") {
    val d = sf("sf0.01")
    val rows = PipelineQueries.statsCmsTopk(spark, d).collect()
    assert(rows.length == 20, s"expected the exact top-20, got ${rows.length}")
    val n = Tables.documents(spark, d)
      .select(explode(graft.pipeline.TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0).count()
    for (r <- rows) {
      val (tok, cnt, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= cnt, s"CMS undercounted '$tok': est $est < exact $cnt")
      // eps = 0.001 at 99% confidence per query; 20 queries on a fixed
      // seed are deterministic — this asserts the realized error, not
      // a probabilistic bound
      assert(est - cnt <= (0.001 * n).toLong + 1,
        s"'$tok' overcount ${est - cnt} exceeds eps*N ${(0.001 * n).toLong}")
    }
  }

  test("CMS probe: interpreted path matches codegen path") {
    val d = sf("sf0.001")
    val gen = PipelineQueries.statsCmsTopk(spark, d).collect().toSeq
    val conf = spark.conf
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val old = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val interp = PipelineQueries.statsCmsTopk(spark, d).collect().toSeq
      assert(gen == interp)
    } finally old.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("CMS probe: empty build input yields an empty sketch (all-zero estimates)") {
    // unlike BloomFilterAggregate (which returns NULL on empty input),
    // count_min_sketch serializes the empty sketch — every estimate is
    // 0, the correct count for a corpus with no items
    import SparkSpec.session.implicits._
    val empty = Seq.empty[Long].toDF("k")
    val sketch = empty
      .select(count_min_sketch(col("k"), lit(0.001d), lit(0.99d), lit(42))
        .as("cms")).scalar()
    val probed = Seq(1L, 2L).toDF("k")
      .withColumn("est",
        graft.functions.CmsEstimateCount.cmsEstimate(sketch, col("k")))
      .collect()
    assert(probed.forall(r => !r.isNullAt(1) && r.getLong(1) == 0L),
      "expected zero estimates from the empty sketch")
  }
}
