package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  // random keys with repeats, misses, and NULLs on both sides — the
  // prune must be invisible in the result under every key class
  private lazy val rng = new scala.util.Random(7)
  private lazy val fact =
    ((0 until 2000).map(i => (Some(rng.nextInt(500).toLong), i)) ++
      Seq((Option.empty[Long], -1), (Option.empty[Long], -2)))
      .toDF("k", "v")
  private lazy val dim =
    ((0 until 120).map(_ => Some(rng.nextInt(150).toLong)) ++
      Seq(Option.empty[Long]))
      .toDF("dk")

  test("pruned semi join == plain semi join on random keys incl. NULLs") {
    val pruned = BloomPrune.prunedSemiJoin(fact, dim, "k", "dk")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(plain.nonEmpty, "fixture must produce matches")
    assert(pruned.toSeq == plain.toSeq)
  }

  test("sketch probe admits every truly-present key (no false negatives)") {
    val present = fact.join(dim, col("k") === col("dk"), "left_semi")
      .collect().map(_.getInt(1)).toSet
    val sketch = BloomPrune.sketchOf(dim, "dk")
    val passed = fact.filter(BloomPrune.mightContainKey(sketch, col("k")))
      .collect().map(_.getInt(1)).toSet
    assert(present.subsetOf(passed),
      s"sketch dropped true matches: ${present -- passed}")
  }

  test("empty dim yields NULL sketch and an empty (correct) result") {
    val noDim = dim.filter(lit(false))
    assert(BloomPrune.prunedSemiJoin(fact, noDim, "k", "dk").count() == 0L)
  }

  test("q33: the probe filter sits below the semi join on the fact side") {
    val df = Relational.q33BloomSemi(spark, sf("sf0.001"))
    val opt = df.queryExecution.optimizedPlan
    val semis = opt.collect { case j @ Join(_, _, LeftSemi, _, _) => j }
    assert(semis.nonEmpty, s"no semi join in plan:\n$opt")
    val probed = semis.exists(_.left.collect {
      case f: Filter
          if f.condition.find(_.isInstanceOf[BloomFilterMightContain]).nonEmpty =>
        f
    }.nonEmpty)
    assert(probed,
      s"BloomFilterMightContain not below the semi join's fact side:\n$opt")
  }
}
