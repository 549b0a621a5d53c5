package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  test("z-scores match the hand-computed sample-variance formula per group") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 5L), ("b", 5L, 9L)).toDF("grp", "id", "v")
    val got = Normalize.zscoreByGroup(df, "grp", "v")
      .select("id", "z").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // group a: mean 20, sample sd 10 -> z = -1, 0, 1
    assert(math.abs(got(1L) + 1.0) < 1e-12)
    assert(math.abs(got(2L)) < 1e-12)
    assert(math.abs(got(3L) - 1.0) < 1e-12)
    // group b: mean 7, sample sd sqrt(8)
    assert(math.abs(got(4L) - (5.0 - 7.0) / math.sqrt(8.0)) < 1e-12)
  }

  test("degenerate groups (single row, zero variance) yield NULL z, never NaN") {
    val df = Seq(("solo", 1L, 42L), ("flat", 2L, 7L), ("flat", 3L, 7L))
      .toDF("grp", "id", "v")
    val rows = Normalize.zscoreByGroup(df, "grp", "v")
      .select("id", "z").collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(1)))
  }

  test("within each group, z-scores are mean-0 sd-1 on real documents") {
    val docs = graft.ops.Tables.documents(spark, sf("sf0.001"))
    val z = Normalize.zscoreByGroup(docs, "lang", "n_chars")
    val stats = z.groupBy("lang")
      .agg(avg("z").as("m"), stddev("z").as("sd"), count("z").as("n"))
      .collect()
    assert(stats.nonEmpty)
    for (r <- stats if r.getLong(3) > 1) {
      assert(math.abs(r.getDouble(1)) < 1e-9, s"mean off: $r")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"sd off: $r")
    }
  }

  test("the moments join back by broadcast — the corpus never shuffles") {
    val docs = graft.ops.Tables.documents(spark, sf("sf0.001"))
    val p = Normalize.zscoreByGroup(docs, "lang", "n_chars")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), "moment join fell back to shuffle")
  }
}
