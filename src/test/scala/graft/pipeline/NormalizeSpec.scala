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

  test("winsorize clips to the exact discrete p10/p90 per group") {
    // group a: 1..10 -> rank ceil(0.1*10)=1 => lo=1, rank ceil(0.9*10)=9 => hi=9
    val df = ((1L to 10L).map(v => ("a", v, v)) ++
      Seq(("b", 100L, 7L), ("b", 101L, 7L)))
      .toDF("grp", "id", "v")
    val got = Normalize.winsorizeByGroup(df, "grp", "v")
      .select("id", "clipped").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(9L) == 9L)
    assert(got(10L) == 9L, "the max must clip down to p90")
    // constant group: lo == hi == 7, everything clips to 7
    assert(got(100L) == 7L && got(101L) == 7L)
  }

  test("winsorize passes NULL values through unclipped") {
    val df = Seq(("a", 1L, Some(5L)), ("a", 2L, Some(10L)),
      ("a", 3L, Option.empty[Long])).toDF("grp", "id", "v")
    val rows = Normalize.winsorizeByGroup(df, "grp", "v")
      .select("id", "clipped").collect()
    val byId = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byId(3L).isEmpty, "NULL value must yield NULL clipped")
    assert(byId(1L).nonEmpty && byId(2L).nonEmpty)
  }

  test("winsorize never drops rows: limitless groups pass through unclipped") {
    // group "b" has only NULL values (no limits row exists); the NULL
    // group key matches no limits row (equality join). All rows must
    // survive the LEFT join; values without limits pass UNCLIPPED
    // (greatest/least ignore the NULL bounds), NULL values stay NULL.
    val df = Seq(
      (Some("a"), 1L, Some(5L)), (Some("a"), 2L, Some(10L)),
      (Some("b"), 3L, Option.empty[Long]),
      (Option.empty[String], 4L, Some(7L)))
      .toDF("grp", "id", "v")
    val rows = Normalize.winsorizeByGroup(df, "grp", "v")
      .select("id", "clipped").collect()
    assert(rows.length == 4, s"rows were dropped: ${rows.mkString(",")}")
    val byId = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byId(3L).isEmpty, "all-NULL group's NULL value stays NULL")
    assert(byId(4L).contains(7L), "NULL group key passes through unclipped")
    assert(byId(1L).nonEmpty && byId(2L).nonEmpty)
  }

  test("corr matches the same fixed IEEE tree computed locally") {
    val data = Seq(("a", 3L, 9L), ("a", 7L, 2L), ("a", 11L, 30L),
      ("a", 2L, 5L), ("b", 1L, 10L), ("b", 2L, 8L), ("b", 3L, 9L))
    val got = Normalize.corrByGroup(data.toDF("grp", "x", "y"), "grp", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // replicate the exact formula: int64 sums, then the identical
    // double tree — the results must be bit-equal, not approximately
    def expect(rows: Seq[(Long, Long)]): Double = {
      val n = rows.size.toLong
      val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
      val sxx = rows.map(r => r._1 * r._1).sum
      val syy = rows.map(r => r._2 * r._2).sum
      val sxy = rows.map(r => r._1 * r._2).sum
      (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
    }
    for ((g, rows) <- data.groupBy(_._1))
      assert(got(g) == expect(rows.map(r => (r._2, r._3))),
        s"group $g: ${got(g)}")
  }

  test("corr: perfect linear dependence gives r ~ ±1; degenerate groups NULL") {
    val df = Seq(
      ("lin", 1L, 12L), ("lin", 2L, 22L), ("lin", 3L, 32L),  // y = 10x + 2
      ("anti", 1L, 30L), ("anti", 2L, 20L), ("anti", 3L, 10L), // y = -10x + 40
      ("one", 5L, 5L),                                        // n = 1
      ("flat", 1L, 7L), ("flat", 2L, 7L), ("flat", 3L, 7L))   // zero y-variance
      .toDF("grp", "x", "y")
    val r = Normalize.corrByGroup(df, "grp", "x", "y").collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(math.abs(r("lin").get - 1.0) < 1e-12)
    assert(math.abs(r("anti").get + 1.0) < 1e-12)
    assert(r("one").isEmpty, "n=1 has no correlation")
    assert(r("flat").isEmpty, "zero variance has no correlation")
  }

  test("robust z-scores match the hand-computed median/MAD per group") {
    // group a: values 10,20,30,100 — median rank ⌈0.5·4⌉=2 → 20;
    // deviations 10,0,10,80 — MAD rank 2 → 10; z = (v−20)/10.
    // The 100 outlier lands at z=8 but moves NEITHER statistic —
    // under zscoreByGroup it would have dragged the mean to 40
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("a", 4L, 100L)).toDF("grp", "id", "v")
    val got = Normalize.robustScaleByGroup(df, "grp", "v")
      .select("id", "robust_z").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == -1.0 && got(2L) == 0.0 && got(3L) == 1.0 &&
      got(4L) == 8.0, got.toString)
  }

  test("robust z: zero MAD yields NULL, and no row is ever dropped") {
    // "flat": 3 of 4 values identical → MAD 0 → NULL z everywhere;
    // NULL value and NULL group key both survive with NULL z
    val df = Seq(
      (Some("flat"), 1L, Some(7L)), (Some("flat"), 2L, Some(7L)),
      (Some("flat"), 3L, Some(7L)), (Some("flat"), 4L, Some(9L)),
      (Some("a"), 5L, Option.empty[Long]),
      (Option.empty[String], 6L, Some(3L)))
      .toDF("grp", "id", "v")
    val rows = Normalize.robustScaleByGroup(df, "grp", "v")
      .select("id", "robust_z").collect()
    assert(rows.length == 6, s"rows were dropped: ${rows.mkString(",")}")
    assert(rows.forall(_.isNullAt(1)), rows.mkString(","))
  }

  test("percentile rank equals the PERCENT_RANK window on random data with ties") {
    val rng = new scala.util.Random(13)
    val df = (1 to 200).map { i =>
      (s"g${i % 3}", i.toLong, rng.nextInt(20).toLong) // heavy ties
    }.toDF("grp", "id", "v")
    val got = Normalize.percentileRankByGroup(df, "grp", "v")
      .select("id", "pct_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = df.withColumn("pct_rank",
        org.apache.spark.sql.functions.percent_rank().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("grp").orderBy("v")))
      .select("id", "pct_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want)
  }

  test("percentile rank: single-row groups rank 0, NULL values stay NULL") {
    val df = Seq(
      (Some("solo"), 1L, Some(42L)),
      (Some("a"), 2L, Some(1L)), (Some("a"), 3L, Some(2L)),
      (Some("a"), 4L, Option.empty[Long]))
      .toDF("grp", "id", "v")
    val rows = Normalize.percentileRankByGroup(df, "grp", "v")
      .select("id", "pct_rank").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).contains(0.0), "single-row group ranks 0")
    assert(rows(2L).contains(0.0) && rows(3L).contains(1.0))
    assert(rows(4L).isEmpty, "NULL value must stay unranked")
  }

  test("exact-integer normalizers reject non-integral value columns") {
    // cast("long") on a DOUBLE column would silently truncate and
    // normalize the wrong numbers — the integer premise is checked
    val d = Seq(("g", 1.5, 2.5)).toDF("grp", "x", "y")
    intercept[IllegalArgumentException](Normalize.zscoreByGroup(d, "grp", "x"))
    intercept[IllegalArgumentException](
      Normalize.robustScaleByGroup(d, "grp", "x"))
    intercept[IllegalArgumentException](
      Normalize.corrByGroup(d, "grp", "x", "y"))
  }

  test("robust z: the statistic joins are broadcast — the corpus never shuffles wide") {
    val docs = graft.ops.Tables.documents(spark, sf("sf0.001"))
    val p = Normalize.robustScaleByGroup(docs, "lang", "n_chars")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), "statistic join fell back to shuffle")
  }
}
