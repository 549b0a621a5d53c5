package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("en"), Some(10L)),
    (Some(2L), Some("en"), Some(20L)),
    (Some(3L), Some("de"), None),
    (Some(4L), None, Some(20L)),
    (Some(4L), Some("fr"), Some(30L))) // duplicate id 4
    .toDF("id", "lang", "v")

  test("profile: one row per column with exact counts and string min/max") {
    val r = Profile.profile(df, Seq("id", "lang", "v")).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4), x.getString(5)))
      .toMap
    assert(r("id") == ((5L, 0L, 4L, "1", "4")))
    assert(r("lang") == ((4L, 1L, 3L, "de", "fr")))
    assert(r("v") == ((4L, 1L, 3L, "10", "30")))
  }

  test("validate: planted violations are counted; NULL predicates violate") {
    val out = Profile.validate(df,
      Seq(
        "v_positive" -> (col("v") > 0L),          // NULL v -> violation
        "lang_known" -> col("lang").isin("en", "de", "fr"), // NULL lang -> violation
        "id_small" -> (col("id") < 4L)),          // two rows with id=4
      uniqueCols = Seq("id"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("v_positive") == ((5L, 1L)), "the NULL v row must violate")
    assert(out("lang_known") == ((5L, 1L)), "the NULL lang row must violate")
    assert(out("id_small") == ((5L, 2L)))
    assert(out("id_unique") == ((5L, 1L)),
      "one row beyond the first of the duplicated key")
  }

  test("validate: rejects an empty rule set") {
    intercept[IllegalArgumentException](Profile.validate(df, Nil, Nil))
  }

  test("histogram: equi-width buckets partition the range; max lands in the last") {
    val vals = (0L until 100L).map(v => ("g", v)).toDF("grp", "x")
    val r = Profile.histogram(vals, "grp", "x", buckets = 10).collect()
      .map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r.keySet == (0L until 10L).toSet)
    // width = (99-0+1)/10 = 10: bucket b holds exactly [10b, 10b+9]
    for (b <- 0L until 10L)
      assert(r(b) == ((10L, 10 * b, 10 * b + 9)), s"bucket $b: ${r(b)}")
  }

  test("histogram: constant column collapses to one bucket; NULLs drop") {
    val vals = Seq(("g", Some(7L)), ("g", Some(7L)), ("g", Option.empty[Long]))
      .toDF("grp", "x")
    val r = Profile.histogram(vals, "grp", "x", buckets = 10).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 0L && r.head.getLong(2) == 2L)
  }

  test("histogram: groups share the GLOBAL bounds, so buckets align across groups") {
    val vals = ((0L until 50L).map(v => ("a", v)) ++
      (50L until 100L).map(v => ("b", v))).toDF("grp", "x")
    val r = Profile.histogram(vals, "grp", "x", buckets = 10).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    // group a occupies buckets 0-4 of the shared [0,99] range, b 5-9
    assert((0L to 4L).forall(b => r(("a", b)) == 10L))
    assert((5L to 9L).forall(b => r(("b", b)) == 10L))
    assert(!r.contains(("a", 5L)) && !r.contains(("b", 4L)))
  }

  test("equi-depth: quartile boundaries give four equal buckets on 1..100") {
    val vals = (1L to 100L).map(v => ("g", v)).toDF("grp", "x")
    val r = Profile.histogramEquiDepth(vals, "grp", "x", buckets = 4)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    // boundaries at ranks 25/50/75/100 → buckets of exactly 25
    assert(r == Map(1L -> 25L, 2L -> 25L, 3L -> 25L, 4L -> 25L), r.toString)
  }

  test("equi-depth: a heavy tail still fills both buckets (where equi-width starves)") {
    // 9 small values + one huge outlier: equi-depth splits 5/5 at the
    // median; equi-width would pile 9 rows into bucket 0
    val vals = ((1L to 9L) :+ 1000L).map(v => ("g", v)).toDF("grp", "x")
    val r = Profile.histogramEquiDepth(vals, "grp", "x", buckets = 2)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r == Map(1L -> 5L, 2L -> 5L), r.toString)
  }

  test("equi-depth: duplicate boundaries collapse ties into the first bucket") {
    // constant column: every boundary equals 5, every value lands in
    // bucket 1 (|{b < 5}| = 0) — no empty-bucket artifacts, NULLs drop
    val vals = Seq(("g", Some(5L)), ("g", Some(5L)), ("g", Some(5L)),
      ("g", Option.empty[Long])).toDF("grp", "x")
    val r = Profile.histogramEquiDepth(vals, "grp", "x", buckets = 4)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r == Map(1L -> 3L), r.toString)
  }

  test("drift: identical slices give TVD 0; disjoint ranges give TVD 1") {
    val a = ((1L to 50L).map(v => ("g", v))).toDF("grp", "x")
    val same = Profile.distributionDrift(a, a, "grp", "x", buckets = 5)
      .collect().head
    assert(same.getLong(1) == 50L && same.getLong(2) == 50L)
    assert(same.getDouble(3) == 0.0, same.toString)
    // b entirely in the top bucket of the shared range
    val b = ((1000L to 1049L).map(v => ("g", v))).toDF("grp", "x")
    val far = Profile.distributionDrift(a, b, "grp", "x", buckets = 5)
      .collect().head
    assert(far.getDouble(3) == 1.0, far.toString)
  }

  test("drift: hand-computed TVD on an uneven split, empty side yields NULL") {
    // shared bounds 1..4, 4 buckets, bucket = value-1.
    // a: [3,1,0,0] of 4; b: [1,1,1,1] of 4
    // |ca·tb − cb·ta| per bucket with ta=tb=4: |12−4|+|4−4|+|0−4|+|0−4| = 16
    // TVD = 16 / (2·4·4) = 0.5
    val a = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 2L))
      .toDF("grp", "x")
    val b = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L))
      .toDF("grp", "x")
    val r = Profile.distributionDrift(a, b, "grp", "x", buckets = 4)
      .collect().head
    assert(r.getDouble(3) == 0.5, r.toString)
    // a group present only on one side: NULL tvd, not a crash
    val b2 = Seq(("h", 7L)).toDF("grp", "x")
    val rows = Profile.distributionDrift(a, b2, "grp", "x", buckets = 4)
      .collect().map(x => x.getString(0) -> x.isNullAt(3)).toMap
    assert(rows("g") === true && rows("h") === true,
      "one-sided groups must yield NULL tvd")
  }

  test("histogram: a full-int64 value range cannot wrap the bucket formula") {
    // the round-8 int64 spelling wrapped at (v − lo)·buckets > 2⁶³;
    // the DECIMAL(38,0) widening must bucket the extremes exactly —
    // including a hi − lo span that itself exceeds Long.MaxValue
    val lo = Long.MinValue / 2
    val hi = Long.MaxValue / 2
    val vals = Seq(("g", lo), ("g", -1L), ("g", 0L), ("g", hi / 2), ("g", hi))
      .toDF("grp", "x")
    val r = Profile.histogram(vals, "grp", "x", buckets = 10).collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    def want(v: Long): Long =
      math.min(9L,
        ((BigInt(v) - lo) * 10 / (BigInt(hi) - BigInt(lo) + 1)).toLong)
    val expected = Seq(lo, -1L, 0L, hi / 2, hi).groupBy(want)
      .map { case (b, vs) => b -> vs.size.toLong }
    assert(r == expected, s"got $r want $expected")
  }

  test("histogram / drift: non-integral value columns are rejected up front") {
    val d = Seq(("g", 1.5)).toDF("grp", "x")
    intercept[IllegalArgumentException](
      Profile.histogram(d, "grp", "x", buckets = 4))
    intercept[IllegalArgumentException](
      Profile.distributionDrift(d, d, "grp", "x", buckets = 4))
  }

  test("drift: extreme shared bounds bucket identically on both sides") {
    val a = Seq(("g", Long.MinValue / 2), ("g", 0L)).toDF("grp", "x")
    val b = Seq(("g", Long.MinValue / 2), ("g", 0L)).toDF("grp", "x")
    val r = Profile.distributionDrift(a, b, "grp", "x", buckets = 7)
      .collect().head
    assert(r.getDouble(3) == 0.0, r.toString)
  }

  test("equi-depth: per-group boundaries are independent across groups") {
    val vals = ((1L to 8L).map(v => ("small", v)) ++
      (101L to 108L).map(v => ("big", v))).toDF("grp", "x")
    val r = Profile.histogramEquiDepth(vals, "grp", "x", buckets = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    // each group splits 4/4 at its OWN median, not a shared range
    assert(r == Map(("small", 1L) -> 4L, ("small", 2L) -> 4L,
      ("big", 1L) -> 4L, ("big", 2L) -> 4L), r.toString)
  }

  test("snapshotDiff: all four statuses, null-safe fingerprints, new-side group attribution") {
    val old = Seq(
      (1L, Some("a"), "en"), // unchanged
      (2L, Some("b"), "en"), // changed (content)
      (3L, Some("c"), "de"), // removed
      (4L, None, "de"),      // unchanged via NULL <=> NULL
      (5L, Some("e"), "en")) // changed + moves en -> fr
      .toDF("id", "fp", "g")
    val neu = Seq(
      (1L, Some("a"), "en"),
      (2L, Some("B"), "en"),
      (4L, None, "de"),
      (5L, Some("E"), "fr"),
      (9L, Some("x"), "fr")) // added
      .toDF("id", "fp", "g")
    val r = Profile.snapshotDiff(old, neu, "id", "fp", "g")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2))
      .toMap
    assert(r == Map(
      ("en", "unchanged") -> 1L, ("en", "changed") -> 1L,
      ("de", "removed") -> 1L, ("de", "unchanged") -> 1L,
      ("fr", "changed") -> 1L, // id 5 counts under its NEW language
      ("fr", "added") -> 1L), r.toString)
  }
}
