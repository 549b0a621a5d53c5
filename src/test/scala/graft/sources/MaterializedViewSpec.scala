package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.sources.{MaterializedView => MV}

/** The materialized-view contract: `refresh` after ANY history of
  * appends/merges/deletes must read back exactly what a full GROUP BY
  * recompute of the base's latest snapshot reads — refresh is an
  * identity over recompute, asserted per step on fixed and random
  * histories. Plus the bookkeeping: atomic watermarks, no-op
  * refreshes, append-only detection, time travel, NULL semantics,
  * and the MIN/MAX-shaped refusals. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)
  private def rm(p: java.nio.file.Path): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit

  /** Full recompute mirroring MV serve semantics (decimal sums,
    * double division for avg). */
  private def recompute(base: DataFrame): DataFrame =
    base.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x").cast(DecimalType(38, 6))).cast("long").as("sum_x"),
        sum(col("v").cast(DecimalType(38, 6))).cast("double").as("sum_v"),
        (sum(col("x").cast(DecimalType(38, 6))).cast("double") /
          count(col("x")).cast("double")).as("avg_x"))

  private def sorted(df: DataFrame): Seq[Row] =
    df.orderBy(asc_nulls_first("k")).collect().toSeq

  private def mvAggs = Seq(MV.MvCount("cnt"), MV.MvSum("x", "sum_x"),
    MV.MvSum("v", "sum_v"), MV.MvAvg("x", "avg_x"))

  test("create + read equals GROUP BY recompute, including NULL keys " +
    "and all-NULL sum groups") {
    val dir = tmp("mv_basic")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val rows = Seq[(Option[String], Option[Long], Double)](
        (Some("a"), Some(1L), 0.5), (Some("a"), Some(2L), 1.5),
        (Some("b"), None, 2.0), (Some("b"), None, 3.0), // all-NULL x
        (None, Some(7L), 4.0), (None, None, 5.0)) // NULL key group
        .toDF("k", "x", "v")
      VersionedTable.init(spark, base, rows)
      val baseV = MV.create(spark, mv, base, Seq("k"), mvAggs)
      assert(baseV == 0 && MV.watermark(spark, mv) == 0)
      val got = sorted(MV.read(spark, mv))
      val want = sorted(recompute(rows))
      assert(got == want)
      // all-NULL group serves NULL sum/avg, not 0
      val b = got.find(_.getString(0) == "b").get
      assert(b.isNullAt(2) && b.isNullAt(4))
    } finally rm(dir)
  }

  test("append refresh: O(delta) regime detected, result equals " +
    "recompute, no-op when base unmoved") {
    val dir = tmp("mv_append")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val b0 = Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("k", "x", "v")
      VersionedTable.init(spark, base, b0)
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      VersionedTable.append(spark, base,
        Seq(("a", 3L, 3.0), ("c", 4L, 4.0)).toDF("k", "x", "v"), 0)
      VersionedTable.append(spark, base,
        Seq(("c", 5L, 5.0)).toDF("k", "x", "v"), 1)
      val r = MV.refresh(spark, mv)
      assert(r.refreshed && r.appendOnly && r.fromBase == 0 && r.toBase == 2)
      assert(MV.watermark(spark, mv) == 2)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base))))
      val noop = MV.refresh(spark, mv)
      assert(!noop.refreshed && noop.mvVersion == r.mvVersion,
        "an unmoved base must not commit a new MV version")
    } finally rm(dir)
  }

  test("deletes and updates fold exactly; an emptied group leaves " +
    "the view") {
    val dir = tmp("mv_rewrite")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val b0 = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("gone", 9L, 9.0))
        .toDF("k", "x", "v")
      VersionedTable.init(spark, base, b0)
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      // rewrite commit: drop the 'gone' group entirely, mutate one
      // 'a' row (delete+insert through the content diff)
      val next = Seq(("a", 1L, 1.0), ("a", 20L, 2.5)).toDF("k", "x", "v")
      VersionedTable.commit(spark, base, next, 0)
      val r = MV.refresh(spark, mv)
      assert(r.refreshed && !r.appendOnly)
      val got = sorted(MV.read(spark, mv))
      assert(got == sorted(recompute(next)))
      assert(!got.exists(_.getString(0) == "gone"),
        "a group whose rows were all deleted must leave the view")
    } finally rm(dir)
  }

  test("CDC-keyed base: refresh folds pre/post images from the " +
    "commit-time change files") {
    val dir = tmp("mv_cdc")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val b0 = Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0),
        (3L, "b", 30L, 3.0)).toDF("id", "k", "x", "v")
      VersionedTable.init(spark, base, b0)
      VersionedTable.enableChangeFeed(spark, base, "id")
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      // merge: update id=2 (x 20→25), delete id=3, insert id=4
      val changeset = Seq((2L, "a", 25L, 2.0, "U"), (3L, "b", 30L, 3.0, "D"),
        (4L, "b", 40L, 4.0, "U")).toDF("id", "k", "x", "v", "op")
      VersionedTable.merge(spark, base, changeset, "id")
      val r = MV.refresh(spark, mv)
      assert(r.refreshed)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base)
          .select("k", "x", "v"))))
    } finally rm(dir)
  }

  test("time travel: an older MV version reads the aggregate as of " +
    "its refresh watermark") {
    val dir = tmp("mv_tt")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val b0 = Seq(("a", 1L, 1.0)).toDF("k", "x", "v")
      VersionedTable.init(spark, base, b0)
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      val asOf0 = sorted(MV.read(spark, mv))
      VersionedTable.append(spark, base,
        Seq(("a", 2L, 2.0)).toDF("k", "x", "v"), 0)
      MV.refresh(spark, mv)
      assert(sorted(MV.read(spark, mv, Some(0))) == asOf0)
      assert(sorted(MV.read(spark, mv)) !=(asOf0))
    } finally rm(dir)
  }

  test("random histories: refresh after every commit equals full " +
    "recompute (the identity the decimal contract buys)") {
    val dir = tmp("mv_rand")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val rnd = new scala.util.Random(20260815L)
      def randRows(n: Int): DataFrame = {
        val ks = Array("a", "b", "c", null)
        (1 to n).map { _ =>
          (ks(rnd.nextInt(ks.length)),
            if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong) else None,
            math.round(rnd.nextDouble() * 100) / 4.0)
        }.toDF("k", "x", "v")
      }
      VersionedTable.init(spark, base, randRows(6))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      (1 to 6).foreach { i =>
        val cur = VersionedTable.latestVersion(spark, base)
        if (rnd.nextBoolean())
          VersionedTable.append(spark, base, randRows(1 + rnd.nextInt(4)),
            cur)
        else {
          // rewrite: keep a random subset, add fresh rows
          val keep = VersionedTable.read(spark, base)
            .filter(pmod(crc32(concat_ws("|", col("k"),
              col("x").cast("string"), col("v"))), lit(3)) =!= (i % 3))
          VersionedTable.commit(spark, base,
            keep.unionByName(randRows(2)), cur)
        }
        MV.refresh(spark, mv)
        assert(sorted(MV.read(spark, mv)) ==
          sorted(recompute(VersionedTable.read(spark, base))),
          s"divergence after commit $i")
      }
    } finally rm(dir)
  }

  test("fullRefresh re-anchors after history the feed cannot span") {
    val dir = tmp("mv_full")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      VersionedTable.append(spark, base,
        Seq(("b", 2L, 2.0)).toDF("k", "x", "v"), 0)
      val r = MV.fullRefresh(spark, mv)
      assert(r.refreshed && MV.watermark(spark, mv) == 1)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base))))
    } finally rm(dir)
  }

  test("refusals: existing table, unknown/non-numeric columns, " +
    "duplicate outputs, bad names, base behind watermark") {
    val dir = tmp("mv_refuse")
    try {
      val base = dir.resolve("base").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, "s")).toDF("k", "x", "t"))
      def freshMv = dir.resolve(
        "mv" + java.util.UUID.randomUUID.toString.take(8)).toString
      intercept[IllegalArgumentException] { // unknown column
        MV.create(spark, freshMv, base, Seq("k"),
          Seq(MV.MvSum("nope", "s")))
      }
      intercept[IllegalArgumentException] { // non-numeric sum
        MV.create(spark, freshMv, base, Seq("k"),
          Seq(MV.MvSum("t", "s")))
      }
      intercept[IllegalArgumentException] { // duplicate outputs
        MV.create(spark, freshMv, base, Seq("k"),
          Seq(MV.MvCount("c"), MV.MvSum("x", "c")))
      }
      intercept[IllegalArgumentException] { // name collides with key
        MV.create(spark, freshMv, base, Seq("k"),
          Seq(MV.MvCount("k")))
      }
      intercept[IllegalArgumentException] { // bad identifier
        MV.create(spark, freshMv, base, Seq("k"),
          Seq(MV.MvCount("a b")))
      }
      val mv = freshMv
      MV.create(spark, mv, base, Seq("k"), Seq(MV.MvCount("c")))
      intercept[IllegalArgumentException] { // re-create over existing
        MV.create(spark, mv, base, Seq("k"), Seq(MV.MvCount("c")))
      }
      // base re-created behind the watermark → loud refusal
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
      VersionedTable.init(spark, base,
        Seq(("a", 1L, "s")).toDF("k", "x", "t"))
      val e = intercept[IllegalArgumentException] { MV.refresh(spark, mv) }
      assert(e.getMessage.contains("fullRefresh"))
      // fullRefresh re-anchors onto the new incarnation; refresh
      // then serves again
      MV.fullRefresh(spark, mv)
      val ok = MV.refresh(spark, mv)
      assert(!ok.refreshed)
      assert(sorted(MV.read(spark, mv)).map(_.getLong(1)) == Seq(1L))
    } finally rm(dir)
  }

  test("insert-only aggregates: MIN/MAX/HLL fold appends exactly " +
    "(below coupon capacity the sketch equals COUNT DISTINCT), " +
    "refuse a rewrite range, and fullRefresh recovers") {
    val dir = tmp("mv_insonly")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val b0 = Seq(("a", 5L, "x"), ("a", 3L, "y"), ("b", 7L, "x"))
        .toDF("k", "x", "t")
      VersionedTable.init(spark, base, b0)
      MV.create(spark, mv, base, Seq("k"),
        Seq(MV.MvMin("x", "min_x"), MV.MvMax("x", "max_x"),
          MV.MvHllCount("t", "nd_t")))
      def expect(): Seq[Row] = sorted(
        VersionedTable.read(spark, base).groupBy("k")
          .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            countDistinct(col("t")).as("nd_t")))
      assert(sorted(MV.read(spark, mv)) == expect())
      VersionedTable.append(spark, base,
        Seq(("a", 1L, "z"), ("b", 9L, "x"), ("c", 4L, "w"))
          .toDF("k", "x", "t"), 0)
      val r = MV.refresh(spark, mv)
      assert(r.refreshed && r.appendOnly)
      assert(sorted(MV.read(spark, mv)) == expect())
      // a delete makes the range non-append → loud refusal naming
      // fullRefresh
      VersionedTable.delete(spark, base, col("x") === 1L)
      val e = intercept[IllegalStateException] { MV.refresh(spark, mv) }
      assert(e.getMessage.contains("fullRefresh") &&
        e.getMessage.contains("min_x"))
      MV.fullRefresh(spark, mv)
      assert(sorted(MV.read(spark, mv)) == expect())
      // and appends keep folding after the recovery
      VersionedTable.append(spark, base,
        Seq(("a", 0L, "q")).toDF("k", "x", "t"),
        VersionedTable.latestVersion(spark, base))
      assert(MV.refresh(spark, mv).appendOnly)
      assert(sorted(MV.read(spark, mv)) == expect())
    } finally rm(dir)
  }

  test("the view is a versioned table: compact + vacuum between " +
    "refreshes preserve the fold and the watermark") {
    val dir = tmp("mv_maint")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      VersionedTable.append(spark, base,
        Seq(("b", 2L, 2.0)).toDF("k", "x", "v"), 0)
      MV.refresh(spark, mv)
      // maintenance on the VIEW's own table: MV.compact folds its
      // commit dirs RE-STAMPING the watermark, so even an aggressive
      // vacuum that keeps only the compacted version cannot lose it
      MV.compact(spark, mv)
      VersionedTable.vacuum(spark, mv, keepVersions = 1,
        retainMillis = 0L)
      assert(MV.watermark(spark, mv) == 1)
      VersionedTable.append(spark, base,
        Seq(("a", 3L, 3.0)).toDF("k", "x", "v"), 1)
      val r = MV.refresh(spark, mv)
      assert(r.refreshed && r.appendOnly)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base))))
      // the GENERIC compact writes no marker — vacuum can then age
      // the watermark out; the view fails LOUDLY (never a silent
      // re-fold) and fullRefresh recovers
      VersionedTable.compact(spark, mv)
      VersionedTable.vacuum(spark, mv, keepVersions = 1,
        retainMillis = 0L)
      val e = intercept[IllegalStateException] { MV.refresh(spark, mv) }
      assert(e.getMessage.contains("fullRefresh"))
      MV.fullRefresh(spark, mv)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base))))
    } finally rm(dir)
  }

  test("WHERE-filtered views: the fold tracks the filtered recompute " +
    "through appends, updates crossing the predicate boundary, and " +
    "deletes; non-deterministic predicates refuse at create") {
    val dir = tmp("mv_where")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq((1L, "a", 5L, 1.0), (2L, "a", 1L, 2.0), (3L, "b", 9L, 3.0))
          .toDF("id", "k", "x", "v"))
      VersionedTable.enableChangeFeed(spark, base, "id")
      MV.create(spark, mv, base, Seq("k"), mvAggs,
        where = Some("x >= 3"))
      def expect(): Seq[Row] = sorted(recompute(
        VersionedTable.read(spark, base).filter(col("x") >= 3)
          .select("k", "x", "v")))
      assert(sorted(MV.read(spark, mv)) == expect())
      VersionedTable.append(spark, base,
        Seq((4L, "a", 2L, 4.0), (5L, "c", 8L, 5.0))
          .toDF("id", "k", "x", "v"), 1)
      assert(MV.refresh(spark, mv).appendOnly)
      assert(sorted(MV.read(spark, mv)) == expect())
      // updates CROSSING the predicate boundary: id=2 enters the set
      // (1→6), id=3 leaves it (9→0), id=5 deleted outright
      VersionedTable.merge(spark, base,
        Seq((2L, "a", 6L, 2.0, "U"), (3L, "b", 0L, 3.0, "U"),
          (5L, "c", 8L, 5.0, "D")).toDF("id", "k", "x", "v", "op"),
        "id")
      MV.refresh(spark, mv)
      assert(sorted(MV.read(spark, mv)) == expect())
      assert(!sorted(MV.read(spark, mv)).exists(_.getString(0) == "b"),
        "a group whose rows all left the predicate set must leave")
      intercept[IllegalArgumentException] {
        MV.create(spark, dir.resolve("mv2").toString, base, Seq("k"),
          Seq(MV.MvCount("c")), where = Some("rand() > 0.5"))
      }
    } finally rm(dir)
  }

  test("a vacuumed base range refuses with the typed data-loss " +
    "error (naming the recovery), never a raw missing-file error; " +
    "fullRefresh recovers") {
    val dir = tmp("mv_vac")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      (0 to 2).foreach(v => VersionedTable.append(spark, base,
        Seq(("b", 2L, 2.0)).toDF("k", "x", "v"), v))
      // age out everything but the live version: the MV's watermark
      // (base v0) now points into vacuumed history
      VersionedTable.vacuum(spark, base, keepVersions = 1,
        retainMillis = 0L)
      val e = intercept[GraftDataLossException] { MV.refresh(spark, mv) }
      assert(e.getMessage.contains("VACUUM"))
      MV.fullRefresh(spark, mv)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base))))
    } finally rm(dir)
  }

  test("time-dependent WHERE predicates refuse at create: they pass " +
    "Expression.deterministic but re-evaluate at every refresh, " +
    "diverging from the recompute") {
    val dir = tmp("mv_timewhere")
    try {
      val base = dir.resolve("base").toString
      VersionedTable.init(spark, base,
        Seq(("a", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
          .toDF("k", "ts"))
      def refuses(w: String): Unit = {
        val e = intercept[IllegalArgumentException] {
          MV.create(spark, dir.resolve(
            "mv" + java.util.UUID.randomUUID.toString.take(8)).toString,
            base, Seq("k"), Seq(MV.MvCount("c")), where = Some(w))
        }
        assert(e.getMessage.contains("time-dependent"),
          s"'$w' must refuse as time-dependent: ${e.getMessage}")
      }
      refuses("ts < current_timestamp()")
      refuses("ts < now()")
      refuses("cast(ts as date) <= current_date()")
      refuses("ts < localtimestamp()")
      // a plain row-value predicate on the same column is fine
      val mv = dir.resolve("mv_ok").toString
      MV.create(spark, mv, base, Seq("k"), Seq(MV.MvCount("c")),
        where = Some("ts >= timestamp'2026-01-01 00:00:00'"))
      assert(sorted(MV.read(spark, mv)).map(_.getLong(1)) == Seq(1L))
    } finally rm(dir)
  }

  test("fullRefresh's re-anchor is atomic with its commit: a crash " +
    "before the def rewrite (stale def anchor) cannot cause a " +
    "spurious anchor-mismatch refusal on the next refresh") {
    val dir = tmp("mv_anchoratomic")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      // re-create the base at the same path: version 0 again, but a
      // DIFFERENT incarnation (UUID commit dirs → new fingerprint)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
      VersionedTable.init(spark, base,
        Seq(("b", 2L, 2.0)).toDF("k", "x", "v"))
      MV.fullRefresh(spark, mv) // re-anchors onto the new incarnation
      // simulate the crash window: the commit landed (manifest line
      // carries the fresh anchor) but the def rewrite did not — put
      // the STALE pre-fullRefresh def back as the newest def
      val fs = new java.io.File(mv)
      val defs = fs.listFiles().filter(_.getName.matches(
        "_mvdef\\.v\\d+\\.json")).sortBy(_.getName)
      assert(defs.length >= 2, "fullRefresh must write a new def")
      assert(defs.last.delete())
      // the re-created base is AT the stale anchor's version (0): the
      // def-file anchor alone would mismatch and refuse. The manifest
      // anchor (atomic with the recompute) must win instead.
      VersionedTable.append(spark, base,
        Seq(("c", 3L, 3.0)).toDF("k", "x", "v"), 0)
      val r = MV.refresh(spark, mv)
      assert(r.refreshed && r.appendOnly)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base))))
    } finally rm(dir)
  }

  test("anchor-read failure discrimination: only a missing-manifest " +
    "signal skips the incarnation check; transient I/O rethrows") {
    assert(MV.anchorReadFailureIsVacuum(
      new java.io.FileNotFoundException("gone")))
    assert(MV.anchorReadFailureIsVacuum(new IllegalArgumentException(
      "requirement failed: version 3 does not exist under /t")))
    assert(!MV.anchorReadFailureIsVacuum(
      new RuntimeException("connection reset")))
    assert(!MV.anchorReadFailureIsVacuum(
      new IllegalArgumentException("malformed manifest")))
    assert(!MV.anchorReadFailureIsVacuum(
      new java.io.IOException("timeout")))
    // and end-to-end: a CORRUPT (readable but wrong) anchor manifest
    // fails LOUDLY at refresh — never a silent check skip, never a
    // committed fold
    val dir = tmp("mv_anchorio")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      VersionedTable.append(spark, base,
        Seq(("b", 2L, 2.0)).toDF("k", "x", "v"), 0)
      java.nio.file.Files.write(
        new java.io.File(base, "_manifests/v0.json").toPath,
        "c-bogus-dir\n".getBytes("UTF-8"))
      // drop the local FS's checksum sibling so the doctored bytes
      // READ (we are testing the fingerprint check, not the CRC)
      new java.io.File(base, "_manifests/.v0.json.crc").delete()
      val e = intercept[IllegalArgumentException] { MV.refresh(spark, mv) }
      assert(e.getMessage.contains("anchor"),
        s"corrupt anchor manifest must refuse loudly: ${e.getMessage}")
      assert(MV.watermark(spark, mv) == 0,
        "a failed anchor check must not have committed a fold")
    } finally rm(dir)
  }

  test("defs publish under versioned names: create writes v1, " +
    "fullRefresh v2 (read picks the highest), and the legacy " +
    "_mvdef.json remains a read fallback") {
    val dir = tmp("mv_defver")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      def defNames() = new java.io.File(mv).listFiles()
        .map(_.getName).filter(_.startsWith("_mvdef")).sorted.toSeq
      assert(defNames() == Seq("_mvdef.v1.json"))
      val a1 = MV.definition(spark, mv).anchor
      MV.fullRefresh(spark, mv)
      assert(defNames() == Seq("_mvdef.v1.json", "_mvdef.v2.json"))
      // no tmp debris from the rename-only publish
      assert(!new java.io.File(mv).listFiles()
        .exists(_.getName.contains(".tmp-")))
      // a legacy view (single unversioned def) still reads
      val legacy = dir.resolve("legacy").toString
      VersionedTable.init(spark, legacy + "_b",
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, legacy, legacy + "_b", Seq("k"), mvAggs)
      val f = new java.io.File(legacy)
      assert(new java.io.File(f, "_mvdef.v1.json")
        .renameTo(new java.io.File(f, "_mvdef.json")))
      assert(MV.definition(spark, legacy).keys == Seq("k"))
      assert(MV.refresh(spark, legacy).refreshed == false)
      assert(a1.isDefined)
    } finally rm(dir)
  }

  test("rollup: any key-subset GROUP BY serves from the accumulators " +
    "— exact for COUNT/SUM/AVG (not avg-of-avgs), min/max/HLL roll " +
    "by their own fold, empty keys = the global aggregate") {
    val dir = tmp("mv_rollup")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      val rows = Seq(
        ("a", "x", 1L, "p"), ("a", "x", 2L, "q"), ("a", "y", 30L, "p"),
        ("b", "x", 4L, "r"), ("b", "y", 5L, "p"), ("b", "y", 6L, "s"))
        .toDF("k1", "k2", "x", "t")
      VersionedTable.init(spark, base, rows)
      MV.create(spark, mv, base, Seq("k1", "k2"),
        Seq(MV.MvCount("cnt"), MV.MvSum("x", "sum_x"),
          MV.MvAvg("x", "avg_x"), MV.MvMin("x", "min_x"),
          MV.MvMax("x", "max_x"), MV.MvHllCount("t", "nd_t")))
      // appends keep the insert-only accs foldable
      VersionedTable.append(spark, base,
        Seq(("a", "y", 7L, "q"), ("a", "y", 100L, "z"),
          ("c", "x", 8L, "p")).toDF("k1", "k2", "x", "t"), 0)
      MV.refresh(spark, mv)
      def expect(ks: Seq[String]): Seq[Row] = {
        val b = VersionedTable.read(spark, base)
        val aggs = Seq(count(lit(1)).as("cnt"),
          sum(col("x")).cast("long").as("sum_x"),
          (sum(col("x").cast(DecimalType(38, 6))).cast("double") /
            count(col("x")).cast("double")).as("avg_x"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          countDistinct(col("t")).as("nd_t"))
        val g = if (ks.isEmpty) b.agg(aggs.head, aggs.tail: _*)
          else b.groupBy(ks.map(col): _*).agg(aggs.head, aggs.tail: _*)
        g.orderBy(ks.map(asc_nulls_first): _*).collect().toSeq
      }
      def got(ks: Seq[String]): Seq[Row] =
        MV.rollup(spark, mv, ks)
          .orderBy(ks.map(asc_nulls_first): _*).collect().toSeq
      assert(got(Seq("k1")) == expect(Seq("k1")))
      assert(got(Seq("k2")) == expect(Seq("k2")))
      assert(got(Seq.empty) == expect(Seq.empty), "global rollup")
      assert(got(Seq("k1", "k2")) == expect(Seq("k1", "k2")),
        "all-keys rollup is the view itself")
      // the avg-of-avgs trap, explicitly: k1=a has groups (a,x)
      // avg 1.5 (2 rows) and (a,y) avg 45.667 (3 rows) — a naive
      // mean of the SERVED avgs reads 23.58; the accumulator rollup
      // serves the true (1+2+30+7+100)/5 = 28.0
      val aRow = got(Seq("k1")).find(_.getString(0) == "a").get
      assert(aRow.getLong(1) == 5L && aRow.getDouble(3) == 28.0,
        s"rollup must divide folded sums, not average averages: $aRow")
      val e = intercept[IllegalArgumentException] {
        MV.rollup(spark, mv, Seq("nope"))
      }
      assert(e.getMessage.contains("FINER") ||
        e.getMessage.contains("not"), e.getMessage)
      // time travel: rollup at version 0 reflects the pre-append
      // state (no key columns → cnt is the first served column)
      assert(MV.rollup(spark, mv, Seq.empty, Some(0)).head.getLong(0) ==
        6L)
    } finally rm(dir)
  }

  test("global rollup over an EMPTY (fully-deleted) view matches " +
    "SQL's global aggregation: exactly one row, COUNT 0, NULL sums " +
    "— keyed rollups still drop vanished groups") {
    val dir = tmp("mv_rollup_empty")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
      // SUM/COUNT/AVG only: the view must fold the full delete
      MV.create(spark, mv, base, Seq("k"),
        Seq(MV.MvCount("cnt"), MV.MvSum("x", "sum_x"),
          MV.MvAvg("x", "avg_x")))
      VersionedTable.delete(spark, base, lit(true))
      MV.refresh(spark, mv)
      // keyed: SQL has no row for a vanished group
      assert(MV.rollup(spark, mv, Seq("k")).count() == 0)
      // global: SQL always yields its one row
      val g = MV.rollup(spark, mv, Seq.empty).collect().toSeq
      assert(g.size == 1, s"global rollup must yield one row, got $g")
      assert(g.head.getLong(0) == 0L && g.head.isNullAt(1) &&
        g.head.isNullAt(2),
        s"COUNT 0, NULL SUM/AVG over the empty view, got ${g.head}")
      // and it matches aggregating the (empty) base directly
      val direct = VersionedTable.read(spark, base)
        .agg(count(lit(1)).as("cnt"),
          sum(col("x")).cast("long").as("sum_x"),
          avg(col("x")).as("avg_x")).collect().toSeq
      assert(g == direct)
    } finally rm(dir)
  }

  test("base schema evolution: a post-evolution refresh folds the " +
    "evolved rows (extra columns are harmless), an epoch-SPANNING " +
    "range fails loudly rather than wrongly, and fullRefresh recovers") {
    val dir = tmp("mv_evolve")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      // additive evolution + data in ONE commit; the refresh range
      // lies entirely in the new epoch → the fold just ignores the
      // extra column
      VersionedTable.append(spark, base,
        Seq(("b", 2L, 2.0, "extra")).toDF("k", "x", "v", "note"), 0,
        evolveSchema = true)
      val r = MV.refresh(spark, mv)
      assert(r.refreshed && r.appendOnly)
      assert(sorted(MV.read(spark, mv)) == sorted(recompute(
        VersionedTable.read(spark, base).select("k", "x", "v"))))
      // a range SPANNING a second epoch (pre-epoch append left
      // unrefreshed, then another evolution): the feed refuses a
      // mixed-schema union loudly — never a silently mis-shaped fold
      VersionedTable.append(spark, base,
        Seq(("c", 3L, 3.0, "n")).toDF("k", "x", "v", "note"), 1)
      VersionedTable.append(spark, base,
        Seq(("d", 4L, 4.0, "n", Option(9L)))
          .toDF("k", "x", "v", "note", "extra2"),
        2, evolveSchema = true)
      intercept[Exception] { MV.refresh(spark, mv) }
      assert(MV.watermark(spark, mv) == 1,
        "a failed epoch-spanning refresh must not have committed")
      MV.fullRefresh(spark, mv)
      assert(sorted(MV.read(spark, mv)) == sorted(recompute(
        VersionedTable.read(spark, base).select("k", "x", "v"))))
      // and the steady state resumes post-recovery
      VersionedTable.append(spark, base,
        Seq(("e", 5L, 5.0, "n", Option(1L)))
          .toDF("k", "x", "v", "note", "extra2"),
        VersionedTable.latestVersion(spark, base))
      assert(MV.refresh(spark, mv).appendOnly)
      assert(sorted(MV.read(spark, mv)) == sorted(recompute(
        VersionedTable.read(spark, base).select("k", "x", "v"))))
    } finally rm(dir)
  }

  test("crash idempotency: a replayed refresh of the same range " +
    "no-ops on the watermark instead of double-folding") {
    val dir = tmp("mv_idem")
    try {
      val base = dir.resolve("base").toString
      val mv = dir.resolve("mv").toString
      VersionedTable.init(spark, base,
        Seq(("a", 1L, 1.0)).toDF("k", "x", "v"))
      MV.create(spark, mv, base, Seq("k"), mvAggs)
      VersionedTable.append(spark, base,
        Seq(("a", 2L, 2.0)).toDF("k", "x", "v"), 0)
      val r1 = MV.refresh(spark, mv)
      // the "crash after commit, rerun the job" replay
      val r2 = MV.refresh(spark, mv)
      assert(r1.refreshed && !r2.refreshed && r2.mvVersion == r1.mvVersion)
      assert(sorted(MV.read(spark, mv)) ==
        sorted(recompute(VersionedTable.read(spark, base))))
    } finally rm(dir)
  }
}
