package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-commit-dir KLL quantile sketch lifecycle (see
  * [[QuantileStats]]): enable-time backfill, O(delta) incremental
  * maintenance with byte-identical carry, rewrite bookkeeping, and
  * EXACT order statistics below the sketch's compaction threshold —
  * where any mismatch is a bookkeeping bug, not sketch noise. */
class QuantileStatsSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("kll").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private def batch(from: Long, n: Long) =
    spark.range(from, from + n)
      .select($"id", ($"id" * 2).cast("double").as("v"),
        concat(lit("s"), $"id").as("s"))

  private def kllLines(root: String, v: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root, s"_manifests/v$v.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).getLines()
      .filter(_.startsWith(QuantileStats.LinePrefix)).toList
    finally in.close()
  }

  test("enable backfills; quantiles are EXACT order statistics below " +
    "the compaction threshold; strings are ineligible; disable drops " +
    "everything") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 80))
    VersionedTable.append(spark, root, batch(80, 80), 0)
    assert(VersionedTable.tableQuantiles(spark, root, "id",
      Seq(0.5)).isEmpty, "no estimates before enable")
    VersionedTable.enableQuantileStats(spark, root)
    // 160 values of id = 0..159 — exact mode: media and extremes are
    // the true order statistics
    val q = VersionedTable.tableQuantiles(spark, root, "id",
      Seq(0.0, 0.5, 1.0)).get
    assert(q(0) == 0.0 && q(2) == 159.0, s"extremes exact, got $q")
    assert(math.abs(q(1) - 79.0) <= 1.0, s"median exact-ish, got $q")
    val qv = VersionedTable.tableQuantiles(spark, root, "v",
      Seq(1.0)).get
    assert(qv.head == 318.0, "double column sketched in its own domain")
    assert(VersionedTable.tableQuantiles(spark, root, "s",
      Seq(0.5)).isEmpty, "strings have no quantile domain")
    VersionedTable.disableQuantileStats(spark, root)
    assert(VersionedTable.tableQuantiles(spark, root, "id",
      Seq(0.5)).isEmpty)
    assert(kllLines(root,
      VersionedTable.latestVersion(spark, root)).isEmpty)
  }

  test("appends are O(delta): carried dirs keep their lines " +
    "byte-identical, the union tracks the new extremes, and a " +
    "rewrite drops the removed dirs' sketches") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 100))
    VersionedTable.enableQuantileStats(spark, root, Seq("id"))
    val before = kllLines(root, 1)
    assert(before.size == 1)
    VersionedTable.append(spark, root, batch(100, 100), 1)
    val after = kllLines(root, 2)
    assert(after.size == 2 && after.contains(before.head),
      "the backfilled dir's sketch carried verbatim")
    assert(VersionedTable.tableQuantiles(spark, root, "id",
      Seq(1.0)).get.head == 199.0, "union sees the appended max")
    // delete the first half: the rewrite re-sketches survivors
    VersionedTable.delete(spark, root, col("id") < 100L)
    val q = VersionedTable.tableQuantiles(spark, root, "id",
      Seq(0.0, 1.0)).get
    assert(q == Seq(100.0, 199.0),
      s"post-delete quantiles over the surviving rows only, got $q")
    // time travel below the enable version reports nothing
    assert(VersionedTable.tableQuantiles(spark, root, "id",
      Seq(0.5), Some(0)).isEmpty)
  }

  test("the streaming/SQL write paths sketch under the pin too (the " +
    "publishDir hook covers every commit route)") {
    val d = java.nio.file.Files.createTempDirectory("kllwh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gkll",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gkll.warehouse", d.getAbsolutePath)
    spark.sql("CREATE TABLE gkll.t (id BIGINT)")
    val root = new java.io.File(d, "t").getAbsolutePath
    VersionedTable.enableQuantileStats(spark, root)
    spark.sql("INSERT INTO gkll.t SELECT id FROM range(0, 50)")
    spark.sql("INSERT INTO gkll.t SELECT id FROM range(50, 150)")
    val q = VersionedTable.tableQuantiles(spark, root, "id",
      Seq(0.0, 1.0)).get
    assert(q == Seq(0.0, 149.0),
      s"SQL INSERT commits sketched their own rows, got $q")
  }

  test("SQL surface: graft.quantile.columns TBLPROPERTY lifecycle, " +
    "and $stats serves p50/p99 under the pin") {
    val d = java.nio.file.Files.createTempDirectory("kllwh2").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gkl2",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gkl2.warehouse", d.getAbsolutePath)
    spark.sql("CREATE TABLE gkl2.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.quantile.columns' = 'id')")
    spark.sql("INSERT INTO gkl2.t SELECT id, concat('x', id) " +
      "FROM range(0, 101)")
    val root = new java.io.File(d, "t").getAbsolutePath
    assert(VersionedTable.quantileColumns(spark, root)
      .contains(Seq("id")))
    val props = spark.sql("SHOW TBLPROPERTIES gkl2.t")
      .as[(String, String)].collect().toMap
    assert(props.get("graft.quantile.columns").contains("id"))
    val st = spark.sql(
      "SELECT `column`, p50, p99 FROM gkl2.`t$stats`").collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(st("id")._1.contains(50.0), s"exact-mode median: ${st("id")}")
    assert(st("id")._2.contains(99.0) || st("id")._2.contains(100.0),
      s"p99 order statistic: ${st("id")}")
    assert(st("s")._1.isEmpty, "unpinned/non-numeric column: NULL p50")
    spark.sql(
      "ALTER TABLE gkl2.t UNSET TBLPROPERTIES ('graft.quantile.columns')")
    assert(VersionedTable.quantileColumns(spark, root).isEmpty)
  }

  test("date and timestamp columns sketch in the epoch-day / " +
    "epoch-micros domain on both paths; timestamp_ntz is INELIGIBLE " +
    "(no timezone-free numeric mapping)") {
    val root = freshRoot()
    def tbatch(from: Long, n: Long) = spark.range(from, from + n).select(
      $"id",
      date_add(lit(java.sql.Date.valueOf("2026-01-01")),
        ($"id" % 50).cast("int")).as("dt"),
      timestamp_micros($"id" % 100).as("ts"),
      to_timestamp_ntz(lit("2026-01-01 00:00:00")).as("tntz"))
    VersionedTable.init(spark, root, tbatch(0, 100))
    // ntz alone is not sketchable — loud refusal, not a broken pin
    intercept[IllegalArgumentException] {
      VersionedTable.enableQuantileStats(spark, root, Seq("tntz"))
    }
    // and a MIXED pin refuses too: silently storing a never-sketched
    // name would read as coverage that never arrives
    assert(intercept[IllegalArgumentException] {
      VersionedTable.enableQuantileStats(spark, root, Seq("dt", "tntz"))
    }.getMessage.contains("tntz"))
    VersionedTable.enableQuantileStats(spark, root) // backfill path
    val epochDay = java.time.LocalDate.of(2026, 1, 1).toEpochDay.toDouble
    val qdt = VersionedTable.tableQuantiles(spark, root, "dt",
      Seq(0.0, 1.0)).get
    assert(qdt(0) == epochDay && qdt(1) == epochDay + 49,
      s"date quantiles in the epoch-day domain, got $qdt")
    val qts = VersionedTable.tableQuantiles(spark, root, "ts",
      Seq(0.0, 1.0)).get
    assert(qts(0) == 0.0 && qts(1) == 99.0,
      s"timestamp quantiles in the epoch-MICROS domain, got $qts")
    assert(VersionedTable.tableQuantiles(spark, root, "tntz",
      Seq(0.5)).isEmpty, "ntz has no sketch")
    // commit path (combinedLines) uses the same domain: appending the
    // same value set moves no extreme
    VersionedTable.append(spark, root, tbatch(100, 100),
      VersionedTable.latestVersion(spark, root))
    val after = VersionedTable.tableQuantiles(spark, root, "dt",
      Seq(0.0, 1.0)).get
    assert(after == qdt, s"same domain across paths, got $after vs $qdt")
  }
}
