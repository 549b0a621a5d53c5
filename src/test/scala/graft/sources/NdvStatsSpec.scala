package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-commit-dir NDV sketch lifecycle (see [[NdvStats]]): enable-time
  * backfill accuracy, O(delta) incremental maintenance (appends sketch
  * only their own rows, carried dirs keep their lines byte-identical),
  * rewrite/restore/disable bookkeeping, and the conservative gaps
  * (pre-enable history, time travel below the enable version). */
class NdvStatsSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("ndv").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private def batch(from: Long, n: Long) =
    spark.range(from, from + n)
      .select($"id", concat(lit("u"), $"id" % 100).as("u"),
        ($"id" % 7).cast("double").as("d"))

  private def ndvLines(root: String, v: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root,
      s"_manifests/v$v.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).getLines()
      .filter(_.startsWith(NdvStats.LinePrefix)).toList
    finally in.close()
  }

  test("enable backfills the existing dirs; estimates land within " +
    "HLL error of the true distinct counts; disable drops everything") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 5000))
    VersionedTable.append(spark, root, batch(5000, 5000), 0)
    assert(VersionedTable.tableNdv(spark, root).isEmpty,
      "no estimates before enable")
    val v = VersionedTable.enableNdvStats(spark, root)
    assert(v == 2)
    val ndv = VersionedTable.tableNdv(spark, root)
    assert(math.abs(ndv("id") - 10000L) <= 500,
      s"id NDV near 10000, got ${ndv.get("id")}")
    assert(ndv("u") == 100L, s"low-cardinality NDV exact: ${ndv.get("u")}")
    assert(ndv("d") == 7L, s"double NDV via canonical cast: ${ndv.get("d")}")
    VersionedTable.disableNdvStats(spark, root)
    assert(VersionedTable.tableNdv(spark, root).isEmpty)
    assert(ndvLines(root, VersionedTable.latestVersion(spark, root))
      .isEmpty, "disable strips the stored sketches")
  }

  test("appends are O(delta): the new commit sketches only its own " +
    "rows, carried dirs keep their lines byte-identical, and the " +
    "union tracks growth") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 4000))
    VersionedTable.enableNdvStats(spark, root, Seq("id"))
    val before = ndvLines(root, 1)
    assert(before.size == 1)
    VersionedTable.append(spark, root, batch(4000, 4000), 1)
    val after = ndvLines(root, 2)
    assert(after.size == 2, s"one line per data-bearing dir: $after")
    assert(after.contains(before.head),
      "the backfilled dir's sketch carried verbatim — not recomputed")
    val ndv = VersionedTable.tableNdv(spark, root)("id")
    assert(math.abs(ndv - 8000L) <= 400, s"unioned NDV near 8000: $ndv")
    // pinned to a single column: others stay unknown
    assert(!VersionedTable.tableNdv(spark, root).contains("u"))
  }

  test("commit-path and backfill-path sketches hash IDENTICALLY: " +
    "appending the same rows again leaves the unioned NDV unchanged " +
    "(divergent hashing would read ~2n)") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 4000))
    // backfill path: hll_sketch_agg over the existing dir
    VersionedTable.enableNdvStats(spark, root)
    val before = VersionedTable.tableNdv(spark, root)
    // commit path: NdvStats.combinedLines' direct DataSketches updates
    VersionedTable.append(spark, root, batch(0, 4000), 1)
    val after = VersionedTable.tableNdv(spark, root)
    assert(after("id") == before("id") && after("u") == before("u") &&
      after("d") == before("d"),
      s"identical rows through the two sketch paths must union to the " +
        s"same estimate: $before vs $after")
  }

  test("a rewrite drops the removed dirs' sketches with the dirs and " +
    "sketches its replacement; restore resurrects the old estimates") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 3000))
    VersionedTable.enableNdvStats(spark, root, Seq("id"))
    VersionedTable.append(spark, root, batch(3000, 3000), 1)
    val full = VersionedTable.tableNdv(spark, root)("id")
    assert(math.abs(full - 6000L) <= 300)
    // delete the second half: dir-level rewrite under the pin
    VersionedTable.delete(spark, root, col("id") >= 3000L)
    val v = VersionedTable.latestVersion(spark, root)
    val ndv = VersionedTable.tableNdv(spark, root, Some(v))
    assert(ndv.contains("id") && math.abs(ndv("id") - 3000L) <= 150,
      s"post-delete NDV near 3000, got ${ndv.get("id")}")
    VersionedTable.restore(spark, root, 2)
    val restored = VersionedTable.tableNdv(spark, root)("id")
    assert(restored == full, "restore re-reads the old sketches")
  }

  test("conservative gaps: time travel below the enable version has " +
    "no estimates, and a column added by schema evolution stays " +
    "unknown until every dir covers it") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 2000))
    VersionedTable.enableNdvStats(spark, root)
    assert(VersionedTable.tableNdv(spark, root, Some(0)).isEmpty,
      "the pre-enable version never gains estimates")
    val schema = org.apache.spark.sql.types.StructType(
      VersionedTable.read(spark, root).schema.fields :+
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.LongType, true))
    VersionedTable.evolveSchema(spark, root, schema)
    VersionedTable.append(spark, root,
      batch(2000, 1000).withColumn("extra", $"id" * 2),
      VersionedTable.latestVersion(spark, root))
    val ndv = VersionedTable.tableNdv(spark, root)
    assert(ndv.contains("id"), "pre-evolution columns keep estimates")
    assert(!ndv.contains("extra"),
      "a column the old dirs never sketched reports nothing")
  }

  test("SQL surface: graft.ndv.columns at CREATE TABLE sketches every " +
    "commit from day one, ALTER ... UNSET disables, and the pin " +
    "surfaces in SHOW TBLPROPERTIES") {
    val d = java.nio.file.Files.createTempDirectory("ndvwh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gndv",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gndv.warehouse", d.getAbsolutePath)
    spark.sql("CREATE TABLE gndv.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.ndv.columns' = 'id')")
    spark.range(1000).select($"id", concat(lit("x"), $"id").as("s"))
      .createOrReplaceTempView("ndv_src")
    spark.sql("INSERT INTO gndv.t SELECT * FROM ndv_src")
    val root = new java.io.File(d, "t").getAbsolutePath
    val ndv = VersionedTable.tableNdv(spark, root)
    assert(ndv.contains("id") && math.abs(ndv("id") - 1000L) <= 50,
      s"INSERT under the pin sketched its rows: ${ndv.get("id")}")
    val props = spark.sql("SHOW TBLPROPERTIES gndv.t")
      .as[(String, String)].collect().toMap
    assert(props.get("graft.ndv.columns").contains("id"))
    spark.sql(
      "ALTER TABLE gndv.t UNSET TBLPROPERTIES ('graft.ndv.columns')")
    assert(VersionedTable.tableNdv(spark, root).isEmpty)
    // re-enable via ALTER backfills again, '*' = all eligible
    spark.sql("ALTER TABLE gndv.t SET TBLPROPERTIES " +
      "('graft.ndv.columns' = '*')")
    val re = VersionedTable.tableNdv(spark, root)
    assert(re.contains("id") && re.contains("s"), s"got $re")
    // the $stats metadata table is the optimizer's view in SQL:
    // exact envelopes + sketched NDV, one row per covered column
    val st = spark.sql("SELECT * FROM gndv.`t$stats`")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(st("id")._1 == "0" && st("id")._2 == "999")
    assert(st("id")._3 == 0L)
    assert(st("id")._4.exists(n => math.abs(n - 1000L) <= 50),
      s"NDV column of the stats table, got ${st("id")._4}")
    // unknown column refuses
    assertThrows[Exception] {
      spark.sql("CREATE TABLE gndv.bad (id BIGINT) " +
        "TBLPROPERTIES ('graft.ndv.columns' = 'nope')")
    }
  }

  test("streaming epochs sketch under the pin too: writeStream.toTable " +
    "commits carry their own dir's sketch, so the union stays live " +
    "through continuous ingest") {
    val d = java.nio.file.Files.createTempDirectory("ndvst").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gndvs",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gndvs.warehouse",
      d.getAbsolutePath)
    spark.sql("CREATE TABLE gndvs.t (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.ndv.columns' = '*')")
    val ck = java.nio.file.Files.createTempDirectory("ndvst_ck").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = ms.toDF().toDF("id", "s").writeStream
        .option("checkpointLocation", ck).toTable("gndvs.t")
      try q.processAllAvailable() finally q.stop()
    }
    ms.addData((0L until 300L).map(i => i -> s"s$i"): _*)
    run()
    ms.addData((300L until 500L).map(i => i -> s"s$i"): _*)
    run()
    val root = new java.io.File(d, "t").getAbsolutePath
    val ndv = VersionedTable.tableNdv(spark, root)
    assert(ndv.contains("id") && math.abs(ndv("id") - 500L) <= 25,
      s"two epoch commits unioned, got ${ndv.get("id")}")
  }

  test("a failed ANALYZE leaves the existing pin and its sketches " +
    "untouched: the backfill runs before the pin swap commits") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 2000))
    VersionedTable.enableNdvStats(spark, root, Seq("u"))
    val before = VersionedTable.tableNdv(spark, root)
    assert(before.get("u").contains(100L))
    val vBefore = VersionedTable.latestVersion(spark, root)
    // repin naming a missing column fails in validation — BEFORE
    // anything was dropped (the old disable-then-enable pair lost the
    // stored sketches here)
    intercept[IllegalArgumentException] {
      VersionedTable.repinNdvStats(spark, root, Seq("nope"))
    }
    assert(VersionedTable.latestVersion(spark, root) == vBefore,
      "no version committed by the failed repin")
    assert(VersionedTable.tableNdv(spark, root) == before,
      "old pin and sketches still serve")
    // and a SUCCESSFUL repin swaps in ONE commit
    VersionedTable.repinNdvStats(spark, root, Seq("id"))
    assert(VersionedTable.latestVersion(spark, root) == vBefore + 1)
    val after = VersionedTable.tableNdv(spark, root)
    assert(after.contains("id") && !after.contains("u"))
  }

  test("date / timestamp / timestamp_ntz columns sketch through LEGAL " +
    "conversions on both the backfill and the commit path; " +
    "sub-second-distinct timestamps stay distinct (micros domain)") {
    val root = freshRoot()
    def tbatch(from: Long, n: Long) = spark.range(from, from + n).select(
      $"id",
      date_add(lit(java.sql.Date.valueOf("2026-01-01")),
        ($"id" % 50).cast("int")).as("dt"),
      // 300 values inside ONE second — a seconds-domain sketch would
      // collapse them to a single NDV value
      timestamp_micros($"id" % 300).as("ts"),
      to_timestamp_ntz(concat(lit("2026-01-01 00:00:"),
        lpad(($"id" % 60).cast("string"), 2, "0"))).as("tntz"))
    VersionedTable.init(spark, root, tbatch(0, 600))
    // backfill path (hll_sketch_agg over sketchInput) must not throw
    // on the temporal types — Spark 4 rejects date/ntz→numeric casts
    VersionedTable.enableNdvStats(spark, root)
    val ndv = VersionedTable.tableNdv(spark, root)
    assert(ndv("dt") == 50L, s"date NDV exact, got ${ndv.get("dt")}")
    assert(ndv("ts") == 300L,
      s"timestamp NDV in the MICROS domain, got ${ndv.get("ts")}")
    assert(ndv("tntz") == 60L, s"ntz NDV, got ${ndv.get("tntz")}")
    // commit path (combinedLines' hand-rolled hashing) must union
    // with the backfill sketches, not double them: same value sets
    // appended → NDV unchanged
    VersionedTable.append(spark, root, tbatch(600, 600),
      VersionedTable.latestVersion(spark, root))
    val after = VersionedTable.tableNdv(spark, root)
    assert(after("dt") == 50L && after("ts") == 300L &&
      after("tntz") == 60L,
      s"union-compatible across paths, got $after")
  }

  test("staleCols names the columns degraded by an old sketch " +
    "domain — absent-because-stale is distinguishable from " +
    "never-pinned") {
    def line(v: Option[Int], cols: String*): String =
      NdvStats.LinePrefix + """{"dir":"c-x"""" +
        v.map(n => s""","v":$n""").getOrElse("") +
        s""","cols":{${cols.map(c => s""""$c":"AA=="""").mkString(",")}}}"""
    // current-domain lines are NOT stale
    assert(NdvStats.staleCols(
      Seq(line(Some(NdvStats.DomainVersion), "a", "b"))) == Set.empty)
    // an old version IS stale; names lowercase
    assert(NdvStats.staleCols(
      Seq(line(Some(1), "A", "b"))) == Set("a", "b"))
    // a PRE-VERSIONING line (no v field) is stale by definition
    assert(NdvStats.staleCols(Seq(line(None, "c"))) == Set("c"))
    // mixed: one dir current, one dir old → the old dir's columns
    // degrade the table reads, so they report
    assert(NdvStats.staleCols(Seq(
      line(Some(NdvStats.DomainVersion), "a"),
      line(Some(1), "a"))) == Set("a"))
    // malformed lines and foreign prefixes are ignored, not thrown
    assert(NdvStats.staleCols(Seq(
      NdvStats.LinePrefix + "not json", "#kll:{}", "c-somedir")) ==
      Set.empty)
    // the KLL family shares the contract through the same parser
    assert(QuantileStats.staleCols(Seq(
      QuantileStats.LinePrefix + """{"v":1,"dir":"c-x","cols":{"q":"AA=="}}"""
    )) == Set("q"))
    assert(QuantileStats.staleCols(Seq(
      QuantileStats.LinePrefix +
        s"""{"v":${QuantileStats.DomainVersion},"dir":"c-x","cols":{"q":"AA=="}}"""
    )) == Set.empty)
  }

  test("staleSketchCols end-to-end: rewriting a manifest line to an " +
    "old domain version degrades the column's NDV to unknown AND " +
    "flags it stale") {
    val root = freshRoot()
    VersionedTable.init(spark, root, batch(0, 1000))
    VersionedTable.enableNdvStats(spark, root)
    assert(VersionedTable.tableNdv(spark, root).contains("u"))
    assert(VersionedTable.staleSketchCols(spark, root)._1.isEmpty)
    // simulate a domain bump over persisted history: rewrite the
    // newest manifest's #ndv: lines to claim the OLD version, then
    // append — carried dirs keep their (now old-domain) lines
    // verbatim while the new dir sketches under the current domain,
    // which is exactly what a real domain bump leaves behind
    val v = VersionedTable.latestVersion(spark, root)
    val mf = new java.io.File(root, s"_manifests/v$v.json")
    val body = new String(
      java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
    val doctored = body.replace(
      s""""v":${NdvStats.DomainVersion},""", """"v":1,""")
    assert(doctored != body, "manifest must have carried a #ndv: line")
    java.nio.file.Files.write(mf.toPath, doctored.getBytes("UTF-8"))
    // drop the local FS's checksum sibling of the doctored manifest
    new java.io.File(root, s"_manifests/.v$v.json.crc").delete()
    VersionedTable.append(spark, root, batch(1000, 100), v)
    // absent by refusal (mixed/old-domain lines never union) ...
    assert(!VersionedTable.tableNdv(spark, root).contains("u"))
    // ... and DISTINGUISHABLY so — and the signal SURVIVES further
    // commits (stale lines carry verbatim; dropping them would
    // convert "backfill me" into never-pinned absence)
    assert(VersionedTable.staleSketchCols(spark, root)._1.contains("u"))
    VersionedTable.append(spark, root, batch(1100, 50),
      VersionedTable.latestVersion(spark, root))
    assert(VersionedTable.staleSketchCols(spark, root)._1.contains("u"))
    // the prescribed recovery: one atomic repin rebuilds every dir's
    // sketch under the current domain — estimate back, flag gone
    VersionedTable.repinNdvStats(spark, root)
    assert(VersionedTable.tableNdv(spark, root).contains("u"))
    assert(VersionedTable.staleSketchCols(spark, root)._1.isEmpty)
  }
}
