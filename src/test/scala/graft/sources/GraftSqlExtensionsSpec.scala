package graft.sources

import graft.SparkSpec

/** The maintenance statements (OPTIMIZE / VACUUM / RESTORE) through
  * the injected parser — plain `spark.sql`, resolved via the graft
  * catalog, executing the programmatic VersionedTable ops. The
  * extension must be invisible to every other statement (it delegates
  * to Spark's parser), which the rest of the suite exercises
  * constantly since SparkSpec's shared session carries it. */
class GraftSqlExtensionsSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ext_wh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gext",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gext.warehouse", d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def rootOf(tbl: String) = s"$wh/$tbl"

  test("OPTIMIZE compacts the snapshot into one commit dir; content " +
    "unchanged, history intact, version returned") {
    wh
    spark.sql("CREATE TABLE gext.t1 (id BIGINT)")
    spark.sql("INSERT INTO gext.t1 SELECT id FROM range(0, 50)")
    spark.sql("INSERT INTO gext.t1 SELECT id FROM range(50, 100)")
    val root = rootOf("t1")
    assert(VersionedTable.dataDirs(spark, root).size == 3)
    val returned = spark.sql("OPTIMIZE gext.t1").as[Long].head
    assert(returned == 3L)
    assert(VersionedTable.dataDirs(spark, root).size == 1)
    assert(VersionedTable.commitOp(spark, root, 3).contains("compact"))
    assert(spark.sql("SELECT count(*) FROM gext.t1").as[Long].head == 100L)
  }

  test("OPTIMIZE ZORDER BY clusters on two columns; INTO n FILES sizes " +
    "the output; content unchanged") {
    wh
    spark.sql("CREATE TABLE gext.t2 (a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO gext.t2 SELECT id, 999 - id FROM range(0, 1000)")
    val root = rootOf("t2")
    spark.sql("OPTIMIZE gext.t2 ZORDER BY (a, b) INTO 4 FILES")
    val latest = VersionedTable.latestVersion(spark, root)
    assert(VersionedTable.commitOp(spark, root, latest)
      .contains("optimize"))
    assert(VersionedTable.statsByDir(spark, root)
      .values.map(_.size).sum == 4)
    assert(spark.sql("SELECT count(*) FROM gext.t2").as[Long].head == 1000L)
    assert(spark.sql("SELECT sum(a) FROM gext.t2").as[Long].head ==
      (0L until 1000L).sum)
  }

  test("VACUUM drops aged-out versions' dirs with Delta's RETAIN/KEEP " +
    "spelling; RESTORE rolls the table forward to a past version") {
    wh
    spark.sql("CREATE TABLE gext.t3 (id BIGINT)")
    spark.sql("INSERT INTO gext.t3 VALUES (1)")
    spark.sql("INSERT INTO gext.t3 VALUES (2)")
    val root = rootOf("t3")
    // RESTORE to the one-row version (metadata-only, roll-forward)
    val v = spark.sql("RESTORE TABLE gext.t3 TO VERSION AS OF 1")
      .as[Long].head
    assert(v == 3L)
    assert(VersionedTable.commitOp(spark, root, 3).contains("restore"))
    assert(spark.sql("SELECT count(*) FROM gext.t3").as[Long].head == 1L)
    // compact then VACUUM everything older than the live version
    spark.sql("OPTIMIZE gext.t3")
    val fs = new org.apache.hadoop.fs.Path(root, "data")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "data")).length
    assert(before > 1)
    assert(spark.sql("VACUUM gext.t3 RETAIN 0 HOURS KEEP 1 VERSIONS")
      .as[String].head == "OK")
    assert(fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "data")).length == 1)
    assert(spark.sql("SELECT count(*) FROM gext.t3").as[Long].head == 1L)
  }

  test("VACUUM DRY RUN previews the aged-out dirs without deleting " +
    "anything") {
    wh
    spark.sql("CREATE TABLE gext.t5 (id BIGINT)")
    spark.sql("INSERT INTO gext.t5 VALUES (1)")
    spark.sql("INSERT INTO gext.t5 VALUES (2)")
    spark.sql("OPTIMIZE gext.t5")
    val root = rootOf("t5")
    val fs = new org.apache.hadoop.fs.Path(root, "data")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def census = fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "data")).length
    val before = census
    val preview = spark.sql(
      "VACUUM gext.t5 RETAIN 0 HOURS KEEP 1 VERSIONS DRY RUN")
      .as[(String, Long, Long, String)].collect()
    // the compact folded 3 dirs (init + 2 inserts); all 3 are now
    // unreferenced by the live version and would age out — each a
    // whole-dir row (no file refs in this history)
    assert(preview.length == 3, s"preview: ${preview.toSeq}")
    assert(preview.forall(r => r._3 >= 0 && r._4 == "dir"))
    assert(census == before, "DRY RUN deleted data")
    // the real vacuum then deletes exactly the previewed dirs
    spark.sql("VACUUM gext.t5 RETAIN 0 HOURS KEEP 1 VERSIONS")
    assert(census == before - 3)
    assert(spark.sql("SELECT count(*) FROM gext.t5").as[Long].head == 2L)
  }

  test("the parser delegates everything else and refuses non-graft " +
    "targets loudly") {
    wh
    // normal SQL is untouched by the extension
    assert(spark.sql("SELECT 41 + 1").as[Int].head == 42)
    // statements are case-insensitive
    spark.sql("CREATE TABLE gext.t4 (id BIGINT)")
    spark.sql("INSERT INTO gext.t4 VALUES (1)")
    spark.sql("optimize gext.t4")
    assert(VersionedTable.commitOp(spark, rootOf("t4"),
      VersionedTable.latestVersion(spark, rootOf("t4")))
      .contains("compact"))
    // a statement aimed at a NON-graft catalog is NOT claimed: it
    // falls through to the delegate parser so another extension
    // (e.g. Delta's VACUUM) could own it in a mixed session; with no
    // such extension installed, Spark's own parser refuses — the
    // graft error ("not a graft catalog") must NOT appear
    val e = intercept[Exception] {
      spark.sql("VACUUM spark_catalog.default.nope")
    }
    assert(!e.getMessage.contains("graft"),
      s"non-graft target must fall through, got: ${e.getMessage}")
    // same for an unqualified identifier (no catalog to resolve)
    val e2 = intercept[Exception] { spark.sql("VACUUM bare") }
    assert(!e2.getMessage.contains("graft"))
    // a missing table under a GRAFT catalog is ours: typed refusal
    val e3 = intercept[Exception] { spark.sql("OPTIMIZE gext.absent") }
    assert(e3.getMessage.contains("absent") ||
      String.valueOf(e3.getCause).contains("absent"))
  }

  test("table_changes TVF serves the change feed in pure SQL: " +
    "inclusive version bounds, keyed vocabulary under a CDC pin, " +
    "loud refusals for non-literal args and non-graft targets") {
    wh
    spark.sql("CREATE TABLE gext.tc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gext.tc VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("INSERT INTO gext.tc VALUES (3, 'c')")           // v2
    spark.sql("DELETE FROM gext.tc WHERE id = 2")              // v3
    // open-ended tail from v2 (inclusive), Delta's argument shape
    val rows = spark.sql("SELECT id, v, change_kind, _commit_version " +
      "FROM table_changes('gext.tc', 2) ORDER BY _commit_version, id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(rows == Seq((3L, "c", "insert", 2L), (2L, "b", "delete", 3L)),
      s"got $rows")
    // bounded range through the collision-proof alias
    assert(spark.sql(
      "SELECT count(*) FROM graft_table_changes('gext.tc', 2, 2)")
      .as[Long].head == 1L)
    // version 0 = snapshot replay as inserts: folding the full feed
    // reproduces the live table
    val folded = spark.sql(
      """SELECT id, v FROM table_changes('gext.tc', 0) f
        |WHERE change_kind = 'insert' AND NOT EXISTS (
        |  SELECT 1 FROM table_changes('gext.tc', 0) d
        |  WHERE d.change_kind = 'delete' AND d.id = f.id)
        |ORDER BY id""".stripMargin)
      .as[(Long, String)].collect().toSeq
    assert(folded == Seq((1L, "a"), (3L, "c")), s"got $folded")
    // a CDC pin flips the feed to keyed pre/post-image vocabulary —
    // the TVF follows the pin the same way the streaming seam does
    spark.sql("ALTER TABLE gext.tc SET TBLPROPERTIES " +
      "('graft.changeFeed.key' = 'id')")                      // v4
    spark.sql("UPDATE gext.tc SET v = 'z' WHERE id = 1")      // v5
    val keyed = spark.sql("SELECT id, v, change_kind " +
      "FROM table_changes('gext.tc', 5, 5) ORDER BY change_kind")
      .as[(Long, String, String)].collect().toSeq
    assert(keyed == Seq((1L, "z", "update_postimage"),
      (1L, "a", "update_preimage")), s"got $keyed")
    // non-literal version: the feed's range shapes the PLAN, so it
    // must resolve at analysis time
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('gext.tc', " +
        "CAST(rand() AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"), s"got: ${e.getMessage}")
    // non-graft target: loud typed refusal (a TVF is name-keyed — it
    // cannot fall through like the maintenance parser does)
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM table_changes('spark_catalog.default.x', 0)")
        .collect()
    }
    assert(e2.getMessage.contains("graft") ||
      String.valueOf(e2.getCause).contains("graft"),
      s"got: ${e2.getMessage}")
  }

  test("CREATE TABLE with an invalid CHECK constraint refuses " +
    "atomically: no table is left behind") {
    wh
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gext.badc (id BIGINT) TBLPROPERTIES " +
        "('graft.constraints.c1' = 'no_such_col > 0')")
    }
    assert(e.getMessage.contains("c1") ||
      String.valueOf(e.getCause).contains("c1"))
    assert(!spark.catalog.tableExists("gext.badc"))
    assert(!new java.io.File(rootOf("badc"), "_manifests").exists,
      "failed CREATE TABLE left a committed table on disk")
  }

  test("ANALYZE TABLE ... COMPUTE STATISTICS (re)pins the NDV sketch " +
    "set and returns the optimizer's resulting view; non-graft " +
    "targets fall through to Spark's own ANALYZE") {
    wh
    spark.sql("CREATE TABLE gext.an (id BIGINT, s STRING, v DOUBLE)")
    spark.range(2000).selectExpr("id", "concat('s', id % 40) AS s",
      "id * 0.5 AS v").createOrReplaceTempView("an_src")
    spark.sql("INSERT INTO gext.an SELECT * FROM an_src")
    val root = rootOf("an")
    // FOR COLUMNS pins exactly the named columns
    val rows = spark.sql(
      "ANALYZE TABLE gext.an COMPUTE STATISTICS FOR COLUMNS id, s")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(rows("id")._2.exists(n => math.abs(n - 2000L) <= 100),
      s"id NDV near 2000: ${rows("id")._2}")
    assert(rows("s")._2.contains(40L), s"s NDV exact: ${rows("s")._2}")
    assert(rows("v")._2.isEmpty, "v was not pinned")
    assert(VersionedTable.ndvColumns(spark, root)
      .contains(Seq("id", "s")))
    // re-ANALYZE FOR ALL COLUMNS re-pins (fresh backfill, wider set)
    val all = spark.sql(
      "ANALYZE TABLE gext.an COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(r => r.getString(0) ->
        Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
    assert(all("v").isDefined, "ALL COLUMNS covers v too")
    assert(VersionedTable.ndvColumns(spark, root).contains(Seq.empty))
    // min/max columns render the exact envelopes
    val idRow = spark.sql(
      "ANALYZE TABLE gext.an COMPUTE STATISTICS FOR COLUMNS id")
      .filter($"column" === "id").head()
    assert(idRow.getString(1) == "0" && idRow.getString(2) == "1999")
    // a session-catalog target is NOT claimed: Spark's own ANALYZE
    // runs (computes catalog stats instead of erroring in graft
    // code). External table at a throwaway location — a managed
    // table's warehouse dir would survive the JVM and poison reruns.
    val plainLoc = java.nio.file.Files
      .createTempDirectory("an_plain").toString
    spark.sql("DROP TABLE IF EXISTS an_plain")
    spark.sql("CREATE TABLE an_plain (id BIGINT) USING parquet " +
      s"LOCATION '$plainLoc'")
    spark.sql("INSERT OVERWRITE an_plain SELECT id FROM range(10)")
    spark.sql("ANALYZE TABLE an_plain COMPUTE STATISTICS")
    assert(spark.sql("DESCRIBE EXTENDED an_plain")
      .filter($"col_name" === "Statistics").count() == 1,
      "Spark's own ANALYZE must have produced catalog statistics")
    spark.sql("DROP TABLE IF EXISTS an_plain")
  }

  test("CREATE/REFRESH MATERIALIZED VIEW: the SQL lifecycle folds " +
    "appends at O(delta), serves through plain SELECT, and refuses " +
    "non-aggregate shapes") {
    wh
    spark.sql("CREATE TABLE gext.mvbase (k STRING, x BIGINT)")
    spark.sql("INSERT INTO gext.mvbase VALUES ('a', 1), ('a', 2), ('b', 5)")
    val created = spark.sql(
      "CREATE MATERIALIZED VIEW gext.mv1 AS " +
        "SELECT k, count(*) AS cnt, sum(x) AS sx, avg(x) AS ax, " +
        "max(x) AS mx, approx_count_distinct(x) AS nd " +
        "FROM gext.mvbase GROUP BY k")
    assert(created.as[Long].head == 1L) // base at v1 (CREATE+INSERT)
    // the view serves through PLAIN SQL — no MV-aware reader needed
    def served() = spark.sql(
      "SELECT k, cnt, sx, ax, mx, nd FROM gext.mv1 ORDER BY k")
      .collect().toSeq
    def recomputed() = spark.sql(
      "SELECT k, count(*) AS cnt, sum(x) AS sx, avg(x) AS ax, " +
        "max(x) AS mx, CAST(count(DISTINCT x) AS BIGINT) AS nd " +
        "FROM gext.mvbase GROUP BY k ORDER BY k").collect().toSeq
    assert(served() == recomputed())
    spark.sql("INSERT INTO gext.mvbase VALUES ('a', 9), ('c', 3)")
    val r = spark.sql("REFRESH MATERIALIZED VIEW gext.mv1").head()
    assert(r.getBoolean(3) && r.getBoolean(4),
      s"append refresh must report (refreshed, append_only), got $r")
    assert(served() == recomputed())
    // a second refresh with an unmoved base no-ops
    val r2 = spark.sql("REFRESH MATERIALIZED VIEW gext.mv1").head()
    assert(!r2.getBoolean(3))
    // a DELETE makes the range non-append: the insert-only max/nd
    // refuse, FULL recovers
    spark.sql("DELETE FROM gext.mvbase WHERE x = 9")
    val e = intercept[Exception] {
      spark.sql("REFRESH MATERIALIZED VIEW gext.mv1").collect()
    }
    assert(e.getMessage.contains("fullRefresh") ||
      Option(e.getCause).exists(_.getMessage.contains("fullRefresh")))
    spark.sql("REFRESH MATERIALIZED VIEW gext.mv1 FULL").collect()
    assert(served() == recomputed())
    // refusals: WHERE/JOIN shapes, unaliased aggregates, count(col),
    // DISTINCT
    def refuses(sql: String, needle: String): Unit = {
      val ex = intercept[Exception] { spark.sql(sql).collect() }
      val msg = ex.getMessage +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(needle), s"wanted '$needle' in: $msg")
    }
    // a JOIN is NOT foldable: a one-side delta re-pairs against the
    // other side's history — refused
    refuses("CREATE MATERIALIZED VIEW gext.mv2 AS SELECT a.k, " +
      "count(*) AS c FROM gext.mvbase a JOIN gext.mvbase b " +
      "ON a.k = b.k GROUP BY a.k", "graft table")
    refuses("CREATE MATERIALIZED VIEW gext.mv2 AS SELECT k, " +
      "count(x) AS c FROM gext.mvbase GROUP BY k", "count(*)")
    refuses("CREATE MATERIALIZED VIEW gext.mv2 AS SELECT k, " +
      "count(DISTINCT x) AS c FROM gext.mvbase GROUP BY k",
      "approx_count_distinct")
    refuses("CREATE MATERIALIZED VIEW gext.mv2 AS " +
      "SELECT k, x FROM gext.mvbase", "not a GROUP BY aggregate")
    // a SELECT list omitting a GROUP BY key would silently diverge
    // from the served shape (the view always serves keys first):
    // refused, naming the missing key
    refuses("CREATE MATERIALIZED VIEW gext.mv2 AS SELECT " +
      "count(*) AS c FROM gext.mvbase GROUP BY k",
      "every GROUP BY key must appear in the SELECT list")
    // the $mv metadata table: one row per aggregate, freshness header
    val meta = spark.sql("SELECT * FROM gext.`mv1$mv` ORDER BY agg")
      .collect()
    assert(meta.length == 5)
    assert(meta.forall(_.getLong(2) == 0L),
      "after the FULL refresh the view must not trail the base")
    assert(meta.forall(_.getString(3) == "k"))
    val byAgg = meta.map(r => r.getString(4) ->
      (r.getString(5), r.getBoolean(7))).toMap
    assert(byAgg("cnt") == ("count", false))
    assert(byAgg("mx") == ("max", true))
    assert(byAgg("nd") == ("approx_count_distinct", true))
    // DROP TABLE removes the view like any table
    spark.sql("DROP TABLE gext.mv1")
    assert(!spark.catalog.tableExists("gext.mv1"))
    // WHERE is FOLDABLE (σ commutes with the signed fold) and
    // therefore supported; the filtered view tracks the filtered
    // recompute through a later refresh, and $mv records the predicate
    spark.sql("CREATE MATERIALIZED VIEW gext.mvw AS SELECT k, " +
      "count(*) AS c, sum(x) AS sx FROM gext.mvbase " +
      "WHERE x >= 2 GROUP BY k")
    spark.sql("INSERT INTO gext.mvbase VALUES ('a', 1), ('c', 7)")
    spark.sql("REFRESH MATERIALIZED VIEW gext.mvw").collect()
    assert(spark.sql("SELECT k, c, sx FROM gext.mvw ORDER BY k")
      .collect().toSeq ==
      spark.sql("SELECT k, count(*) AS c, sum(x) AS sx FROM " +
        "gext.mvbase WHERE x >= 2 GROUP BY k ORDER BY k")
        .collect().toSeq)
    assert(spark.sql("SELECT DISTINCT `where` FROM gext.`mvw$mv`")
      .head.getString(0).contains("2"))
    spark.sql("DROP TABLE gext.mvw")
  }

  test("ALTER TABLE ... CLUSTER BY / OPTIMIZE ... REFS / SET " +
    "CONSUMER FLOOR: the round-18 features' SQL spellings round-trip " +
    "through the maintenance parser") {
    wh
    spark.sql("CREATE TABLE gext.cl (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gext.cl SELECT id, concat('s', id) " +
      "FROM range(0, 400)")
    val root = rootOf("cl")
    // CLUSTER BY pins; appends now range-shuffle their batches
    spark.sql("ALTER TABLE gext.cl CLUSTER BY (id)")
    assert(VersionedTable.clusterSpec(spark, root).contains(Seq("id")))
    // a point delete splits the dir into file refs — and under the
    // pin the SQL rewrite's replacement files land range-sorted
    // (ReplaceSnapshotWrite demands an ordered distribution), so a
    // lookup near the deleted key still prunes afterwards
    spark.sql("DELETE FROM gext.cl WHERE id = 7")
    assert(VersionedTable.readManifest(spark, root,
      VersionedTable.latestVersion(spark, root))
      .exists(VersionedTable.refIsFile))
    val pred = VersionedTable.resolveCondition(spark,
      VersionedTable.read(spark, root).schema,
      org.apache.spark.sql.functions.col("id") === 8L).get
    val (_, pruned, covered) = VersionedTable.prunedPaths(
      spark, root, pred)
    assert(covered > 0 && covered - pruned <= 2,
      s"SQL DML under the cluster pin must keep envelopes prunable, " +
        s"got ${covered - pruned} of $covered may-match")
    // OPTIMIZE REFS folds the fragmentation and returns the version
    val v = spark.sql("OPTIMIZE gext.cl REFS").as[Long].head
    assert(v == VersionedTable.latestVersion(spark, root))
    assert(!VersionedTable.readManifest(spark, root, v.toInt)
      .exists(VersionedTable.refIsFile))
    assert(spark.sql("SELECT count(*) FROM gext.cl").as[Long].head
      == 399L)
    // a second OPTIMIZE REFS is a no-op returning the same version
    assert(spark.sql("OPTIMIZE gext.cl REFS").as[Long].head == v)
    // CLUSTER BY NONE drops the pin
    spark.sql("ALTER TABLE gext.cl CLUSTER BY NONE")
    assert(VersionedTable.clusterSpec(spark, root).isEmpty)
    // consumer floor publish + the metadata tables that serve it
    spark.sql("ALTER TABLE gext.cl SET CONSUMER FLOOR 'dash' TO 2")
    assert(spark.sql("SELECT floor_version FROM gext.`cl$consumers` " +
      "WHERE consumer = 'dash'").as[Long].head == 2L)
    spark.sql("DROP TABLE gext.cl")
  }

  test("ALTER MATERIALIZED VIEW ... FOLLOW [STOP]: the query lives " +
    "in Spark's own StreamingQueryManager under a deterministic " +
    "name — FOLLOW starts it, commits on the base refresh the view, " +
    "double-FOLLOW and orphan STOP refuse, STOP ends it") {
    wh
    spark.sql("CREATE TABLE gext.fb (k STRING, x BIGINT)")
    spark.sql("INSERT INTO gext.fb VALUES ('a', 1), ('b', 5)")
    spark.sql("CREATE MATERIALIZED VIEW gext.fmv AS " +
      "SELECT k, count(*) AS cnt, sum(x) AS sx FROM gext.fb GROUP BY k")
    val started = spark.sql(
      "ALTER MATERIALIZED VIEW gext.fmv FOLLOW").head()
    val qName = started.getString(0)
    assert(started.getBoolean(2) && qName.startsWith("graft-mv-follow-"))
    val q = spark.streams.active.find(_.name == qName)
      .getOrElse(fail("FOLLOW must register in spark.streams"))
    assert(q.id.toString == started.getString(1))
    try {
      // a second FOLLOW refuses, naming STOP
      val e = intercept[Exception] {
        spark.sql("ALTER MATERIALIZED VIEW gext.fmv FOLLOW").collect()
      }
      assert((e.getMessage + Option(e.getCause).map(_.getMessage)
        .getOrElse("")).contains("FOLLOW STOP"))
      // a base commit lands in the view without any REFRESH statement
      spark.sql("INSERT INTO gext.fb VALUES ('a', 9), ('c', 3)")
      q.processAllAvailable()
      assert(spark.sql("SELECT k, cnt, sx FROM gext.fmv ORDER BY k")
        .collect().toSeq ==
        spark.sql("SELECT k, count(*) AS cnt, sum(x) AS sx " +
          "FROM gext.fb GROUP BY k ORDER BY k").collect().toSeq,
        "a follow must fold the commit without an explicit REFRESH")
    } finally if (q.isActive) q.stop()
    // restart cleanly after a manual stop, then STOP via SQL
    spark.sql("ALTER MATERIALIZED VIEW gext.fmv FOLLOW").collect()
    val stopped = spark.sql(
      "ALTER MATERIALIZED VIEW gext.fmv FOLLOW STOP").head()
    assert(!stopped.getBoolean(2))
    assert(!spark.streams.active.exists(_.name == qName),
      "STOP must terminate the registered query")
    // STOP with nothing active refuses, naming FOLLOW
    val e2 = intercept[Exception] {
      spark.sql("ALTER MATERIALIZED VIEW gext.fmv FOLLOW STOP").collect()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage)
      .getOrElse("")).contains("no active FOLLOW"))
    spark.sql("DROP TABLE gext.fmv")
    spark.sql("DROP TABLE gext.fb")
  }

  test("VACUUM ... RESPECT CONSUMERS widens the keep horizon to the " +
    "registered floors, MAX LAG clamps abandoned ones, DRY RUN " +
    "previews the widened horizon, and plain VACUUM stays " +
    "advisory-blind") {
    wh
    spark.sql("CREATE TABLE gext.vc (id BIGINT)") // v0
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT OVERWRITE gext.vc SELECT id FROM range($i)"))
    val root = rootOf("vc") // v0..v4, each overwrite orphans the last
    spark.sql("ALTER TABLE gext.vc SET CONSUMER FLOOR 'tail' TO 1")
    spark.sql("ALTER TABLE gext.vc SET CONSUMER FLOOR 'dash' TO 3")
    // DRY RUN with the widened horizon: keeping from the lowest
    // floor (1) leaves only v0's dir a candidate
    val pvRows = spark.sql("VACUUM gext.vc RETAIN 0 HOURS KEEP 1 " +
      "VERSIONS RESPECT CONSUMERS DRY RUN").collect()
    assert(pvRows.length == 1, s"got ${pvRows.toSeq}")
    // destructive spelling: the status row reports the widened keep
    val st = spark.sql("VACUUM gext.vc RETAIN 0 HOURS KEEP 1 " +
      "VERSIONS RESPECT CONSUMERS").head().getString(0)
    assert(st.contains("keep=4") && st.contains("respected 2") &&
      st.contains("0 clamped"), s"got $st")
    assert(VersionedTable.earliestVersion(spark, root) == 1,
      "the lowest floor (1) must stay readable")
    // MAX LAG 1 clamps both floors to latest-1 = 3: v1, v2 go
    val st2 = spark.sql("VACUUM gext.vc RETAIN 0 HOURS KEEP 1 " +
      "VERSIONS RESPECT CONSUMERS MAX LAG 1").head().getString(0)
    assert(st2.contains("keep=2") && st2.contains("respected 2"),
      s"got $st2")
    assert(VersionedTable.earliestVersion(spark, root) == 3,
      "MAX LAG 1 must clamp the lagging floors to latest-1")
    // the clamp census names what was ignored (floor 1 < latest-1;
    // floor 3 sits exactly at the lag bound and is NOT clamped)
    assert(st2.contains("1 clamped"), s"got $st2")
    // plain VACUUM ignores the registry entirely (advisory default)
    spark.sql("VACUUM gext.vc RETAIN 0 HOURS KEEP 1 VERSIONS")
    assert(VersionedTable.earliestVersion(spark, root) == 4,
      "plain VACUUM must stay advisory-blind")
    spark.sql("DROP TABLE gext.vc")
  }

  test("VACUUM ... RESPECT CONSUMERS protects a bare readStream.table " +
    "consumer through its AUTO-published floor — no SET CONSUMER " +
    "FLOOR statement anywhere; plain VACUUM stays advisory-blind") {
    wh
    spark.sql("CREATE TABLE gext.sf (id BIGINT)")                    // v0
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO gext.sf VALUES ($i)"))                 // v1..v4
    val root = rootOf("sf")
    val ck = java.nio.file.Files
      .createTempDirectory("graft_sf_ck").toString
    val q = spark.readStream.option("floorPublishEvery", "1")
      .table("gext.sf")
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    try {
      q.processAllAvailable()
      // the next base commit constructs the batch whose clean-up
      // point publishes the snapshot batch's offset (v4)
      spark.sql("INSERT INTO gext.sf VALUES (5)")                    // v5
      q.processAllAvailable()
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      def floor() = spark.sql(
        "SELECT floor_version FROM gext.`sf$consumers` " +
          "WHERE consumer LIKE 'stream:%'").as[Long].collect()
      while (floor().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(floor().toSeq == Seq(4L),
        s"auto-published floor must be visible in $$consumers, got " +
          floor().toSeq)
    } finally q.stop()
    // RESPECT CONSUMERS widens keep around the auto floor: latest=5,
    // floor=4 → keep 2, so v4 stays readable for the lagging tail
    val st = spark.sql("VACUUM gext.sf RETAIN 0 HOURS KEEP 1 " +
      "VERSIONS RESPECT CONSUMERS").head().getString(0)
    assert(st.contains("keep=2") && st.contains("respected 1"),
      s"got $st")
    assert(VersionedTable.earliestVersion(spark, root) == 4,
      "the auto-published floor must stay readable")
    // advisory default: a plain VACUUM ignores the registry
    spark.sql("VACUUM gext.sf RETAIN 0 HOURS KEEP 1 VERSIONS")
    assert(VersionedTable.earliestVersion(spark, root) == 5)
    spark.sql("DROP TABLE gext.sf")
  }

  test("FOLLOW survives a session restart through the durable " +
    "_follow marker: resumeFollows re-arms a crashed follow (the " +
    "missed base commit folds), reports already-active ones, and " +
    "respects a deliberate STOP") {
    wh
    spark.sql("CREATE TABLE gext.fb2 (k STRING, x BIGINT)")
    spark.sql("INSERT INTO gext.fb2 VALUES ('a', 1), ('b', 5)")
    spark.sql("CREATE MATERIALIZED VIEW gext.fmv2 AS " +
      "SELECT k, count(*) AS cnt, sum(x) AS sx FROM gext.fb2 GROUP BY k")
    val root = rootOf("fmv2")
    val qName = spark.sql(
      "ALTER MATERIALIZED VIEW gext.fmv2 FOLLOW").head().getString(0)
    assert(MaterializedView.followArmed(spark, root),
      "FOLLOW must arm the durable marker")
    // simulate a CRASH: the query dies WITHOUT the SQL STOP — the
    // durable intent survives (that asymmetry is the whole feature)
    spark.streams.active.find(_.name == qName).get.stop()
    assert(!spark.streams.active.exists(_.name == qName))
    assert(MaterializedView.followArmed(spark, root))
    // a base commit lands while nobody is following
    spark.sql("INSERT INTO gext.fb2 VALUES ('a', 9), ('c', 3)")
    // "session restart recipe": one resumeFollows call re-arms every
    // marked view under its deterministic name
    val cat = spark.sessionState.catalogManager.catalog("gext")
      .asInstanceOf[GraftCatalog]
    val report = cat.resumeFollows()
    assert(report.map(r => (r._2, r._3)) == Seq(qName -> true),
      s"got $report")
    val q2 = spark.streams.active.find(_.name == qName)
      .getOrElse(fail("resumeFollows must re-register the query"))
    try {
      q2.processAllAvailable()
      // the commit that landed during the outage folded (exactly-once
      // rides the view's own #txn: watermark — no checkpoint needed)
      assert(spark.sql("SELECT k, cnt, sx FROM gext.fmv2 ORDER BY k")
        .collect().toSeq ==
        spark.sql("SELECT k, count(*) AS cnt, sum(x) AS sx " +
          "FROM gext.fb2 GROUP BY k ORDER BY k").collect().toSeq,
        "the re-armed follow must fold the missed commit")
      // idempotent: a second resume reports already-active, starts
      // nothing new
      val again = cat.resumeFollows()
      assert(again.map(r => (r._2, r._3)) == Seq(qName -> false),
        s"got $again")
    } finally if (q2.isActive) q2.stop()
    // ...that manual stop was another "crash"; SQL STOP is the
    // deliberate disarm: re-arm once more, stop via SQL, and the
    // marker clears so resumeFollows re-arms NOTHING
    cat.resumeFollows()
    spark.sql("ALTER MATERIALIZED VIEW gext.fmv2 FOLLOW STOP")
    assert(!MaterializedView.followArmed(spark, root),
      "SQL STOP must disarm the durable marker")
    assert(cat.resumeFollows().isEmpty,
      "a deliberately-stopped view must stay stopped across restarts")
    spark.sql("DROP TABLE gext.fmv2")
    spark.sql("DROP TABLE gext.fb2")
  }

  test("spark.sql.catalog.<name>.resumeFollows=true re-arms marked " +
    "views at FIRST catalog use — the zero-call restart recipe: a " +
    "fresh catalog instance over a warehouse holding an armed view " +
    "starts the follow on its first table access and the missed " +
    "commit folds") {
    wh
    spark.sql("CREATE TABLE gext.rb (k STRING, x BIGINT)")
    spark.sql("INSERT INTO gext.rb VALUES ('a', 1)")
    spark.sql("CREATE MATERIALIZED VIEW gext.rmv AS " +
      "SELECT k, count(*) AS cnt FROM gext.rb GROUP BY k")
    val qName = spark.sql(
      "ALTER MATERIALIZED VIEW gext.rmv FOLLOW").head().getString(0)
    // crash: the query dies without SQL STOP — the marker survives
    spark.streams.active.find(_.name == qName).get.stop()
    // a base commit lands while nobody is following
    spark.sql("INSERT INTO gext.rb VALUES ('b', 2)")
    // "session restart": a FRESH catalog instance over the SAME
    // warehouse, with the opt-in conf — no explicit resumeFollows call
    spark.conf.set("spark.sql.catalog.gres",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gres.warehouse", wh)
    spark.conf.set("spark.sql.catalog.gres.resumeFollows", "true")
    assert(!spark.streams.active.exists(_.name == qName))
    // the first table access through the new catalog arms the follow
    assert(spark.sql("SELECT count(*) FROM gres.rb")
      .as[Long].head == 2L)
    val q = spark.streams.active.find(_.name == qName).getOrElse(
      fail("first catalog use must re-arm the marked view"))
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT k, cnt FROM gres.rmv ORDER BY k")
        .as[(String, Long)].collect().toSeq ==
        Seq("a" -> 1L, "b" -> 1L),
        "the commit missed during the outage must fold")
    } finally {
      // deliberate stop (disarm) so later suites see no stray query
      spark.sql("ALTER MATERIALIZED VIEW gres.rmv FOLLOW STOP")
    }
    assert(!spark.streams.active.exists(_.name == qName))
    spark.sql("DROP TABLE gres.rmv")
    spark.sql("DROP TABLE gres.rb")
    spark.conf.unset("spark.sql.catalog.gres")
    spark.conf.unset("spark.sql.catalog.gres.warehouse")
    spark.conf.unset("spark.sql.catalog.gres.resumeFollows")
  }

  test("FOLLOW STOP on a CRASHED follow disarms the durable marker " +
    "directly: no query is active but the marker is, and STOP means " +
    "'stay stopped' — not 'restart the dead follow just to stop it " +
    "again'; only marker-AND-query absent refuses") {
    wh
    spark.sql("CREATE TABLE gext.fb3 (k STRING, x BIGINT)")
    spark.sql("INSERT INTO gext.fb3 VALUES ('a', 1)")
    spark.sql("CREATE MATERIALIZED VIEW gext.fmv3 AS " +
      "SELECT k, count(*) AS cnt FROM gext.fb3 GROUP BY k")
    val root = rootOf("fmv3")
    val qName = spark.sql(
      "ALTER MATERIALIZED VIEW gext.fmv3 FOLLOW").head().getString(0)
    // crash: the query dies WITHOUT the SQL STOP, the marker survives
    spark.streams.active.find(_.name == qName).get.stop()
    assert(MaterializedView.followArmed(spark, root))
    // STOP with no active query but an armed marker: disarm and
    // report stopped=false (empty query id — there was none to stop)
    val r = spark.sql(
      "ALTER MATERIALIZED VIEW gext.fmv3 FOLLOW STOP").head()
    assert(!r.getBoolean(2) && r.getString(1).isEmpty, s"got $r")
    assert(!MaterializedView.followArmed(spark, root),
      "STOP on a crashed follow must clear the durable intent")
    // ...so a later restart recipe re-arms NOTHING
    val cat = spark.sessionState.catalogManager.catalog("gext")
      .asInstanceOf[GraftCatalog]
    assert(cat.resumeFollows().isEmpty)
    // now NOTHING is armed or active: STOP refuses
    val e = intercept[Exception] {
      spark.sql("ALTER MATERIALIZED VIEW gext.fmv3 FOLLOW STOP")
        .collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).contains("no active FOLLOW"))
    spark.sql("DROP TABLE gext.fmv3")
    spark.sql("DROP TABLE gext.fb3")
  }
}
