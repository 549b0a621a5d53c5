package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL lifecycle over the versioned table through the `graft`
  * catalog: every statement here is plain `spark.sql`, resolved by
  * Spark's own CatalogManager through the public TableCatalog seam —
  * no programmatic VersionedTable calls except to assert internals. */
class GraftCatalogSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_wh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def rootOf(tbl: String) = s"$wh/$tbl"

  test("CREATE TABLE + INSERT INTO + SELECT round-trips; INSERT is an " +
    "atomic append (one version per statement)") {
    wh
    spark.sql("CREATE TABLE graft.t1 (id BIGINT, s STRING)")
    assert(VersionedTable.latestVersion(spark, rootOf("t1")) == 0)
    spark.sql("INSERT INTO graft.t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.t1 VALUES (3, 'c')")
    assert(VersionedTable.latestVersion(spark, rootOf("t1")) == 2)
    val got = spark.sql("SELECT id, s FROM graft.t1 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // append, not rewrite: version 1's commit dirs survive into v2
    val v1 = VersionedTable.dataDirs(spark, rootOf("t1"), Some(1)).toSet
    val v2 = VersionedTable.dataDirs(spark, rootOf("t1"), Some(2)).toSet
    assert(v1.subsetOf(v2))
  }

  test("VERSION AS OF time-travels through SQL; TIMESTAMP AS OF resolves") {
    wh
    spark.sql("CREATE TABLE graft.t2 (id BIGINT)")
    spark.sql("INSERT INTO graft.t2 VALUES (1)")
    spark.sql("INSERT INTO graft.t2 VALUES (2)")
    assert(spark.sql("SELECT * FROM graft.t2 VERSION AS OF 1")
      .count() == 1)
    assert(spark.sql("SELECT * FROM graft.t2 VERSION AS OF 2")
      .count() == 2)
    // far-future timestamp resolves to the latest version
    assert(spark.sql(
      "SELECT * FROM graft.t2 TIMESTAMP AS OF '2999-01-01 00:00:00'")
      .count() == 2)
  }

  test("DELETE FROM runs the stats-pruned copy-on-write delete; an " +
    "untranslatable predicate falls back to the row-level rewrite") {
    wh
    spark.sql("CREATE TABLE graft.t3 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.t3 SELECT id, CAST(id AS STRING) " +
      "FROM range(10)")
    spark.sql("DELETE FROM graft.t3 WHERE id >= 7")
    assert(spark.sql("SELECT count(*) FROM graft.t3").as[Long].head == 7L)
    assert(VersionedTable.commitOp(spark, rootOf("t3"),
      VersionedTable.latestVersion(spark, rootOf("t3"))).contains("delete"))
    // id % 2 = 0 has no v1-Filter translation → Spark routes it
    // through the group-based row-level rewrite instead; answers match
    // SQL semantics either way
    spark.sql("DELETE FROM graft.t3 WHERE id % 2 = 0")
    assert(spark.sql("SELECT id FROM graft.t3 ORDER BY id").as[Long]
      .collect().toSeq == Seq(1L, 3L, 5L))
  }

  test("SQL UPDATE rewrites through the row-level seam as one " +
    "versioned commit; history keeps the pre-update snapshot") {
    wh
    spark.sql("CREATE TABLE graft.t8 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.t8 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("UPDATE graft.t8 SET s = concat(s, '!') WHERE id >= 2")
    val got = spark.sql("SELECT id, s FROM graft.t8 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b!"), (3L, "c!")))
    val latest = VersionedTable.latestVersion(spark, rootOf("t8"))
    assert(VersionedTable.commitOp(spark, rootOf("t8"), latest)
      .contains("update"))
    // exactly one version per statement; the pre-update snapshot reads
    assert(spark.sql(
      s"SELECT s FROM graft.t8 VERSION AS OF ${latest - 1} " +
        "WHERE id = 2").as[String].head == "b")
  }

  test("SQL MERGE INTO upserts: matched rows update, unmatched insert, " +
    "one atomic commit") {
    wh
    spark.sql("CREATE TABLE graft.t9 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.t9 VALUES (1, 'a'), (2, 'b')")
    spark.sql("""MERGE INTO graft.t9 t
      |USING (SELECT * FROM VALUES (2, 'b2'), (9, 'i') AS src(id, s)) s
      |ON t.id = s.id
      |WHEN MATCHED THEN UPDATE SET t.s = s.s
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT id, s FROM graft.t9 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (9L, "i")))
    assert(VersionedTable.commitOp(spark, rootOf("t9"),
      VersionedTable.latestVersion(spark, rootOf("t9"))).contains("merge"))
  }

  test("insert-only SQL MERGE (no source key matches any target row) " +
    "APPENDS the WHEN NOT MATCHED inserts instead of discarding them") {
    wh
    // force the runtime group filter on (the size guard would skip it
    // for a table this small, hiding the pruned-path behavior)
    spark.conf.set(GraftCatalog.MergeRuntimeFilterMinRows, "0")
    spark.sql("CREATE TABLE graft.t9b (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.t9b VALUES (1, 'a'), (2, 'b')")
    val before = VersionedTable.latestVersion(spark, rootOf("t9b"))
    // the runtime group filter prunes EVERY target dir (no key
    // overlap), yet the inserts must land — the round-13 advice bug
    // was this exact statement silently dropping them
    spark.sql("""MERGE INTO graft.t9b t
      |USING (SELECT * FROM VALUES (8, 'x'), (9, 'y') AS src(id, s)) s
      |ON t.id = s.id
      |WHEN MATCHED THEN UPDATE SET t.s = s.s
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT id, s FROM graft.t9b ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (8L, "x"), (9L, "y")))
    // and it committed as a pure append: every pre-merge commit dir
    // carries by identity (zero write amplification on the target)
    assert(VersionedTable.latestVersion(spark, rootOf("t9b")) == before + 1)
    val pre = VersionedTable.dataDirs(spark, rootOf("t9b"), Some(before)).toSet
    val post = VersionedTable.dataDirs(spark, rootOf("t9b")).toSet
    assert(pre.subsetOf(post))
  }

  test("SQL MERGE with only WHEN MATCHED clauses and no matching keys " +
    "stays a true no-op: nothing written, no version committed") {
    wh
    spark.conf.set(GraftCatalog.MergeRuntimeFilterMinRows, "0")
    spark.sql("CREATE TABLE graft.t9c (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.t9c VALUES (1, 'a')")
    val before = VersionedTable.latestVersion(spark, rootOf("t9c"))
    spark.sql("""MERGE INTO graft.t9c t
      |USING (SELECT * FROM VALUES (9, 'z') AS src(id, s)) s
      |ON t.id = s.id
      |WHEN MATCHED THEN UPDATE SET t.s = s.s""".stripMargin)
    assert(VersionedTable.latestVersion(spark, rootOf("t9c")) == before)
    assert(spark.sql("SELECT s FROM graft.t9c WHERE id = 1")
      .as[String].head == "a")
  }

  test("a CHECK constraint blocks a violating SQL UPDATE at the commit " +
    "point — the statement fails, the table is unchanged") {
    wh
    spark.sql("CREATE TABLE graft.t10 (id BIGINT, n BIGINT)")
    spark.sql("INSERT INTO graft.t10 VALUES (1, 10), (2, 20)")
    VersionedTable.addConstraint(spark, rootOf("t10"), "n_pos", "n > 0")
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.t10 SET n = -5 WHERE id = 2")
    }
    assert(e.getMessage.contains("n_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("n_pos")))
    assert(spark.sql("SELECT n FROM graft.t10 WHERE id = 2")
      .as[Long].head == 20L)
  }

  test("INSERT OVERWRITE is a full rewrite; TRUNCATE empties the table; " +
    "both stay in history") {
    wh
    spark.sql("CREATE TABLE graft.t4 (id BIGINT)")
    spark.sql("INSERT INTO graft.t4 VALUES (1), (2)")
    spark.sql("INSERT OVERWRITE graft.t4 VALUES (9)")
    assert(spark.sql("SELECT id FROM graft.t4").as[Long].collect()
      .toSeq == Seq(9L))
    spark.sql("TRUNCATE TABLE graft.t4")
    assert(spark.sql("SELECT count(*) FROM graft.t4").as[Long].head == 0L)
    // history intact: the pre-overwrite version still reads
    assert(spark.sql("SELECT * FROM graft.t4 VERSION AS OF 1").count() == 2)
  }

  test("a time-traveled snapshot is read-only (writes and deletes " +
    "refuse at the seam)") {
    wh
    spark.sql("CREATE TABLE graft.t5 (id BIGINT)")
    spark.sql("INSERT INTO graft.t5 VALUES (1)")
    // SQL has no INSERT-with-time-travel spelling, so the guard sits
    // on the Table seam itself: a version-pinned load refuses writes
    val cat = new GraftCatalog
    cat.initialize("graft",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("warehouse", wh)))
    val pinned = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "t5"), "0")
    val e = intercept[IllegalArgumentException] {
      pinned.asInstanceOf[GraftSqlTable].newWriteBuilder(null)
    }
    assert(e.getMessage.contains("read-only"))
    assert(!pinned.asInstanceOf[GraftSqlTable]
      .canDeleteWhere(Array.empty[org.apache.spark.sql.sources.Filter]))
  }

  test("SHOW TABLES lists, DROP TABLE removes, RENAME moves the root") {
    wh
    spark.sql("CREATE TABLE graft.t6 (id BIGINT)")
    val names = spark.sql("SHOW TABLES IN graft")
      .select("tableName").as[String].collect().toSet
    assert(names.contains("t6"))
    spark.sql("ALTER TABLE graft.t6 RENAME TO t6b")
    assert(spark.sql("SELECT count(*) FROM graft.t6b").as[Long].head == 0L)
    spark.sql("DROP TABLE graft.t6b")
    val after = spark.sql("SHOW TABLES IN graft")
      .select("tableName").as[String].collect().toSet
    assert(!after.contains("t6b") && !after.contains("t6"))
  }

  test("ALTER TABLE ADD COLUMNS evolves additively and metadata-only; " +
    "non-additive alters refuse") {
    wh
    spark.sql("CREATE TABLE graft.t11 (id BIGINT)")
    spark.sql("INSERT INTO graft.t11 VALUES (1)")
    val dataRoot = new org.apache.hadoop.fs.Path(rootOf("t11"), "data")
    val fs = dataRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirsBefore = fs.listStatus(dataRoot).length
    spark.sql("ALTER TABLE graft.t11 ADD COLUMNS (s STRING)")
    // metadata-only: no data moved, old file reads the column as NULL
    assert(fs.listStatus(dataRoot).length == dirsBefore)
    val got = spark.sql("SELECT id, s FROM graft.t11")
      .as[(Long, Option[String])].collect().toSeq
    assert(got == Seq((1L, None)))
    // the evolved schema accepts full-width inserts
    spark.sql("INSERT INTO graft.t11 VALUES (2, 'x')")
    assert(spark.sql("SELECT count(*) FROM graft.t11 WHERE s = 'x'")
      .as[Long].head == 1L)
    // pre-evolution version time-travels with its original one-column
    // schema
    assert(spark.sql("SELECT * FROM graft.t11 VERSION AS OF 1")
      .columns.toSeq == Seq("id"))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.t11 DROP COLUMN s")
    }
    assert(e.getMessage.contains("rewrite") ||
      e.getMessage.toLowerCase.contains("unsupported"))
  }

  test("CHECK constraints are SQL-reachable via TBLPROPERTIES: SET adds " +
    "(validating existing data), UNSET drops, SHOW surfaces them") {
    wh
    spark.sql("CREATE TABLE graft.t14 (id BIGINT, n BIGINT)")
    spark.sql("INSERT INTO graft.t14 VALUES (1, 5)")
    spark.sql("ALTER TABLE graft.t14 SET TBLPROPERTIES " +
      "('graft.constraints.n_pos' = 'n > 0')")
    // enforcement is live: a violating insert refuses atomically
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.t14 VALUES (2, -1)")
    }
    assert(e.getMessage.contains("n_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("n_pos")))
    assert(spark.sql("SELECT count(*) FROM graft.t14").as[Long].head == 1L)
    // SHOW TBLPROPERTIES surfaces the constraint
    val props = spark.sql("SHOW TBLPROPERTIES graft.t14")
      .as[(String, String)].collect().toMap
    assert(props.get("graft.constraints.n_pos").contains("n > 0"))
    // a SET whose expression existing data violates refuses
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.t14 SET TBLPROPERTIES " +
        "('graft.constraints.n_big' = 'n > 100')")
    }
    spark.sql("ALTER TABLE graft.t14 UNSET TBLPROPERTIES " +
      "('graft.constraints.n_pos')")
    spark.sql("INSERT INTO graft.t14 VALUES (2, -1)") // allowed now
    assert(spark.sql("SELECT count(*) FROM graft.t14").as[Long].head == 2L)
  }

  test("CREATE TABLE AS SELECT works through the catalog: declared " +
    "create + atomic append, dropped on failure semantics from Spark") {
    wh
    spark.sql("CREATE TABLE graft.t13 AS " +
      "SELECT id, CAST(id AS STRING) AS s FROM range(5)")
    assert(spark.sql("SELECT count(*) FROM graft.t13").as[Long].head == 5L)
    // CTAS lands as the engine's own two commits: schema-bearing init
    // then the atomic append of the query result
    assert(VersionedTable.history(spark, rootOf("t13"))
      .select("operation").as[String].collect().toSeq ==
      Seq("append", "init"))
  }

  test("metadata tables: $history and $files surface the audit plane " +
    "through plain SQL, manifest-resolved") {
    wh
    spark.sql("CREATE TABLE graft.t12 (id BIGINT)")
    spark.sql("INSERT INTO graft.t12 VALUES (1), (2)")
    spark.sql("DELETE FROM graft.t12 WHERE id = 2")
    val hist = spark.sql(
      "SELECT version, operation FROM graft.`t12$history` ORDER BY version")
      .as[(Int, String)].collect().toSeq
    assert(hist == Seq((0, "init"), (1, "append"), (2, "delete")))
    // $files: every live file listed with its manifest row count
    val files = spark.sql(
      "SELECT commit_dir, num_rows FROM graft.`t12$files`")
      .as[(String, Option[Long])].collect()
    assert(files.nonEmpty && files.forall(_._2.isDefined))
    assert(files.flatMap(_._2).sum ==
      spark.sql("SELECT count(*) FROM graft.t12").as[Long].head)
    // unknown suffix refuses like a missing table
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.`t12$nope`").collect()
    }
  }

  test("SQL UPDATE rewrites ONLY may-match commit dirs: pruned dirs and " +
    "their stats carry by identity through the row-level seam") {
    wh
    spark.sql("CREATE TABLE graft.gp1 (id BIGINT, s STRING)")
    // three commit dirs with disjoint id envelopes
    spark.sql("INSERT INTO graft.gp1 SELECT id, concat('s', id) " +
      "FROM range(0, 100)")
    spark.sql("INSERT INTO graft.gp1 SELECT id, concat('s', id) " +
      "FROM range(100, 200)")
    spark.sql("INSERT INTO graft.gp1 SELECT id, concat('s', id) " +
      "FROM range(200, 300)")
    val root = rootOf("gp1")
    // 4 dirs: the CREATE's empty init commit + one per INSERT
    val before = VersionedTable.dataDirs(spark, root, Some(3)).toSet
    assert(before.size == 4)
    spark.sql("UPDATE graft.gp1 SET s = 'hit' WHERE id BETWEEN 120 AND 150")
    val v = VersionedTable.latestVersion(spark, root)
    assert(v == 4)
    val after = VersionedTable.dataDirs(spark, root, Some(v)).toSet
    // only the [100,200) dir may match: the other three carry by
    // IDENTITY (same dir names); the affected dir itself splits at
    // FILE granularity — its clean files carry as in-place file
    // references, only the may-match files rewrote
    assert((before intersect after).size == 3,
      s"expected 3 carried dirs, got ${(before intersect after).size}")
    val affectedDir = (before -- after).toSeq match {
      case Seq(d) => d.substring(d.lastIndexOf('/') + 1)
      case other => fail(s"expected exactly one split dir, got $other")
    }
    val refs = VersionedTable.readManifest(spark, root, v)
    val fileRefs = refs.filter(VersionedTable.refIsFile)
    assert(fileRefs.nonEmpty &&
      fileRefs.forall(r => VersionedTable.refDir(r) == affectedDir),
      s"clean files of $affectedDir should carry as file refs, got $refs")
    // every surviving reference is still covered by #file: lines in
    // the new manifest — carried dirs AND carried file refs
    val byDir = VersionedTable.statsByDir(spark, root, Some(v))
    refs.filterNot(_.startsWith(f"c$v%05d")).foreach(r =>
      assert(VersionedTable.statsForRef(byDir, r).isDefined,
        s"carried ref $r lost its stats lines"))
    // pruning is answer-invisible
    assert(spark.sql(
      "SELECT count(*) FROM graft.gp1 WHERE s = 'hit'").as[Long].head
      == 31L)
    assert(spark.sql("SELECT count(*) FROM graft.gp1").as[Long].head
      == 300L)
    assert(spark.sql(
      "SELECT s FROM graft.gp1 WHERE id = 42").as[String].head == "s42")
  }

  test("a provably-unmatchable SQL UPDATE is a true no-op: no version " +
    "committed; and SQL DELETE of a no-match predicate is metadata-only") {
    wh
    spark.sql("CREATE TABLE graft.gp2 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.gp2 SELECT id, 'x' FROM range(0, 50)")
    val root = rootOf("gp2")
    val v0 = VersionedTable.latestVersion(spark, root)
    spark.sql("UPDATE graft.gp2 SET s = 'y' WHERE id > 1000000")
    assert(VersionedTable.latestVersion(spark, root) == v0,
      "an unmatchable UPDATE must not commit a version")
    spark.sql("DELETE FROM graft.gp2 WHERE id > 1000000")
    assert(VersionedTable.latestVersion(spark, root) == v0,
      "an unmatchable DELETE must not commit a version")
    assert(spark.sql("SELECT count(*) FROM graft.gp2").as[Long].head == 50L)
  }

  test("the row-level write publishes against the version the table was " +
    "LOADED at — a commit landing after the load cannot be clobbered") {
    wh
    spark.sql("CREATE TABLE graft.gp3 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.gp3 VALUES (1, 'a')")
    val root = rootOf("gp3")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "gp3")
    val t = cat.loadTable(ident).asInstanceOf[GraftSqlTable]
    val pinned = t.pinnedVersion
    // a concurrent writer commits AFTER the load
    VersionedTable.append(spark,
      root, Seq((2L, "b")).toDF("id", "s"), expectedVersion = pinned)
    // the operation derived from the stale load must still target the
    // pinned base — publishing over the concurrent commit would
    // silently discard it (the round-12 advisory's lost update)
    val info = new org.apache.spark.sql.connector.write
      .RowLevelOperationInfo {
      override def command = org.apache.spark.sql.connector.write
        .RowLevelOperation.Command.UPDATE
      override def options = org.apache.spark.sql.util
        .CaseInsensitiveStringMap.empty()
    }
    val op = t.newRowLevelOperationBuilder(info).build()
      .asInstanceOf[GraftRowLevelOperation]
    assert(op.baseVersion == pinned,
      s"operation base ${op.baseVersion} drifted from pinned $pinned — " +
        "expectedVersion must be the loaded snapshot, not latest-at-" +
        "execution")
    // and a fresh statement over the NEW snapshot works fine
    spark.sql("UPDATE graft.gp3 SET s = 'z' WHERE id = 2")
    assert(spark.sql("SELECT s FROM graft.gp3 WHERE id = 2")
      .as[String].head == "z")
  }

  test("CREATE TABLE TBLPROPERTIES pins CHECK constraints from day one; " +
    "unsupported properties refuse instead of silently dropping") {
    wh
    spark.sql("CREATE TABLE graft.gp4 (id BIGINT, n BIGINT) " +
      "TBLPROPERTIES ('graft.constraints.n_pos' = 'n > 0')")
    // the constraint is live: a violating INSERT refuses atomically
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.gp4 VALUES (1, -5)")
    }
    assert(e.getMessage.contains("n_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("n_pos")))
    spark.sql("INSERT INTO graft.gp4 VALUES (1, 5)")
    assert(spark.sql("SELECT n FROM graft.gp4").as[Long].head == 5L)
    assert(spark.sql("SHOW TBLPROPERTIES graft.gp4")
      .as[(String, String)].collect()
      .contains(("graft.constraints.n_pos", "n > 0")))
    // a property the format cannot honor is refused loudly
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.gp4b (id BIGINT) " +
        "TBLPROPERTIES ('delta.appendOnly' = 'true')")
    }
    assert(e2.getMessage.contains("delta.appendOnly"))
    assert(!cat0.tableExists(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array.empty, "gp4b")))
  }

  test("DROP NAMESPACE on a table path refuses instead of deleting the " +
    "table's data behind dropTable's back") {
    wh
    spark.sql("CREATE TABLE graft.gp5 (id BIGINT)")
    spark.sql("INSERT INTO graft.gp5 VALUES (7)")
    // the SQL path pre-checks namespaceExists and refuses; the direct
    // catalog API call is the dangerous path the guard closes — before
    // it, this CASCADE recursively deleted the table's data dir
    intercept[Exception] {
      spark.sql("DROP NAMESPACE graft.gp5 CASCADE")
    }
    intercept[Exception] {
      cat0.dropNamespace(Array("gp5"), true)
    }
    // the table survives, data intact
    assert(spark.sql("SELECT id FROM graft.gp5").as[Long].head == 7L)
    // and a namespace cannot be created shadowing a table
    intercept[Exception] {
      cat0.createNamespace(Array("gp5"),
        java.util.Collections.emptyMap[String, String]())
    }
  }

  test("_commit_dir metadata column: hidden until referenced, then " +
    "per-row provenance naming the commit dir that holds the row") {
    wh
    spark.sql("CREATE TABLE graft.md1 (id BIGINT)")
    spark.sql("INSERT INTO graft.md1 SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO graft.md1 SELECT id FROM range(10, 20)")
    // hidden: SELECT * must NOT surface it
    assert(spark.sql("SELECT * FROM graft.md1").columns.toSeq == Seq("id"))
    val rows = spark.sql("SELECT id, _commit_dir FROM graft.md1")
      .as[(Long, String)].collect().toSeq
    assert(rows.size == 20)
    val byDir = rows.groupBy(_._2)
    // empty init dir contributes nothing; each INSERT's rows share a dir
    assert(byDir.size == 2, s"expected 2 populated dirs: ${byDir.keys}")
    assert(byDir.values.map(_.map(_._1).toSet).toSet ==
      Set((0L until 10L).toSet, (10L until 20L).toSet))
    // the dir names are the manifest's commit dirs
    val manifestDirs = VersionedTable.dataDirs(spark, rootOf("md1"))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(byDir.keySet.subsetOf(manifestDirs))
    // provenance composes with filters
    val one = spark.sql(
      "SELECT DISTINCT _commit_dir FROM graft.md1 WHERE id = 15")
      .as[String].collect().toSeq
    assert(one.size == 1 && byDir(one.head).map(_._1).toSet ==
      (10L until 20L).toSet)
    // and a filter ON _commit_dir prunes whole dirs at planning, like
    // a partition predicate: the scan plans only the named dir's files
    val d1 = byDir.keys.find(d => byDir(d).exists(_._1 == 0L)).get
    val pruned = spark.sql(
      s"SELECT id, _commit_dir FROM graft.md1 WHERE _commit_dir = '$d1'")
    assert(pruned.as[(Long, String)].collect().map(_._1).toSet ==
      (0L until 10L).toSet)
    val prunedScan = pruned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2
        .BatchScanExec => b.inputPartitions.size
    }.get
    val fullScan = spark.sql("SELECT id, _commit_dir FROM graft.md1")
      .queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.inputPartitions.size
      }.get
    assert(prunedScan < fullScan,
      s"dir filter did not prune partitions: $prunedScan vs $fullScan")
  }

  test("SQL MERGE INTO prunes unmatched commit dirs at RUNTIME: the " +
    "group-filter subquery computes matched dirs from the join, " +
    "untouched dirs carry by identity") {
    wh
    spark.conf.set(GraftCatalog.MergeRuntimeFilterMinRows, "0")
    spark.sql("CREATE TABLE graft.md2 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.md2 SELECT id, concat('s', id) " +
      "FROM range(0, 100)")
    spark.sql("INSERT INTO graft.md2 SELECT id, concat('s', id) " +
      "FROM range(100, 200)")
    spark.sql("INSERT INTO graft.md2 SELECT id, concat('s', id) " +
      "FROM range(200, 300)")
    val root = rootOf("md2")
    val before = VersionedTable.dataDirs(spark, root, Some(3)).toSet
    assert(before.size == 4)
    // source touches ONLY the middle dir's ids: a static analysis of
    // the ON condition cannot know that — only the runtime join can
    spark.sql("""MERGE INTO graft.md2 t
      |USING (SELECT id, concat('u', id) AS s FROM
      |  (SELECT explode(sequence(120, 130)) AS id)) src
      |ON t.id = src.id
      |WHEN MATCHED THEN UPDATE SET t.s = src.s""".stripMargin)
    val v = VersionedTable.latestVersion(spark, root)
    assert(v == 4)
    val after = VersionedTable.dataDirs(spark, root, Some(v)).toSet
    assert((before intersect after).size == 3,
      s"expected 3 carried dirs, got ${(before intersect after).size} — " +
        "runtime group filtering did not prune")
    // answers unharmed
    assert(spark.sql(
      "SELECT count(*) FROM graft.md2 WHERE s LIKE 'u%'").as[Long].head
      == 11L)
    assert(spark.sql("SELECT count(*) FROM graft.md2").as[Long].head
      == 300L)
    assert(spark.sql("SELECT s FROM graft.md2 WHERE id = 125")
      .as[String].head == "u125")
    assert(spark.sql("SELECT s FROM graft.md2 WHERE id = 42")
      .as[String].head == "s42")
    // unmatched-source inserts + matched updates in one statement
    // still correct when pruning is live
    spark.sql("""MERGE INTO graft.md2 t
      |USING (SELECT explode(sequence(290, 310)) AS id) src
      |ON t.id = src.id
      |WHEN MATCHED THEN UPDATE SET t.s = 'm'
      |WHEN NOT MATCHED THEN INSERT (id, s) VALUES (src.id, 'new')
      |""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.md2").as[Long].head
      == 311L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.md2 WHERE s = 'm'").as[Long].head == 10L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.md2 WHERE s = 'new'").as[Long].head
      == 11L)
  }

  test("MERGE runtime-filter size guard: below the row floor the " +
    "statement skips the pruning subquery and takes the plain full " +
    "rewrite — same answers, no insurance premium") {
    wh
    // default floor (10M rows) dwarfs this table → guard skips the
    // runtime filter: the statement is an unpruned full rewrite
    spark.conf.unset(GraftCatalog.MergeRuntimeFilterMinRows)
    try {
      spark.sql("CREATE TABLE graft.md5 (id BIGINT, s STRING)")
      spark.sql("INSERT INTO graft.md5 SELECT id, concat('s', id) " +
        "FROM range(0, 100)")
      spark.sql("INSERT INTO graft.md5 SELECT id, concat('s', id) " +
        "FROM range(100, 200)")
      val root = rootOf("md5")
      val before = VersionedTable.dataDirs(spark, root).toSet
      spark.sql("""MERGE INTO graft.md5 t
        |USING (SELECT 150 AS id, 'u' AS s) src
        |ON t.id = src.id
        |WHEN MATCHED THEN UPDATE SET t.s = src.s
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val after = VersionedTable.dataDirs(spark, root).toSet
      // no dynamic-pruning subquery ran: nothing carried by identity,
      // the whole snapshot was rewritten into fresh dirs
      assert((before intersect after).isEmpty,
        s"expected a full rewrite below the floor, carried " +
          s"${(before intersect after).size} dirs")
      assert(spark.sql("SELECT s FROM graft.md5 WHERE id = 150")
        .as[String].head == "u")
      assert(spark.sql("SELECT count(*) FROM graft.md5").as[Long].head
        == 200L)
    } finally
      spark.conf.set(GraftCatalog.MergeRuntimeFilterMinRows, "0")
  }

  test("MERGE with a target-only ON conjunct keeps carry-over rows of " +
    "surviving dirs: dir is the carry unit, so rows of a surviving " +
    "dir that fail the conjunct must still flow through the rewrite") {
    wh
    spark.conf.set(GraftCatalog.MergeRuntimeFilterMinRows, "0")
    spark.sql("CREATE TABLE graft.md6 (id BIGINT, s STRING)")
    // ONE dir straddling the conjunct boundary: ids 0..99, conjunct
    // id >= 50 — if the row-level scan ever pruned at row-group
    // granularity on the pushed conjunct, ids < 50 would vanish
    spark.sql("INSERT INTO graft.md6 SELECT id, concat('s', id) " +
      "FROM range(0, 100)")
    spark.sql("""MERGE INTO graft.md6 t
      |USING (SELECT 60 AS id, 'u' AS s) src
      |ON t.id = src.id AND t.id >= 50
      |WHEN MATCHED THEN UPDATE SET t.s = src.s""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.md6").as[Long].head
      == 100L,
      "carry-over rows below the ON conjunct were lost from the rewrite")
    assert(spark.sql("SELECT s FROM graft.md6 WHERE id = 60")
      .as[String].head == "u")
    assert(spark.sql("SELECT s FROM graft.md6 WHERE id = 10")
      .as[String].head == "s10")
  }

  test("SQL DML through the catalog materializes commit-time change " +
    "files when the table's change feed is enabled — same publishDir, " +
    "same CDC contract as the programmatic paths") {
    wh
    spark.conf.set(GraftCatalog.MergeRuntimeFilterMinRows, "0")
    spark.sql("CREATE TABLE graft.cdc1 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.cdc1 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val root = rootOf("cdc1")
    VersionedTable.enableChangeFeed(spark, root, "id") // v2
    spark.sql("UPDATE graft.cdc1 SET s = 'b2' WHERE id = 2") // v3
    spark.sql("DELETE FROM graft.cdc1 WHERE id = 1") // v4
    assert(VersionedTable.changeFilePathIfExists(spark, root, 3).isDefined)
    assert(VersionedTable.changeFilePathIfExists(spark, root, 4).isDefined)
    val f3 = VersionedTable.changesBetween(spark, root, 2, 3,
      key = Some("id"))
    assert(f3.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "SQL UPDATE's keyed feed must serve from its file")
    assert(f3.select("id", "s", "change_kind")
      .as[(Long, String, String)].collect().toSet == Set(
      (2L, "b", "update_preimage"), (2L, "b2", "update_postimage")))
    assert(VersionedTable.changesBetween(spark, root, 3, 4,
      key = Some("id")).select("id", "change_kind")
      .as[(Long, String)].collect().toSet == Set(1L -> "delete"))
  }

  test("the change feed is SQL-reachable as a table property: CREATE " +
    "TABLE pins it from day one, SHOW TBLPROPERTIES surfaces it, " +
    "SET/UNSET TBLPROPERTIES toggles it") {
    wh
    spark.sql("CREATE TABLE graft.cdc2 (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.changeFeed.key' = 'id')")
    val root = rootOf("cdc2")
    assert(VersionedTable.changeFeedKey(spark, root).contains("id"))
    spark.sql("INSERT INTO graft.cdc2 VALUES (1, 'a'), (2, 'b')") // v2
    spark.sql("UPDATE graft.cdc2 SET s = 'a2' WHERE id = 1") // v3
    assert(VersionedTable.changeFilePathIfExists(spark, root, 3).isDefined,
      "CREATE-time pin did not materialize the UPDATE's change file")
    assert(VersionedTable.changesBetween(spark, root, 2, 3,
      key = Some("id")).select("id", "s", "change_kind")
      .as[(Long, String, String)].collect().toSet == Set(
      (1L, "a", "update_preimage"), (1L, "a2", "update_postimage")))
    val props = spark.sql("SHOW TBLPROPERTIES graft.cdc2")
      .as[(String, String)].collect().toMap
    assert(props.get("graft.changeFeed.key").contains("id"))
    spark.sql("ALTER TABLE graft.cdc2 UNSET TBLPROPERTIES " +
      "('graft.changeFeed.key')")
    assert(VersionedTable.changeFeedKey(spark, root).isEmpty)
    spark.sql("ALTER TABLE graft.cdc2 SET TBLPROPERTIES " +
      "('graft.changeFeed.key' = 'id')")
    assert(VersionedTable.changeFeedKey(spark, root).contains("id"))
    // an unknown key column refuses at CREATE, atomically
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.cdc3 (id BIGINT) TBLPROPERTIES " +
        "('graft.changeFeed.key' = 'nope')")
    }
    assert(!spark.catalog.tableExists("graft.cdc3"))
  }

  test("spark.readStream.table streams the catalog table: snapshot " +
    "then live append tail, column pruning honored; change-feed mode " +
    "routes to the path connector loudly") {
    wh
    spark.sql("CREATE TABLE graft.rs1 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.rs1 VALUES (1, 'a'), (2, 'b')")
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.table("graft.rs1")
      .select("id") // prune: the stream must read under the pruned schema
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= b.as[Long].collect() }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.toSet == Set(1L, 2L), s"initial snapshot wrong: $seen")
      spark.sql("INSERT INTO graft.rs1 VALUES (3, 'c')")
      q.processAllAvailable()
      assert(seen.toSet == Set(1L, 2L, 3L), s"live tail wrong: $seen")
    } finally q.stop()
    // CDF mode cannot ride the fixed relation schema: loud routing
    val q2 = spark.readStream.option("readChangeFeed", "true")
      .table("graft.rs1").writeStream.format("noop").start()
    val e = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("graft-versioned-stream"),
      s"wrong failure: ${chain(e)}")
  }

  test("writeStream.toTable appends each micro-batch as one atomic " +
    "version with a txn marker; a checkpoint restart replays nothing") {
    wh
    spark.sql("CREATE TABLE graft.st1 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.st1 VALUES (0, 'seed')")
    val root = rootOf("st1")
    val ck = java.nio.file.Files.createTempDirectory("graft_st_ck").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = ms.toDF().toDF("id", "s").writeStream
        .option("checkpointLocation", ck).toTable("graft.st1")
      try q.processAllAvailable() finally q.stop()
    }
    ms.addData(1L -> "a", 2L -> "b")
    run()
    assert(spark.sql("SELECT count(*) FROM graft.st1").as[Long].head == 3L)
    val v = VersionedTable.latestVersion(spark, root)
    assert(VersionedTable.commitOp(spark, root, v)
      .contains("stream_append"))
    // the epoch's txn marker rode the commit atomically
    assert(VersionedTable.lastCommittedTxn(spark, root,
      manifestTxnApp(root, v)).isDefined)
    // append, not rewrite: the seed INSERT's dirs survive by identity
    val v1dirs = VersionedTable.dataDirs(spark, root, Some(2)).toSet
    assert(v1dirs.subsetOf(
      VersionedTable.dataDirs(spark, root, Some(v)).toSet))
    // second batch = its own version
    ms.addData(3L -> "c")
    run()
    assert(spark.sql("SELECT count(*) FROM graft.st1").as[Long].head == 4L)
    assert(VersionedTable.latestVersion(spark, root) == v + 1)
    // restart from the same checkpoint with no new data: nothing lands
    run()
    assert(spark.sql("SELECT count(*) FROM graft.st1").as[Long].head == 4L)
    assert(VersionedTable.latestVersion(spark, root) == v + 1,
      "checkpoint restart replayed a committed epoch")
    // the whole feed is consumable downstream via CDF
    val feed = VersionedTable.changeFeed(spark, root, 0)
      .select("id").as[Long].collect().toSet
    assert(feed == Set(0L, 1L, 2L, 3L))
  }

  test("the ZORDER cluster pin maintains TWO-column locality through " +
    "writes and point-DML: files get (x, y) rectangles, so the " +
    "SECOND column prunes too — where the lexicographic pin serves " +
    "only its leading column") {
    wh
    // zorder-pinned table vs the lexicographic twin, same 64x64 grid
    spark.sql("CREATE TABLE graft.zc (x BIGINT, y BIGINT)")
    spark.sql("CREATE TABLE graft.lc (x BIGINT, y BIGINT)")
    spark.sql("ALTER TABLE graft.zc CLUSTER BY ZORDER (x, y)")
    spark.sql("ALTER TABLE graft.lc CLUSTER BY (x, y)")
    val grid = "SELECT id % 64 AS x, CAST(id / 64 AS BIGINT) AS y " +
      "FROM range(0, 4096)"
    spark.sql(s"INSERT INTO graft.zc $grid")
    spark.sql(s"INSERT INTO graft.lc $grid")
    val (zroot, lroot) = (rootOf("zc"), rootOf("lc"))
    assert(VersionedTable.clusterZOrderMode(spark, zroot))
    assert(!VersionedTable.clusterZOrderMode(spark, lroot))
    def pruned(root: String, cond: org.apache.spark.sql.Column) =
      VersionedTable.pruneCounts(spark, root, cond).get
    // leading column: both layouts prune
    val (zx, zxc) = pruned(zroot, col("x") === 5L)
    assert(zxc >= 4 && zx >= zxc / 2,
      s"zorder must prune on x, got $zx/$zxc")
    // SECOND column: only the z-layout's rectangles prune — the
    // lexicographic twin's x-range files each span ALL of y
    val (zy, zyc) = pruned(zroot, col("y") === 5L)
    assert(zy >= zyc / 2, s"zorder must prune on y, got $zy/$zyc")
    // (a range boundary landing INSIDE one x value can leave one
    // file with a partial y-range, so allow a stray prune — the
    // contrast is half-the-files vs at-most-a-boundary-artifact)
    val (ly, lyc) = pruned(lroot, col("y") === 5L)
    assert(ly <= 1 && ly < lyc / 2,
      s"the lexicographic twin cannot meaningfully prune on y (got " +
        s"$ly/$lyc) — if it did, this test lost its contrast")
    // point-DML through the SQL row-level write: the replace write
    // demands ordering by the catalog's own zorder2 function
    // transform (FunctionCatalog-resolved), so the rewrite keeps the
    // rectangle discipline and y-pruning SURVIVES the DML
    spark.sql("DELETE FROM graft.zc WHERE x = 7 AND y = 9")
    assert(spark.sql("SELECT count(*) FROM graft.zc")
      .as[Long].head == 4095L)
    val (zy2, zyc2) = pruned(zroot, col("y") === 5L)
    assert(zy2 >= zyc2 / 2,
      s"y-pruning must survive the point-DML, got $zy2/$zyc2")
    // an engine-side append z-clusters its own batch too
    VersionedTable.append(spark, zroot,
      spark.sql("SELECT id % 64 AS x, CAST(64 + id / 64 AS BIGINT) " +
        "AS y FROM range(0, 4096)"),
      VersionedTable.latestVersion(spark, zroot))
    val (zy3, zyc3) = pruned(zroot, col("y") === 70L)
    assert(zy3 >= zyc3 / 2,
      s"appends must keep the z-layout, got $zy3/$zyc3")
    spark.sql("DROP TABLE graft.zc")
    spark.sql("DROP TABLE graft.lc")
  }

  test("_commit_version metadata column: the numeric sibling of " +
    "_commit_dir — per-row commit provenance that joins $history " +
    "directly, agrees with the dir-name encoding, tracks a DML " +
    "rewrite, and prunes whole dirs driver-side when filtered alone") {
    wh
    spark.sql("CREATE TABLE graft.cv (id BIGINT, s STRING)")         // v0
    spark.sql("INSERT INTO graft.cv VALUES (1, 'a'), (2, 'b')")      // v1
    spark.sql("INSERT INTO graft.cv VALUES (3, 'c')")                // v2
    // hidden until referenced: SELECT * carries no provenance
    assert(!spark.sql("SELECT * FROM graft.cv").columns
      .contains("_commit_version"))
    // per-row: the version of the INSERT that committed the row
    assert(spark.sql(
      "SELECT id, _commit_version FROM graft.cv ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 2L)))
    // both provenance columns together, and they agree with the
    // dir-name encoding
    spark.sql("SELECT _commit_dir, _commit_version FROM graft.cv")
      .collect().foreach { r =>
        assert(r.getString(0).startsWith(f"c${r.getLong(1)}%05d-"),
          s"got $r")
      }
    // the headline use: lineage joined against $history with no
    // string surgery
    val lineage = spark.sql(
      "SELECT h.operation, count(*) AS n FROM graft.cv t " +
        "JOIN graft.`cv$history` h ON t._commit_version = h.version " +
        "GROUP BY h.operation ORDER BY h.operation")
      .as[(String, Long)].collect().toSeq
    assert(lineage == Seq("append" -> 3L), s"got $lineage")
    // a single-column predicate on _commit_version prunes whole dirs
    // at plan time (provenance reads behave like partition pruning)
    assert(spark.sql(
      "SELECT id FROM graft.cv WHERE _commit_version = 2")
      .as[Long].collect().toSeq == Seq(3L))
    // a DML rewrite re-homes surviving rows under ITS version —
    // provenance means "the commit that wrote these bytes"
    spark.sql("UPDATE graft.cv SET s = 'b2' WHERE id = 2")           // v3
    val afterDml = spark.sql(
      "SELECT id, _commit_version FROM graft.cv ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(afterDml.find(_._1 == 2L).exists(_._2 == 3L),
      s"the updated row must carry the DML version, got $afterDml")
    assert(afterDml.find(_._1 == 3L).exists(_._2 == 2L),
      s"an untouched dir keeps its original version, got $afterDml")
    spark.sql("DROP TABLE graft.cv")
  }

  test("a shadowing DATA column named _commit_version filters as " +
    "DATA even in a provenance (dir-mode) scan: the pushed predicate " +
    "must not be misread as driver-side dir pruning against the " +
    "SINK's own commit versions") {
    wh
    // a CDF-relayed sink legitimately OWNS _commit_version as data:
    // the upstream's versions (0, 0, 1), written here as commit v1
    spark.sql("CREATE TABLE graft.shdw " +
      "(id BIGINT, `_commit_version` BIGINT)")
    spark.sql("INSERT INTO graft.shdw VALUES (1, 0), (2, 0), (3, 1)")
    // data semantics when read alone (the shadowing contract)
    assert(spark.sql("SELECT id FROM graft.shdw " +
      "WHERE _commit_version = 0 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // THE REGRESSION: reference the genuine _commit_dir meta column
    // (forcing the dir-tagged scan) while filtering the shadowed
    // DATA column. A name-only split routed `_commit_version = 0`
    // into dir pruning, evaluated it against the sink's OWN commit
    // version (1 — no dir survives), and silently returned 0 rows.
    val got = spark.sql("SELECT id, _commit_dir FROM graft.shdw " +
      "WHERE _commit_version = 0 ORDER BY id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      s"shadowed-column filter dropped rows in dir mode: " +
        s"${got.toSeq}")
    assert(got.forall(_.getString(1).startsWith("c00001-")),
      s"all rows were written by sink commit v1, got ${got.toSeq}")
    spark.sql("DROP TABLE graft.shdw")
  }

  test("ZORDER refuses a DATE cluster column at PIN time: DATE " +
    "cannot cast to BIGINT in Spark 4, so admitting the pin would " +
    "be a metadata-only success that poisons every later write — " +
    "the refusal names the unix_date recipe and the table stays " +
    "writable") {
    wh
    spark.sql("CREATE TABLE graft.zd (d DATE, y BIGINT)")
    spark.sql("INSERT INTO graft.zd VALUES (DATE'2024-01-01', 1)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.zd CLUSTER BY ZORDER (d, y)")
    }
    assert((e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("unix_date"), s"got ${e.getMessage}")
    // the pin never landed, so the write path stays healthy — the
    // failure mode this guards was exactly the opposite order
    assert(VersionedTable.clusterSpec(spark, rootOf("zd")).isEmpty)
    spark.sql("INSERT INTO graft.zd VALUES (DATE'2024-01-02', 2)")
    assert(spark.sql("SELECT count(*) FROM graft.zd")
      .as[Long].head == 2L)
    // the documented recipe works: materialize int days, pin THAT
    spark.sql("CREATE TABLE graft.zd2 (dd INT, y BIGINT)")
    spark.sql("INSERT INTO graft.zd2 SELECT unix_date(d), y FROM graft.zd")
    spark.sql("ALTER TABLE graft.zd2 CLUSTER BY ZORDER (dd, y)")
    assert(VersionedTable.clusterZOrderMode(spark, rootOf("zd2")))
    spark.sql("INSERT INTO graft.zd2 VALUES (19724, 3)")
    assert(spark.sql("SELECT count(*) FROM graft.zd2")
      .as[Long].head == 3L)
    spark.sql("DROP TABLE graft.zd")
    spark.sql("DROP TABLE graft.zd2")
  }

  test("a cluster-pinned table range-clusters STREAMING epochs too: " +
    "writeStream.toTable demands the ordered distribution per " +
    "micro-batch, so a point lookup on the pinned column prunes the " +
    "epoch's files") {
    wh
    spark.sql("CREATE TABLE graft.stc (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.stc VALUES (-1, 'seed')")
    val root = rootOf("stc")
    spark.sql("ALTER TABLE graft.stc CLUSTER BY (id)")
    val ck = java.nio.file.Files.createTempDirectory("graft_stc_ck")
      .toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // a test epoch is a few KB where production epochs are GBs, so
    // AQE's coalescing (desirable in production — epoch files sized
    // by BYTES, not by shuffle width) folds the whole batch into one
    // range; disable it for the stream's duration to OBSERVE the
    // range separation at test scale
    val coalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    try {
      ms.addData((0L until 1600L).map(i => i -> s"s$i"): _*)
      val q = ms.toDF().toDF("id", "s").writeStream
        .option("checkpointLocation", ck).toTable("graft.stc")
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", coalesce)
    assert(spark.sql("SELECT count(*) FROM graft.stc")
      .as[Long].head == 1601L)
    val v = VersionedTable.latestVersion(spark, root)
    assert(VersionedTable.commitOp(spark, root, v)
      .contains("stream_append"))
    // the epoch landed as SEVERAL files with DISJOINT id envelopes:
    // a point lookup keeps at most one epoch file (+ the seed dir's)
    val (pruned, covered) = VersionedTable.pruneCounts(spark, root,
      org.apache.spark.sql.functions.col("id") === 700L).get
    assert(covered >= 4,
      s"the clustered epoch should land as several range files, " +
        s"got $covered covered files")
    assert(pruned >= covered - 2,
      s"a point lookup on the pinned column must prune the epoch " +
        s"to at most one file (+seed), got $pruned/$covered")
    // exactly-once unharmed: replaying the checkpoint lands nothing
    val q2 = ms.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", ck).toTable("graft.stc")
    try q2.processAllAvailable() finally q2.stop()
    assert(VersionedTable.latestVersion(spark, root) == v)
  }

  // the appId of the txn marker on version v (stream-<queryId> is
  // generated by the engine; resolve it from the manifest)
  private def manifestTxnApp(root: String, v: Int): String = {
    val p = new org.apache.hadoop.fs.Path(root,
      s"_manifests/v$v.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    val line = body.linesIterator.find(_.startsWith("#txn:")).get
    line.stripPrefix("#txn:").split(':').dropRight(1).mkString(":")
  }

  private def cat0: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]

  test("catalog scans report statistics — exact manifest row count + " +
    "delegated parquet size — so a small graft dim STATICALLY plans a " +
    "broadcast join (AQE off) instead of costing defaultSizeInBytes") {
    wh
    spark.sql("CREATE TABLE graft.stats_f (id BIGINT, v BIGINT)")
    spark.range(5000).select($"id", ($"id" * 2).as("v"))
      .createOrReplaceTempView("sf_src")
    spark.sql("INSERT INTO graft.stats_f SELECT * FROM sf_src")
    spark.sql("CREATE TABLE graft.stats_d (id BIGINT, w STRING)")
    spark.sql("INSERT INTO graft.stats_d VALUES (1, 'a'), (2, 'b')")
    // the relation's cost comes from the scan, not the 8-EB default
    val dimStats = spark.table("graft.stats_d")
      .queryExecution.optimizedPlan.stats
    assert(dimStats.rowCount.contains(BigInt(2)),
      s"manifest-exact row count, got ${dimStats.rowCount}")
    val defaultSize =
      BigInt(spark.sessionState.conf.defaultSizeInBytes)
    assert(dimStats.sizeInBytes < defaultSize / 1000,
      s"delegated size estimate, got ${dimStats.sizeInBytes}")
    // the STATIC planner (AQE off) picks the broadcast join on its own
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.sql(
        "SELECT f.id, f.v, d.w FROM graft.stats_f f " +
          "JOIN graft.stats_d d ON f.id = d.id")
      val bhj = joined.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins
          .BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty, "dim must broadcast statically:\n" +
        joined.queryExecution.executedPlan)
      assert(joined.count() == 2L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    // time travel reports the PINNED version's count
    spark.sql("INSERT INTO graft.stats_d VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM graft.stats_d VERSION AS OF 1")
      .queryExecution.optimizedPlan.stats.rowCount
      .contains(BigInt(2)))
    assert(spark.table("graft.stats_d")
      .queryExecution.optimizedPlan.stats.rowCount
      .contains(BigInt(3)))
  }

  test("catalog scans report COLUMN statistics from the manifest " +
    "envelopes: CBO estimates a range filter's selectivity from the " +
    "real min/max instead of a default guess") {
    wh
    spark.sql(
      "CREATE TABLE graft.cbo_t (id BIGINT, s STRING, v DOUBLE)")
    spark.range(10000)
      .select($"id",
        org.apache.spark.sql.functions.when($"id" % 10 === 0, null)
          .otherwise(org.apache.spark.sql.functions
            .concat(org.apache.spark.sql.functions.lit("s"), $"id"))
          .as("s"),
        ($"id" * 0.5).as("v"))
      .createOrReplaceTempView("cbo_src")
    spark.sql("INSERT INTO graft.cbo_t SELECT * FROM cbo_src")
    // NDV sketches: backfill at enable, then each commit sketches
    // only its own rows
    VersionedTable.enableNdvStats(spark, rootOf("cbo_t"))
    val cbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.table("graft.cbo_t")
        .queryExecution.optimizedPlan
      val attrStats = plan.stats.attributeStats
      val idStat = attrStats.find(_._1.name == "id").map(_._2)
        .getOrElse(fail(s"no column stats for id: ${plan.stats}"))
      assert(idStat.min.contains(0L) && idStat.max.contains(9999L),
        s"exact manifest envelope, got $idStat")
      assert(idStat.nullCount.contains(BigInt(0)))
      // HLL estimate within 5% of the true 10000 distinct ids,
      // clamped to the non-null row bound
      val ndv = idStat.distinctCount
        .getOrElse(fail(s"no NDV for id: $idStat"))
      assert(ndv >= BigInt(9500) && ndv <= BigInt(10000),
        s"sketched NDV near the true 10000, got $ndv")
      val sStat = attrStats.find(_._1.name == "s").map(_._2)
        .getOrElse(fail("no column stats for s"))
      assert(sStat.nullCount.contains(BigInt(1000)),
        s"exact summed null count, got ${sStat.nullCount}")
      // CBO turns the envelope into selectivity: a 10% range filter
      // estimates ~10% of the rows, not a default guess
      val filtered = spark.table("graft.cbo_t").filter($"id" >= 9000L)
      val fStats = filtered.queryExecution.optimizedPlan.stats
      val est = fStats.rowCount
        .getOrElse(fail(s"CBO must estimate a row count: $fStats"))
      assert(est > BigInt(500) && est < BigInt(2000),
        s"~10% selectivity from the real [0, 9999] envelope, got $est")
      // time travel reports the PINNED version's envelope
      spark.sql(
        "INSERT INTO graft.cbo_t VALUES (100000, 'x', 1.0)")
      val pinned = spark.sql(
        "SELECT * FROM graft.cbo_t VERSION AS OF 1")
        .queryExecution.optimizedPlan.stats.attributeStats
        .find(_._1.name == "id").map(_._2)
      assert(pinned.exists(_.max.contains(9999L)),
        s"pinned envelope excludes the later insert, got $pinned")
      val after = spark.table("graft.cbo_t")
        .queryExecution.optimizedPlan.stats.attributeStats
        .find(_._1.name == "id").map(_._2)
        .getOrElse(fail("no stats after insert"))
      assert(after.max.contains(100000L))
      // the INSERT's commit sketched only its own row; the union
      // (old dirs' sketches + the new one) tracks the growth
      assert(after.distinctCount.exists(n =>
        n >= BigInt(9500) && n <= BigInt(10001)),
        s"incremental NDV union, got ${after.distinctCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", cbo)
  }

  test("CBO join reorder runs on real table statistics: a 3-table " +
    "join written worst-first re-plans so the two small dims join " +
    "before the fact ever widens") {
    wh
    // fact 50k, dims 50 and 5 — written in the catastrophic order
    // (fact ⋈ mid) ⋈ tiny; a cost-based reorder must move tiny in
    spark.sql("CREATE TABLE graft.jr_fact (k1 BIGINT, k2 BIGINT, " +
      "v BIGINT)")
    spark.range(50000).select(($"id" % 50).as("k1"),
      ($"id" % 5).as("k2"), $"id".as("v"))
      .createOrReplaceTempView("jr_fact_src")
    spark.sql("INSERT INTO graft.jr_fact SELECT * FROM jr_fact_src")
    spark.sql("CREATE TABLE graft.jr_mid (k1 BIGINT, a STRING)")
    spark.range(50).select($"id".as("k1"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("a"), $"id").as("a"))
      .createOrReplaceTempView("jr_mid_src")
    spark.sql("INSERT INTO graft.jr_mid SELECT * FROM jr_mid_src")
    spark.sql("CREATE TABLE graft.jr_tiny (k2 BIGINT, b STRING)")
    spark.sql("INSERT INTO graft.jr_tiny VALUES (0, 'x'), (1, 'y')")
    VersionedTable.enableNdvStats(spark, rootOf("jr_fact"))
    VersionedTable.enableNdvStats(spark, rootOf("jr_mid"))
    VersionedTable.enableNdvStats(spark, rootOf("jr_tiny"))
    val q = "SELECT f.v, m.a, t.b FROM graft.jr_fact f " +
      "JOIN graft.jr_mid m ON f.k1 = m.k1 " +
      "JOIN graft.jr_tiny t ON f.k2 = t.k2"
    def joinOrder(): Seq[String] = {
      val plan = spark.sql(q).queryExecution.optimizedPlan
      plan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.condition.map(_.references.map(_.name).toSeq.sorted
            .mkString(",")).getOrElse("")
      }
    }
    val (cbo, reorder) = (spark.conf.get("spark.sql.cbo.enabled"),
      spark.conf.get("spark.sql.cbo.joinReorder.enabled"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val naive = joinOrder()
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = joinOrder()
      assert(naive != reordered,
        s"stats must change the join order: naive=$naive cbo=$reordered")
      // correctness is invariant under the reorder
      assert(spark.sql(q).count() ==
        50000L / 5 * 2) // k2 ∈ {0,1} of 5 values
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", reorder)
    }
  }

  test("CBO reorder and the skew advisor COMPOSE: stats pick the join " +
    "order, the advisor salts the surviving skewed edge, and the " +
    "answer is invariant under both") {
    wh
    // fact 50k: k1 90%-one-key (the skewed edge), k2 uniform over 5
    spark.sql("CREATE TABLE graft.sk_fact (k1 BIGINT, k2 BIGINT, " +
      "v BIGINT)")
    spark.range(50000).select(
      when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 40 + 1).as("k1"),
      ($"id" % 5).as("k2"), $"id".as("v"))
      .createOrReplaceTempView("sk_fact_src")
    spark.sql("INSERT INTO graft.sk_fact SELECT * FROM sk_fact_src")
    spark.sql("CREATE TABLE graft.sk_mid (k1 BIGINT, a STRING)")
    spark.range(41).select($"id".as("k1"),
      concat(lit("a"), $"id").as("a"))
      .createOrReplaceTempView("sk_mid_src")
    spark.sql("INSERT INTO graft.sk_mid SELECT * FROM sk_mid_src")
    spark.sql("CREATE TABLE graft.sk_tiny (k2 BIGINT, b STRING)")
    spark.sql("INSERT INTO graft.sk_tiny VALUES (0, 'x'), (1, 'y')")
    Seq("sk_fact", "sk_mid", "sk_tiny").foreach(t =>
      VersionedTable.enableNdvStats(spark, rootOf(t)))
    VersionedTable.enableQuantileStats(spark, rootOf("sk_fact"),
      Seq("k1"))
    val q = "SELECT f.v, m.a, t.b FROM graft.sk_fact f " +
      "JOIN graft.sk_mid m ON f.k1 = m.k1 " +
      "JOIN graft.sk_tiny t ON f.k2 = t.k2"
    def joinOrder(): Seq[String] = spark.sql(q).queryExecution
      .optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.condition.map(_.references.map(_.name).toSeq.sorted
            .mkString(",")).getOrElse("")
      }
    val (cbo, reorder) = (spark.conf.get("spark.sql.cbo.enabled"),
      spark.conf.get("spark.sql.cbo.joinReorder.enabled"))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val naive = joinOrder()
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // 1) the REORDER half: NDV stats change the order
      assert(naive != joinOrder(),
        s"stats must change the join order, still $naive")
      // 2) the ADVISOR half: the surviving skewed edge (f.k1 = m.k1)
      //    gets a statistics-chosen salt tracking the planted 90%
      val advice = graft.ops.SkewAdvisor.advise(spark,
        rootOf("sk_fact"), "k1", 32)
      assert(advice.basis == "kll-mass" &&
        math.abs(advice.hotShare - 0.9) < 0.05 &&
        advice.salt >= 26 && advice.salt <= 32,
        s"advisor tracks the planted skew, got $advice")
      val uniform = graft.ops.SkewAdvisor.advise(spark,
        rootOf("sk_fact"), "k2", 32)
      assert(uniform.salt > 1,
        s"5-value k2 needs spreading too, got $uniform")
      // 3) COMPOSED execution: tiny joins first (the reorder's pick),
      //    then the skewed edge runs salted — answer invariant
      val fact = spark.table("graft.sk_fact")
      val mid = spark.table("graft.sk_mid")
      val tiny = spark.table("graft.sk_tiny")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select($"v", $"a", $"b").orderBy("v")
          .collect().map(_.toSeq).toSeq
      val plain = canon(fact.join(mid, Seq("k1")).join(tiny, Seq("k2")))
      val composed = canon(graft.ops.Skew.saltedJoin(
        fact.join(tiny, Seq("k2")), mid, Seq("k1"),
        salts = advice.salt))
      assert(composed == plain)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", reorder)
    }
  }

  test("$skew metadata table serves the advisor's view: pinned " +
    "columns row with measured mass, unpinned columns ABSENT (refuse " +
    "to guess, in SQL too)") {
    wh
    spark.sql("CREATE TABLE graft.sw_t (k BIGINT, u BIGINT, s STRING)")
    spark.range(1000).select(
      when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
      $"id".as("u"), concat(lit("x"), $"id").as("s"))
      .createOrReplaceTempView("sw_src")
    spark.sql("INSERT INTO graft.sw_t SELECT * FROM sw_src")
    VersionedTable.enableQuantileStats(spark, rootOf("sw_t"),
      Seq("k", "u"))
    val rows = spark.sql("SELECT column, hot_share, basis, " +
      "advised_salt FROM graft.`sw_t$skew` ORDER BY column").collect()
    val byCol = rows.map(r => r.getString(0) ->
      (r.getDouble(1), r.getString(2), r.getInt(3))).toMap
    assert(byCol.contains("k") && byCol("k")._2 == "kll-mass" &&
      byCol("k")._3 > 1, s"hot column advises a real salt: $byCol")
    assert(byCol("u")._3 == 1, s"uniform column advises 1: $byCol")
    assert(!byCol.contains("s"),
      "unpinned string column absent — measured rows only")
  }

  test("stale sketch domains surface in $stats (note column) and " +
    "$skew (named refusal row) — degradation is distinguishable " +
    "from never-pinned absence") {
    wh
    spark.sql("CREATE TABLE graft.stale_t (k BIGINT, s STRING)")
    spark.range(500).select(($"id" % 50).as("k"),
      concat(lit("x"), $"id").as("s")).createOrReplaceTempView("stale_src")
    spark.sql("INSERT INTO graft.stale_t SELECT * FROM stale_src")
    val root = rootOf("stale_t")
    VersionedTable.enableNdvStats(spark, root, Seq("k"))
    VersionedTable.enableQuantileStats(spark, root, Seq("k"))
    // fresh pins: no notes, measured skew advice
    val fresh = spark.sql(
      "SELECT column, note FROM graft.`stale_t$stats`").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(fresh("k").isEmpty, s"fresh pins carry no note: $fresh")
    assert(spark.sql("SELECT basis FROM graft.`stale_t$skew` " +
      "WHERE column = 'k'").head().getString(0) != null)
    // simulate a sketch-domain bump over persisted history: rewrite
    // the #ndv:/#kll: lines to the old version, then commit again so
    // the carried-verbatim lines land in a fresh (uncached) manifest
    val v = VersionedTable.latestVersion(spark, root)
    val mf = new java.io.File(root, s"_manifests/v$v.json")
    val doctored = new String(
      java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
      .linesIterator.map { l =>
        if (l.startsWith(NdvStats.LinePrefix) ||
          l.startsWith(QuantileStats.LinePrefix))
          l.replace(s""""v":${NdvStats.DomainVersion},""", """"v":1,""")
        else l
      }.mkString("\n")
    java.nio.file.Files.write(mf.toPath, doctored.getBytes("UTF-8"))
    // drop the local FS's checksum sibling of the doctored manifest
    new java.io.File(root, s"_manifests/.v$v.json.crc").delete()
    spark.sql("INSERT INTO graft.stale_t SELECT * FROM stale_src")
    // $stats: ndv degrades to NULL, and the note NAMES the fix
    val after = spark.sql("SELECT column, ndv, note FROM " +
      "graft.`stale_t$stats` WHERE column = 'k'").head()
    assert(after.isNullAt(1), "mixed-domain NDV must read unknown")
    assert(Option(after.getString(2)).exists(n =>
      n.contains("stale ndv sketch domain") &&
        n.contains("stale quantile sketch domain")),
      s"note must name both stale families, got: ${after.getString(2)}")
    // $skew: the degraded column gets a named-refusal row (NULL
    // advice, basis says why) instead of vanishing
    val skew = spark.sql("SELECT hot_share, basis, advised_salt FROM " +
      "graft.`stale_t$skew` WHERE column = 'k'").head()
    assert(skew.isNullAt(0) && skew.isNullAt(2) &&
      skew.getString(1).contains("stale-sketch-domain"),
      s"stale column must surface the named refusal, got: $skew")
    // the note names the fix, and the fix WORKS: one ANALYZE repins
    // BOTH families under the current domain — estimates return, the
    // notes clear, the advisor measures again
    spark.sql("ANALYZE TABLE graft.stale_t COMPUTE STATISTICS " +
      "FOR COLUMNS k").collect()
    val healed = spark.sql("SELECT ndv, note FROM " +
      "graft.`stale_t$stats` WHERE column = 'k'").head()
    assert(!healed.isNullAt(0) && healed.isNullAt(1),
      s"ANALYZE must heal the stale domain, got: $healed")
    assert(spark.sql("SELECT basis FROM graft.`stale_t$skew` " +
      "WHERE column = 'k'").head().getString(0)
      .contains("kll"), "the advisor must measure again after ANALYZE")
  }

  test("$retention serves the vacuum sizing schedule: per candidate " +
    "keepVersions, the versions/dirs/bytes reclaimed — consistent " +
    "with vacuumPreview and with what vacuum actually does") {
    wh
    spark.sql("CREATE TABLE graft.rt_t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.rt_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.rt_t VALUES (3, 'c')")
    // a rewrite makes the old dirs exclusive to old versions; the
    // modulo predicate is untranslatable to envelopes, so BOTH insert
    // dirs rewrite (a plain `id = 1` would be stats-pruned to one)
    spark.sql("DELETE FROM graft.rt_t WHERE id % 4 = 1")
    val root = rootOf("rt_t")
    val sched = spark.sql("SELECT * FROM graft.`rt_t$retention` " +
      "ORDER BY keep_versions").collect()
    // versions: 0 create, 1+2 inserts, 3 delete-rewrite → 4 rows
    assert(sched.length == 4)
    def row(k: Int) = sched.find(_.getInt(0) == k).get
    // keep only the live version: the two insert dirs (both rewritten
    // at v3) drop; keep 2+: every dir is still referenced
    assert(row(1).getLong(2) == 3L, "k=1 drops three versions")
    // three dirs: CREATE's empty init dir + the two rewritten inserts
    assert(row(1).getLong(3) == 3L && row(1).getLong(5) > 0L,
      s"k=1 reclaims the pre-rewrite dirs, got ${row(1)}")
    assert(row(2).getLong(3) == 0L && row(2).getLong(5) == 0L,
      "k=2 keeps v2 whose manifest references every pre-delete dir")
    assert(row(4).getLong(2) == 0L && row(4).getLong(5) == 0L)
    // bytes monotonically non-increasing in k
    val bytes = sched.map(_.getLong(5))
    assert(bytes.zip(bytes.tail).forall { case (a, b) => a >= b })
    // consistency with vacuumPreview (retainMillis=0 = no age guard)
    val pv = VersionedTable.vacuumPreview(spark, root,
      keepVersions = 1, retainMillis = 0L).collect()
    assert(pv.map(_.getLong(2)).sum == row(1).getLong(5),
      "schedule row k=1 must equal vacuumPreview's byte total")
    // and with vacuum itself: after vacuum(keep=1) the schedule
    // re-reads as nothing-left-to-reclaim
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      retainMillis = 0L)
    val after = spark.sql("SELECT bytes_reclaimable FROM " +
      "graft.`rt_t$retention`").collect()
    assert(after.forall(_.getLong(0) == 0L))
    assert(spark.sql("SELECT * FROM graft.rt_t").count() == 2)
    // the consumer-floor convention through SQL: $consumers serves
    // the registry (empty before any publish), and $retention's
    // consumers_behind counts the floors a setting would starve
    assert(spark.sql("SELECT * FROM graft.`rt_t$consumers`")
      .count() == 0)
    // floor 0 = "I still need version 0", which the vacuum above
    // already dropped — every schedule row now reports it starved
    VersionedTable.publishConsumerFloor(spark, root, "dash", 0)
    assert(spark.sql(
      "SELECT floor_version FROM graft.`rt_t$consumers` " +
        "WHERE consumer = 'dash'").as[Long].head == 0L)
    assert(spark.sql("SELECT max(consumers_behind) FROM " +
      "graft.`rt_t$retention`").as[Long].head == 1L)
  }

  test("$refs serves the ref-fragmentation advisor: census, measured " +
    "fold cost, and an actionable OPTIMIZE ... REFS recommendation " +
    "that clears after the fold") {
    wh
    spark.sql("CREATE TABLE graft.rf_t (id BIGINT, s STRING)")
    // REPARTITION_BY_RANGE with an explicit N survives AQE
    // coalescing: 24 range files whose id envelopes tile the domain
    spark.sql("INSERT INTO graft.rf_t SELECT " +
      "/*+ REPARTITION_BY_RANGE(24, id) */ id, concat('s', id) " +
      "FROM range(0, 2400)")
    val quiet = spark.sql("SELECT * FROM graft.`rf_t$refs`").head()
    assert(quiet.getLong(0) == 0L && quiet.isNullAt(8),
      s"an unfragmented table recommends nothing, got $quiet")
    // a point delete on the many-file dir splits it: carried refs
    // (and their #file: lines) now dominate the manifest
    spark.sql("DELETE FROM graft.rf_t WHERE id = 7")
    val hot = spark.sql("SELECT * FROM graft.`rf_t$refs`").head()
    assert(hot.getLong(0) >= 16L,
      s"the split should carry >= 16 file refs, got $hot")
    assert(hot.getDouble(6) >= 0.5 &&
      hot.getString(8) == "OPTIMIZE graft.rf_t REFS",
      s"expected the fold recommendation, got $hot")
    assert(!hot.isNullAt(7) && hot.getLong(7) > 0L,
      s"fold_rows must be measured from the carried #file: lines: " +
        s"$hot")
    // run the recommended statement VERBATIM — the signal must be
    // directly actionable — and the advisor goes quiet
    spark.sql(hot.getString(8))
    val healed = spark.sql("SELECT * FROM graft.`rf_t$refs`").head()
    assert(healed.getLong(0) == 0L && healed.isNullAt(8),
      s"after the fold the advisor must go quiet, got $healed")
    assert(spark.sql("SELECT count(*) FROM graft.rf_t")
      .as[Long].head == 2399L)
  }

  test("$advice is the one-stop maintenance dashboard: empty when " +
    "healthy, one actionable row per advisor signal, each clearing " +
    "with its fix") {
    wh
    spark.sql("CREATE TABLE graft.adv (k BIGINT, v BIGINT)")
    val root = rootOf("adv")
    def rows(signal: String) = spark.sql(
      s"SELECT measurement, recommendation FROM graft.`adv$$advice` " +
        s"WHERE signal = '$signal'").collect()
    // healthy table: no advice at all (the advisors refuse to guess;
    // refusals render as ABSENCE here, same as $skew)
    assert(spark.sql("SELECT * FROM graft.`adv$advice`").count() == 0)
    // 1) REF FRAGMENTATION: a point delete on a 24-file range commit
    spark.sql("INSERT INTO graft.adv SELECT " +
      "/*+ REPARTITION_BY_RANGE(24, id) */ id % 2, id " +
      "FROM range(0, 2400)")
    spark.sql("DELETE FROM graft.adv WHERE v = 7")
    val frag = rows("ref_fragmentation")
    assert(frag.length == 1 &&
      frag.head.getString(1) == "OPTIMIZE graft.adv REFS",
      s"got ${frag.toSeq}")
    spark.sql(frag.head.getString(1)) // run the advice VERBATIM
    assert(rows("ref_fragmentation").isEmpty, "the fold must clear it")
    // 2) SKEW: ndv-pinned two-value k advises a salt > 1; unique v
    //    stays quiet (salt 1 is not actionable advice)
    VersionedTable.enableNdvStats(spark, root, Seq("k", "v"))
    spark.sql("ANALYZE TABLE graft.adv COMPUTE STATISTICS")
    val skew = rows("skew")
    assert(skew.length == 1 && skew.head.getString(0).contains("'k'") &&
      skew.head.getString(1).contains("salt"), s"got ${skew.toSeq}")
    // 3) STARVED CONSUMER: a floor below the earliest surviving
    //    version after a vacuum — already broken, not merely lagging
    spark.sql("ALTER TABLE graft.adv SET CONSUMER FLOOR 'tail' TO 0")
    assert(rows("starved_consumer").isEmpty,
      "floor 0 is fine while v0 survives")
    spark.sql("VACUUM graft.adv RETAIN 0 HOURS KEEP 1 VERSIONS")
    val starved = rows("starved_consumer")
    assert(starved.length == 1 &&
      starved.head.getString(0).contains("'tail'"),
      s"got ${starved.toSeq}")
    spark.sql("ALTER TABLE graft.adv SET CONSUMER FLOOR 'tail' TO " +
      VersionedTable.latestVersion(spark, root))
    assert(rows("starved_consumer").isEmpty,
      "a re-anchored floor clears the signal")
    // 4) STALE SKETCH: doctor the stored #ndv: lines to an old
    //    domain (the NdvStatsSpec recipe), carry them into a fresh
    //    manifest, and the row names the ANALYZE fix — which clears it
    val v = VersionedTable.latestVersion(spark, root)
    val mf = new java.io.File(root, s"_manifests/v$v.json")
    val doctored = new String(
      java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
      .linesIterator.map { l =>
        if (l.startsWith(NdvStats.LinePrefix))
          l.replace(s""""v":${NdvStats.DomainVersion},""", """"v":1,""")
        else l
      }.mkString("\n")
    java.nio.file.Files.write(mf.toPath, doctored.getBytes("UTF-8"))
    // drop the local FS's checksum sibling of the doctored manifest
    new java.io.File(root, s"_manifests/.v$v.json.crc").delete()
    spark.sql("INSERT INTO graft.adv VALUES (1, 990000)")
    val stale = rows("stale_sketch")
    assert(stale.nonEmpty && stale.forall(_.getString(1) ==
      "ANALYZE TABLE graft.adv COMPUTE STATISTICS"),
      s"got ${stale.toSeq}")
    spark.sql(stale.head.getString(1))
    assert(rows("stale_sketch").isEmpty, "re-ANALYZE clears it")
    spark.sql("DROP TABLE graft.adv")
  }

  test("$advice SQL round-trip contract: rows flagged executable " +
    "PARSE through the session's own parser and RUN verbatim (the " +
    "dashboard pipe `spark.sql(recommendation)`); API recipes are " +
    "flagged false so the pipe can filter on the column alone") {
    wh
    spark.sql("CREATE TABLE graft.advrt (k BIGINT, v BIGINT)")
    val root = rootOf("advrt")
    // plant one signal of each flavor: ref fragmentation (SQL), skew
    // (API recipe), starved consumer (operational instruction)
    spark.sql("INSERT INTO graft.advrt SELECT " +
      "/*+ REPARTITION_BY_RANGE(24, id) */ id % 2, id " +
      "FROM range(0, 2400)")
    spark.sql("DELETE FROM graft.advrt WHERE v = 7")
    VersionedTable.enableNdvStats(spark, root, Seq("k", "v"))
    spark.sql("ANALYZE TABLE graft.advrt COMPUTE STATISTICS")
    spark.sql("ALTER TABLE graft.advrt SET CONSUMER FLOOR 'dead' TO 0")
    spark.sql("VACUUM graft.advrt RETAIN 0 HOURS KEEP 1 VERSIONS")
    val all = spark.sql("SELECT signal, recommendation, executable " +
      "FROM graft.`advrt$advice`").collect()
    assert(all.map(_.getString(0)).toSet ==
      Set("ref_fragmentation", "skew", "starved_consumer"),
      s"got ${all.toSeq}")
    // every executable recommendation PARSES through the session's
    // own parser (extension statements included) — the contract that
    // `SELECT recommendation FROM t$advice WHERE executable` can be
    // piped back through spark.sql unconditionally
    val (sqlRows, apiRows) = all.partition(_.getBoolean(2))
    assert(sqlRows.map(_.getString(0)).toSeq == Seq("ref_fragmentation"))
    sqlRows.foreach(r =>
      spark.sessionState.sqlParser.parsePlan(r.getString(1)): Unit)
    assert(apiRows.length == 2,
      s"API recipes must be flagged false: ${apiRows.toSeq}")
    // ...and RUNS, clearing its own signal
    sqlRows.foreach(r => spark.sql(r.getString(1)): Unit)
    assert(spark.sql("SELECT * FROM graft.`advrt$advice` " +
      "WHERE executable").count() == 0,
      "running every executable recommendation must clear them")
    spark.sql("DROP TABLE graft.advrt")
  }

  test("SQL RENAME COLUMN refuses with the rewrite spelling and the " +
    "view workaround — never a silent O(table) rewrite from a " +
    "metadata-looking statement") {
    wh
    spark.sql("CREATE TABLE graft.rn_t (id BIGINT, body STRING)")
    spark.sql("INSERT INTO graft.rn_t VALUES (1, 'a')")
    val e = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE graft.rn_t RENAME COLUMN body TO text")
    }
    assert(e.getMessage.contains("renameColumn") &&
      e.getMessage.contains("O(table)") &&
      e.getMessage.contains("CREATE VIEW"),
      s"refusal must name both escape hatches, got: ${e.getMessage}")
    // the programmatic rewrite named by the message works on the same
    // table, and the catalog serves the renamed schema
    VersionedTable.renameColumn(spark, rootOf("rn_t"), "body", "text")
    assert(spark.table("graft.rn_t").schema.fieldNames.toSeq ==
      Seq("id", "text"))
  }

  test("the catalog is stateless: a table created programmatically is " +
    "immediately visible to SQL and vice versa") {
    wh
    // programmatic init under the warehouse → SQL sees it
    VersionedTable.init(spark, rootOf("t7"),
      Seq((1L, "x")).toDF("id", "s"))
    assert(spark.sql("SELECT s FROM graft.t7").as[String].collect()
      .toSeq == Seq("x"))
    // SQL insert → programmatic read sees it
    spark.sql("INSERT INTO graft.t7 VALUES (2, 'y')")
    assert(VersionedTable.read(spark, rootOf("t7")).count() == 2)
  }
}
