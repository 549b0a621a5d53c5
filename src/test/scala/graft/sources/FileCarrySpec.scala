package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FILE-GRANULAR carry through the DML rewrite — the manifest
  * reference extension that closes the round-17 measured gap: an
  * affected dir splits into may-match files (rewritten) and clean
  * files (carried IN PLACE as `dir/file.parquet` manifest entries,
  * zero bytes copied — the same move on a local disk and an object
  * store, which is why no server-side-copy variant is needed).
  *
  * This spec pins the parts of the table lifecycle a file reference
  * flows through AFTER the split: the CDC diff (no phantom deletes
  * from carried rows), vacuum (parent dir survives while any file
  * ref points into it; replaced files reclaim once no kept manifest
  * references the dir wholesale), appends over a split manifest,
  * sketch-line degradation + ANALYZE healing, and SQL MERGE's
  * runtime group filter across reference granularities. */
class FileCarrySpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("fcarry").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  /** one 8-file commit, id-range-clustered so envelopes split files */
  private def manyFileTable(n: Int = 800): String = {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      spark.range(0, n).select(col("id"),
        concat(lit("s"), col("id")).as("s"))
        .repartitionByRange(8, col("id")))
    root
  }

  test("a point delete on a many-file dir carries the clean files as " +
    "refs; a second delete over the SPLIT manifest classifies per " +
    "reference and splits no further than it must") {
    val root = manyFileTable()
    val v1 = VersionedTable.delete(spark, root, col("id") === 7L)
    val refs1 = VersionedTable.readManifest(spark, root, v1)
    assert(refs1.count(VersionedTable.refIsFile) == 7,
      s"7 clean files should carry as refs, got $refs1")
    assert(VersionedTable.read(spark, root).count() == 799)
    // second delete targets a CARRIED file ref: only that ref leaves
    // the manifest; the other six file refs and the v1 rewrite dir
    // ride forward by identity
    val v2 = VersionedTable.delete(spark, root, col("id") === 300L)
    val refs2 = VersionedTable.readManifest(spark, root, v2)
    val survived = refs1.toSet intersect refs2.toSet
    assert(refs1.size - survived.size == 1,
      s"exactly one reference should rewrite: $refs1 -> $refs2")
    assert(VersionedTable.read(spark, root).count() == 798)
    assert(VersionedTable.rowCount(spark, root).contains(798L))
    // column envelopes still fold from the manifest alone
    assert(VersionedTable.columnEnvelopes(spark, root).contains("id"))
  }

  test("CDC over a split delete is EXACT: carried files' rows never " +
    "surface as phantom deletes") {
    val root = manyFileTable()
    VersionedTable.enableChangeFeed(spark, root, "id") // v1
    val v = VersionedTable.delete(spark, root,
      col("id") === 123L || col("id") === 456L) // v2, splits the dir
    assert(VersionedTable.readManifest(spark, root, v)
      .exists(VersionedTable.refIsFile), "delete should split the dir")
    // the commit-time change file serves the keyed delta — exactly
    // the two deleted rows, nothing from the carried files
    val feed = VersionedTable.changesBetween(spark, root, v - 1, v,
      key = Some("id"))
    assert(feed.select("id", "change_kind").as[(Long, String)]
      .collect().toSet == Set(123L -> "delete", 456L -> "delete"))
    // and the keyless content diff agrees
    val diff = VersionedTable.changesBetween(spark, root, v - 1, v)
    assert(diff.select("id", "change_kind").as[(Long, String)]
      .collect().toSet == Set(123L -> "delete", 456L -> "delete"))
  }

  test("vacuum keeps a dir alive while ANY file ref points into it, " +
    "and reclaims the replaced files once no kept manifest " +
    "references the dir wholesale") {
    val root = manyFileTable()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
    val origDir = VersionedTable.readManifest(spark, root, 0).head
    val origFiles = fs.listStatus(
      new org.apache.hadoop.fs.Path(dataRoot, origDir))
      .map(_.getPath.getName).count(_.endsWith(".parquet"))
    val v = VersionedTable.delete(spark, root, col("id") === 7L)
    val carried = VersionedTable.readManifest(spark, root, v)
      .filter(VersionedTable.refIsFile)
    assert(carried.nonEmpty)
    // DRY RUN first: the preview must show the file-level sweep the
    // destructive vacuum will perform (shared candidate selection —
    // the two can never drift), scoped "files" because the dir
    // itself survives its carried refs
    val pv = VersionedTable.vacuumPreview(spark, root,
      keepVersions = 1, retainMillis = 0L).collect()
    val sweepRow = pv.find(r => r.getString(3) == "files" &&
      r.getString(0) == origDir)
    assert(sweepRow.exists(_.getLong(1) ==
      (origFiles - carried.size).toLong),
      s"preview must list the sweepable replaced files, got " +
        s"${pv.toSeq}")
    // the RETENTION SCHEDULE models the sweep too: its k=1 row's
    // bytes must equal the preview's total (dir rows + files rows) —
    // a dir-granular schedule would understate reclaim here
    val schedK1 = VersionedTable.retentionSchedule(spark, root)
      .filter(col("keep_versions") === 1).head
    assert(schedK1.getLong(5) == pv.map(_.getLong(2)).sum,
      s"schedule k=1 bytes ${schedK1.getLong(5)} must equal the " +
        s"preview total ${pv.map(_.getLong(2)).sum}")
    assert(schedK1.getLong(3) == 0L,
      "no whole dir drops at k=1 — the split dir survives its refs")
    // keepVersions = 1 drops v0 (the only wholesale reference);
    // retainMillis = 0 is the single-writer test spelling
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      retainMillis = 0L)
    // the split dir SURVIVES (file refs keep it alive) but holds
    // exactly the carried files now — the replaced ones are swept
    val left = fs.listStatus(
      new org.apache.hadoop.fs.Path(dataRoot, origDir))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    assert(left == carried.map(r =>
      r.substring(r.indexOf('/') + 1)).toSet,
      s"expected exactly the carried files to survive, got $left")
    assert(left.size < origFiles)
    // the live snapshot still answers exactly
    assert(VersionedTable.read(spark, root).count() == 799)
    assert(VersionedTable.readWhere(spark, root, col("id") === 7L)
      .count() == 0)
    assert(VersionedTable.readWhere(spark, root, col("id") === 8L)
      .count() == 1)
  }

  test("the file sweep's retention grace keys on the REPLACING " +
    "commit's timestamp, not the replaced files' own mtimes: a " +
    "recent split protects its old files for retainMillis") {
    val root = manyFileTable()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
    val origDir = VersionedTable.readManifest(spark, root, 0).head
    VersionedTable.delete(spark, root, col("id") === 7L) // splits NOW
    // age the dir's FILES two hours into the past — the real-world
    // shape: data written long ago, replaced by a point-DML just now
    val old = System.currentTimeMillis() - 2 * 3600L * 1000L
    fs.listStatus(new org.apache.hadoop.fs.Path(dataRoot, origDir))
      .foreach(st => fs.setTimes(st.getPath, old, -1))
    val before = fs.listStatus(
      new org.apache.hadoop.fs.Path(dataRoot, origDir))
      .map(_.getPath.getName).count(_.endsWith(".parquet"))
    // an mtime-keyed sweep would reclaim the replaced files HERE —
    // zero grace for an in-flight reader of the second-old v0 — but
    // the split itself is seconds old, so the hour horizon protects
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      retainMillis = 3600L * 1000L)
    val after = fs.listStatus(
      new org.apache.hadoop.fs.Path(dataRoot, origDir))
      .map(_.getPath.getName).count(_.endsWith(".parquet"))
    assert(after == before,
      s"a replacement younger than retainMillis must not sweep " +
        s"($before -> $after files)")
    // and the preview agrees: no "files"-scope row inside the window
    val pv = VersionedTable.vacuumPreview(spark, root,
      keepVersions = 1, retainMillis = 3600L * 1000L).collect()
    assert(!pv.exists(_.getString(3) == "files"), s"got ${pv.toSeq}")
    // outside the window the sweep proceeds as before
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      retainMillis = 0L)
    val swept = fs.listStatus(
      new org.apache.hadoop.fs.Path(dataRoot, origDir))
      .map(_.getPath.getName).count(_.endsWith(".parquet"))
    assert(swept < before, "retainMillis = 0 sweeps the replaced files")
    assert(VersionedTable.read(spark, root).count() == 799)
  }

  test("appends over a split manifest carry file refs verbatim; " +
    "NDV stays MAINTAINED through the split (per-file-ref sketch " +
    "lines replace the dropped dir line) and ANALYZE re-folds them " +
    "into dir lines") {
    val root = manyFileTable()
    VersionedTable.enableNdvStats(spark, root, Seq("id")) // v1
    val before = VersionedTable.tableNdv(spark, root)("id")
    assert(math.abs(before - 800L) <= 24,
      s"pre-split NDV should be ~800, got $before")
    val v = VersionedTable.delete(spark, root, col("id") === 7L) // v2
    assert(VersionedTable.readManifest(spark, root, v)
      .exists(VersionedTable.refIsFile))
    // the split dir's OLD sketch line must not carry (it still
    // counts the deleted row) — but the estimate must not go dark
    // either: the commit re-sketched the carried files per ref, so
    // the union stays current (NDV maintenance survives DML)
    val split = VersionedTable.tableNdv(spark, root)
    assert(split.get("id").exists(n => math.abs(n - 799L) <= 24),
      s"the split commit must keep the estimate maintained, got $split")
    // a SECOND delete hitting a carried ref costs no re-sketch: the
    // ref's own line just leaves the manifest with it
    val v3 = VersionedTable.delete(spark, root, col("id") === 300L)
    val after2 = VersionedTable.tableNdv(spark, root)
    assert(after2.get("id").exists(n => math.abs(n - 798L) <= 24),
      s"ref-keyed lines must keep serving after later drops, got $after2")
    // an append over the split manifest: refs ride forward verbatim
    val v4 = VersionedTable.append(spark, root,
      spark.range(800, 900).select(col("id"),
        concat(lit("s"), col("id")).as("s")), expectedVersion = v3)
    val refs4 = VersionedTable.readManifest(spark, root, v4)
    assert(VersionedTable.readManifest(spark, root, v3)
      .forall(refs4.contains), "append must carry every ref verbatim")
    assert(VersionedTable.read(spark, root).count() == 898)
    // ANALYZE heals: the FUSED repin (groupedPass) re-sketches per
    // physical dir over exactly the LIVE subset the file refs select
    VersionedTable.repinStats(spark, root, Seq("id"))
    val healed = VersionedTable.tableNdv(spark, root)("id")
    assert(math.abs(healed - 898L) <= 27,
      s"post-ANALYZE NDV should be ~898, got $healed")
    // and the NEXT append carries the healed line (the dir's live
    // file set is intact), so the estimate stays resolvable
    val v5 = VersionedTable.append(spark, root,
      spark.range(900, 950).select(col("id"),
        concat(lit("s"), col("id")).as("s")),
      expectedVersion = VersionedTable.latestVersion(spark, root))
    val after = VersionedTable.tableNdv(spark, root, Some(v5))
    assert(after.contains("id") && math.abs(after("id") - 948L) <= 29,
      s"healed sketch lines must carry through appends, got $after")
  }

  test("SQL MERGE over a table whose manifest already holds file " +
    "refs: the runtime group filter bridges reference granularities " +
    "and the statement stays exact") {
    val wh = java.nio.file.Files.createTempDirectory("fcarry_wh")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graftfc",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftfc.warehouse",
      wh.toString)
    spark.conf.set(GraftCatalog.MergeRuntimeFilterMinRows, "0")
    try {
      spark.sql("CREATE TABLE graftfc.m1 (id BIGINT, s STRING)")
      spark.sql("INSERT INTO graftfc.m1 SELECT id, concat('s', id) " +
        "FROM range(0, 400)")
      val root = new java.io.File(wh.toFile, "m1").getAbsolutePath
      // split the manifest via a programmatic point delete
      val v = VersionedTable.delete(spark, root, col("id") === 50L)
      assert(VersionedTable.readManifest(spark, root, v)
        .exists(VersionedTable.refIsFile), "precondition: split")
      spark.sql("""MERGE INTO graftfc.m1 t
        |USING (SELECT 60 AS id, 'u' AS s UNION ALL
        |       SELECT 999 AS id, 'new' AS s) src
        |ON t.id = src.id
        |WHEN MATCHED THEN UPDATE SET t.s = src.s
        |WHEN NOT MATCHED THEN INSERT (id, s) VALUES (src.id, src.s)
        |""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM graftfc.m1")
        .as[Long].head == 400L) // 399 + 1 insert
      assert(spark.sql("SELECT s FROM graftfc.m1 WHERE id = 60")
        .as[String].head == "u")
      assert(spark.sql("SELECT s FROM graftfc.m1 WHERE id = 999")
        .as[String].head == "new")
      assert(spark.sql("SELECT s FROM graftfc.m1 WHERE id = 10")
        .as[String].head == "s10")
      assert(spark.sql("SELECT count(*) FROM graftfc.m1 WHERE id = 50")
        .as[Long].head == 0L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graftfc.m1")
      spark.conf.unset("spark.sql.catalog.graftfc")
      spark.conf.unset("spark.sql.catalog.graftfc.warehouse")
    }
  }

  test("compactRefs heals ref fragmentation at O(fragmented refs): " +
    "file refs fold into one fresh dir, whole dirs carry by " +
    "identity, CDC serves the fold as an empty delta, and vacuum " +
    "can then drop the old dir wholesale") {
    val root = manyFileTable()
    VersionedTable.enableChangeFeed(spark, root, "id") // v1
    VersionedTable.append(spark, root,
      spark.range(800, 900).select(col("id"),
        concat(lit("s"), col("id")).as("s")), 1) // v2: a second dir
    val v3 = VersionedTable.delete(spark, root, col("id") === 7L)
    val refs3 = VersionedTable.readManifest(spark, root, v3)
    val wholeBefore = refs3.filterNot(VersionedTable.refIsFile).toSet
    assert(refs3.exists(VersionedTable.refIsFile))
    val v4 = VersionedTable.compactRefs(spark, root)
    val refs4 = VersionedTable.readManifest(spark, root, v4)
    assert(!refs4.exists(VersionedTable.refIsFile),
      s"compactRefs must fold every file ref, got $refs4")
    // whole dirs ride by identity; exactly one fresh dir appears
    assert(wholeBefore.subsetOf(refs4.toSet))
    assert((refs4.toSet -- wholeBefore).size == 1)
    // data-equivalent: content identical, CDC delta empty
    assert(VersionedTable.read(spark, root).count() == 899)
    assert(VersionedTable.changesBetween(spark, root, v3, v4,
      key = Some("id")).count() == 0,
      "a maintenance fold must serve an EMPTY change feed")
    // a second compactRefs is a no-op (nothing fragmented)
    assert(VersionedTable.compactRefs(spark, root) == v4)
    // vacuum now reclaims the formerly-split dir WHOLESALE: no kept
    // manifest references it at any granularity
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val splitDir = VersionedTable.readManifest(spark, root, 0).head
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      retainMillis = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(root, "data"), splitDir)),
      "after the fold ages out, the fragmented dir drops entirely")
    assert(VersionedTable.read(spark, root).count() == 899)
  }

  test("the ref-fragmentation advisor recommends a fold once " +
    "point-DML history dominates the manifest, and goes quiet " +
    "after OPTIMIZE REFS") {
    import graft.ops.RefAdvisor
    val root = freshRoot()
    VersionedTable.init(spark, root,
      spark.range(0, 2400).select(col("id"),
        concat(lit("s"), col("id")).as("s"))
        .repartitionByRange(24, col("id")))
    // fresh table: nothing to fold, and the advisor says so
    val a0 = RefAdvisor.advise(spark, root)
    assert(!a0.recommend && a0.frag.fileRefs == 0 &&
      a0.frag.foldRows.contains(0L), s"got $a0")
    // one point delete splits the 24-file dir: ~23 carried refs —
    // above the 16-ref floor AND the refs + their carried #file:
    // lines dominate the manifest
    val v1 = VersionedTable.delete(spark, root, col("id") === 7L)
    val a1 = RefAdvisor.advise(spark, root)
    assert(a1.frag.fileRefs >= RefAdvisor.DefaultMinRefs,
      s"the split should carry >= 16 refs, got ${a1.frag}")
    assert(a1.overheadShare >= RefAdvisor.DefaultShareThreshold &&
      a1.recommend, s"got $a1")
    // fold cost is MEASURED from the carried #file: lines, never
    // guessed: exactly the carried rows (= the live snapshot minus
    // whatever lives in the rewrite dirs)
    val rewrittenRows = VersionedTable.readManifest(spark, root, v1)
      .filterNot(VersionedTable.refIsFile)
      .map(d => spark.read.parquet(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "data"), d).toString)
        .count()).sum
    assert(a1.frag.foldRows.contains(
      VersionedTable.read(spark, root).count() - rewrittenRows),
      s"foldRows must equal the carried rows, got ${a1.frag}")
    // the fold heals it: refs gone, advisor quiet, answers unchanged
    val folded = VersionedTable.compactRefs(spark, root)
    assert(folded == v1 + 1)
    val a2 = RefAdvisor.advise(spark, root)
    assert(!a2.recommend && a2.frag.fileRefs == 0,
      s"after the fold the advisor must go quiet, got $a2")
    assert(VersionedTable.read(spark, root).count() == 2399)
    // pure-threshold checks (the SkewAdvisor.saltFor analog): the
    // floor refuses small histories, the share guard refuses
    // ref-light manifests, both name their reason
    val few = VersionedTable.RefFragmentation(3, 1, 5, 3, 0, 20,
      Some(300L))
    assert(!RefAdvisor.adviseFrom(few).recommend &&
      RefAdvisor.adviseFrom(few).basis.contains("floor"))
    val light = VersionedTable.RefFragmentation(20, 2, 100, 20, 0,
      400, Some(2000L))
    assert(!RefAdvisor.adviseFrom(light).recommend &&
      RefAdvisor.adviseFrom(light).basis.contains("share"))
    val heavy = VersionedTable.RefFragmentation(20, 2, 3, 20, 10, 60,
      None)
    val ah = RefAdvisor.adviseFrom(heavy)
    assert(ah.recommend && ah.frag.foldRows.isEmpty,
      "uncovered refs: recommend on the share, refuse the cost " +
        s"estimate — got $ah")
  }

  test("the #clusterby: pin keeps envelopes tight through appends " +
    "AND the DML rewrite: point-DML no longer de-clusters a " +
    "clustered table, and a point lookup keeps pruning to ~1 file " +
    "per dir after the churn") {
    val root = freshRoot()
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"), concat(lit("s"), col("id")).as("s"))
      .repartition(4) // deliberately UNclustered input
    VersionedTable.init(spark, root,
      batch(0, 800).repartitionByRange(8, col("id")))
    VersionedTable.enableClustering(spark, root, Seq("id")) // v1
    // an append of an unclustered batch: the pin range-shuffles it,
    // so the new dir's files carry tight id envelopes
    val v2 = VersionedTable.append(spark, root, batch(800, 1200), 1)
    def mayMatchFiles(idVal: Long): Int = {
      val schema = VersionedTable.read(spark, root).schema
      val pred = VersionedTable.resolveCondition(spark, schema,
        col("id") === idVal).get
      val (_, pruned, covered) = VersionedTable.prunedPaths(
        spark, root, pred)
      covered - pruned
    }
    assert(mayMatchFiles(1000) <= 2,
      "an appended batch must land range-clustered under the pin")
    // a point delete: the rewrite output re-clusters, so lookups
    // NEAR the deleted key still prune after the churn
    VersionedTable.delete(spark, root, col("id") === 400L)
    assert(VersionedTable.read(spark, root).count() == 1199)
    assert(mayMatchFiles(401) <= 2,
      "the DML rewrite must not de-cluster the table")
    // maintenance folds consult the pin too
    VersionedTable.compactRefs(spark, root)
    assert(mayMatchFiles(401) <= 2)
    assert(VersionedTable.read(spark, root).count() == 1199)
    // mutual exclusion with bucketing, both directions
    assert(intercept[IllegalArgumentException] {
      VersionedTable.enableBucketing(spark, root, "id", 4)
    }.getMessage.contains("disableClustering"))
    VersionedTable.disableClustering(spark, root)
    assert(VersionedTable.clusterSpec(spark, root).isEmpty)
    val root2 = freshRoot()
    VersionedTable.init(spark, root2, batch(0, 100))
    VersionedTable.enableBucketing(spark, root2, "id", 4)
    assert(intercept[IllegalArgumentException] {
      VersionedTable.enableClustering(spark, root2, Seq("id"))
    }.getMessage.contains("disableBucketing"))
    // schema-evolution edge: a commit lacking the pinned column
    // still succeeds (layout hint skipped, never a failed commit)
    val root3 = freshRoot()
    VersionedTable.init(spark, root3, batch(0, 100))
    VersionedTable.enableClustering(spark, root3, Seq("id"))
    VersionedTable.commit(spark, root3,
      VersionedTable.read(spark, root3).drop("id"),
      expectedVersion = VersionedTable.latestVersion(spark, root3))
    assert(VersionedTable.read(spark, root3).columns.toSeq == Seq("s"))
  }

  test("maintenance folds are retry-safe under concurrent ingest: " +
    "compactRefs racing appendRetrying converges with neither lost") {
    val root = manyFileTable()
    VersionedTable.delete(spark, root, col("id") === 7L) // fragment it
    assert(VersionedTable.readManifest(spark, root,
      VersionedTable.latestVersion(spark, root))
      .exists(VersionedTable.refIsFile))
    // an ingest writer appending batches while the fold runs: both
    // sides are optimistic retries, so EVERY interleaving converges —
    // the fold re-derives from whichever head it lost to
    val appender = new Thread(() => (0 until 5).foreach { i =>
      VersionedTable.appendRetrying(spark, root,
        spark.range(1000 + i * 10, 1010 + i * 10)
          .select(col("id"), concat(lit("s"), col("id")).as("s")))
      Thread.sleep(30)
    })
    appender.start()
    val folded = VersionedTable.compactRefs(spark, root)
    appender.join()
    assert(folded > 0, "the fold must commit despite the race")
    // neither side lost: the delete's complement plus every appended
    // batch, exactly once
    assert(VersionedTable.read(spark, root).count() == 799L + 50L)
    // the fold's own manifest holds no file refs; appends that landed
    // AFTER it add whole dirs, so the head is ref-free either way
    assert(!VersionedTable.readManifest(spark, root,
      VersionedTable.latestVersion(spark, root))
      .exists(VersionedTable.refIsFile))
    // and a second fold is a clean no-op
    assert(VersionedTable.compactRefs(spark, root) ==
      VersionedTable.latestVersion(spark, root))
  }

  test("DML vs DML: two snapshot-derived writers racing the same " +
    "head (DELETE vs MERGE on overlapping dirs) — exactly one wins, " +
    "the loser surfaces the version-conflict error (never a silent " +
    "lost update), and the table equals the winner's serial result") {
    // both writers snapshot the same base, rewrite, and try to
    // commit base+1; the manifest rename is the commit point, so
    // one MUST lose. A latch lines up the snapshot reads; in the
    // (timing-dependent) case where one writer finishes before the
    // other even snapshots, the run is SERIAL — legal, but not the
    // interleaving under test — so retry on a fresh table.
    def raceOnce(): Option[(String, Throwable, String)] = {
      val root = manyFileTable(200)
      val start = new java.util.concurrent.CountDownLatch(2)
      val results = new java.util.concurrent.ConcurrentHashMap[
        String, Either[Throwable, Int]]()
      def runner(name: String)(body: => Int) = new Thread(() => {
        start.countDown(); start.await()
        try results.put(name, Right(body)): Unit
        catch { case t: Throwable => results.put(name, Left(t)): Unit }
      })
      val del = runner("delete") {
        VersionedTable.delete(spark, root, col("id") % 10 === 3L)
      }
      val mrg = runner("merge") {
        VersionedTable.merge(spark, root,
          Seq((3L, "m3", "U"), (1000L, "new", "U"))
            .toDF("id", "s", "op"), "id")
      }
      del.start(); mrg.start(); del.join(); mrg.join()
      val losers = results.entrySet().toArray.toSeq
        .map(_.asInstanceOf[java.util.Map.Entry[
          String, Either[Throwable, Int]]])
        .collect { case e if e.getValue.isLeft =>
          e.getKey -> e.getValue.left.toOption.get }
      losers match {
        case Seq((loser, err)) => Some((loser, err, root))
        case Seq() => None // serial interleaving: retry
        case both => fail(s"both writers failed: $both")
      }
    }
    val (loser, err, root) = (1 to 10).iterator.map(_ => raceOnce())
      .collectFirst { case Some(r) => r }
      .getOrElse(fail("no conflicting interleaving in 10 attempts"))
    // the loser's failure is the TYPED conflict with the retry
    // recipe, not a raw FS error or a silent no-op
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(err).exists(_.isInstanceOf[VersionConflictException]),
      s"loser must surface VersionConflictException, got: " +
        chain(err).map(_.getClass.getSimpleName).mkString(" <- "))
    // the table equals the WINNER's serial result exactly
    val got = VersionedTable.read(spark, root)
      .select("id", "s").as[(Long, String)].collect().toMap
    if (loser == "merge") {
      assert(got.size == 180 && !got.keySet.exists(_ % 10 == 3),
        s"delete won: its serial result must stand (${got.size})")
      assert(!got.contains(1000L),
        "no row of the losing merge may leak")
    } else {
      assert(got.size == 201 && got(3L) == "m3" &&
        got(1000L) == "new" && got(13L) == "s13",
        s"merge won: its serial result must stand (${got.size})")
    }
    // the loser's orphaned commit dir was cleaned up: everything
    // under data/ is referenced by some surviving manifest
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "data"))
      .map(_.getPath.getName).toSet
    val referenced = (0 to VersionedTable.latestVersion(spark, root))
      .flatMap(v => VersionedTable.readManifest(spark, root, v))
      .map(_.takeWhile(_ != '/')).toSet
    assert(onDisk.subsetOf(referenced),
      s"orphaned loser dirs must be removed: ${onDisk -- referenced}")
  }

  test("restore across a split is metadata-only and exact both ways") {
    val root = manyFileTable()
    val v = VersionedTable.delete(spark, root, col("id") === 7L)
    assert(VersionedTable.readManifest(spark, root, v)
      .exists(VersionedTable.refIsFile))
    // back to the pre-split snapshot: whole-dir reference restored
    val r1 = VersionedTable.restore(spark, root, 0)
    assert(VersionedTable.read(spark, root, Some(r1)).count() == 800)
    // forward again to the split snapshot: file refs re-referenced
    val r2 = VersionedTable.restore(spark, root, v)
    assert(VersionedTable.read(spark, root, Some(r2)).count() == 799)
    assert(VersionedTable.readManifest(spark, root, r2).toSet ==
      VersionedTable.readManifest(spark, root, v).toSet)
  }
}
