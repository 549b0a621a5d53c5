package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row-level DML on the versioned table: copy-on-write DELETE/UPDATE
  * with manifest-stats dir pruning, and metadata-only RESTORE. The
  * claims that matter at 100 TB — "untouched dirs are not rewritten",
  * "restore moves no data" — are asserted on the MANIFESTS (dir
  * identity across versions), not timings. */
class VersionedDmlSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vdml").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private def dirNames(root: String, v: Int): Set[String] =
    VersionedTable.dataDirs(spark, root, Some(v))
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet

  /** three appends, each range-clustered so its files' doc-id
    * envelopes are disjoint across dirs: [0,100), [100,200), [200,300) */
  private def rangedTable(): String = {
    val root = freshRoot()
    def batch(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, s"body-$i", i % 5)).toDF("id", "body", "grp")
      .repartitionByRange(2, col("id"))
    VersionedTable.init(spark, root, batch(0, 100))
    VersionedTable.append(spark, root, batch(100, 200), expectedVersion = 0)
    VersionedTable.append(spark, root, batch(200, 300), expectedVersion = 1)
    root
  }

  test("delete removes TRUE rows, keeps NULL-predicate rows, " +
    "and old versions time-travel unchanged") {
    val root = freshRoot()
    val base = Seq((1L, Some(10)), (2L, None), (3L, Some(30)))
      .toDF("id", "v")
    VersionedTable.init(spark, root, base)
    // v > 15 is NULL for id=2 — SQL DELETE keeps it
    val committed = VersionedTable.delete(spark, root, col("v") > 15)
    assert(committed == 1)
    val now = VersionedTable.read(spark, root).orderBy("id")
      .select("id").as[Long].collect().toSeq
    assert(now == Seq(1L, 2L))
    assert(VersionedTable.read(spark, root, Some(0)).count() == 3)
    assert(VersionedTable.commitOp(spark, root, 1).contains("delete"))
  }

  test("delete rewrites ONLY may-match dirs: untouched dirs and their " +
    "stats carry forward verbatim") {
    val root = rangedTable()
    val before = dirNames(root, 2)
    assert(before.size == 3)
    val v = VersionedTable.delete(spark, root,
      col("id").between(120, 180)) // inside the second append only
    assert(v == 3)
    val after = dirNames(root, 3)
    // the two unaffected appends' dirs survive BY IDENTITY; the
    // affected dir is replaced by one fresh rewrite dir
    assert((before intersect after).size == 2)
    assert((after -- before).size == 1)
    // carried dirs keep skipping coverage: every surviving dir has stats
    val byDir = VersionedTable.statsByDir(spark, root, Some(3))
    assert(after.forall(byDir.contains))
    // and the data is right
    val ids = VersionedTable.read(spark, root).select("id")
      .as[Long].collect().toSet
    assert(ids == (0 until 300).map(_.toLong).toSet
      .diff((120 to 180).map(_.toLong).toSet))
  }

  test("delete with a provably-unmatchable predicate is a true no-op: " +
    "no new version") {
    val root = rangedTable()
    val v = VersionedTable.delete(spark, root, col("id") > 100000L)
    assert(v == 2)
    assert(VersionedTable.latestVersion(spark, root) == 2)
  }

  test("update assigns only matching rows, reads pre-update values, " +
    "casts to the column type, and refuses unknown columns") {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "s", "n"))
    VersionedTable.update(spark, root, col("n") >= 20,
      Seq("s" -> lit("X"), "n" -> (col("n") + lit(0.9)))) // 0.9 truncates: int column
    val got = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "a", 10), (2L, "X", 20), (3L, "X", 30)))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.update(spark, root, col("n") > 0,
        Seq("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("unknown column"))
    assert(VersionedTable.commitOp(spark, root, 1).contains("update"))
  }

  test("update assignment casts are ANSI: an overflowing coercion fails " +
    "the statement instead of silently wrapping, and the table is " +
    "unchanged") {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      Seq((1L, 10), (2L, 20)).toDF("id", "n")) // n: INT column
    // 10^10 does not fit an int — pre-fix this wrapped to garbage and
    // committed; under ANSI eval it throws and nothing is published
    val e = intercept[Exception] {
      VersionedTable.update(spark, root, col("id") === 2L,
        Seq("n" -> lit(10000000000L)))
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(m =>
        m.toLowerCase.contains("overflow") || m.contains("CAST_"))))
    assert(VersionedTable.latestVersion(spark, root) == 0)
    val got = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 10), (2L, 20)))
  }

  test("update rewrites only may-match dirs like delete") {
    val root = rangedTable()
    val before = dirNames(root, 2)
    VersionedTable.update(spark, root, col("id").between(210, 250),
      Seq("body" -> lit("redacted")))
    val after = dirNames(root, 3)
    assert((before intersect after).size == 2)
    val redacted = VersionedTable.read(spark, root)
      .filter(col("body") === "redacted").select("id").as[Long]
      .collect().toSet
    assert(redacted == (210 to 250).map(_.toLong).toSet)
  }

  test("keyed change feed across an update pairs pre/post images") {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    VersionedTable.update(spark, root, col("id") === 2L,
      Seq("s" -> lit("b2")))
    val feed = VersionedTable.changesBetween(spark, root, 0, 1,
      key = Some("id")).orderBy("change_kind")
      .as[(Long, String, String)].collect().toSeq
    assert(feed == Seq((2L, "b2", "update_postimage"),
      (2L, "b", "update_preimage")))
  }

  test("restore is metadata-only roll-forward: same dirs by identity, " +
    "no data written, content equals the target version") {
    val root = rangedTable()
    val dirsV2 = dirNames(root, 2)
    VersionedTable.delete(spark, root, col("id") < 150) // v3, the mistake
    assert(VersionedTable.read(spark, root).count() == 150)
    val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
    val fs = dataRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirCountBefore = fs.listStatus(dataRoot).length
    val v = VersionedTable.restore(spark, root, 2)
    assert(v == 4)
    // no new data dir: the restore re-references v2's immutable files
    assert(fs.listStatus(dataRoot).length == dirCountBefore)
    assert(dirNames(root, 4) == dirsV2)
    assert(VersionedTable.read(spark, root).count() == 300)
    // stats carried: skipping still covers every dir after restore
    assert(dirsV2.forall(
      VersionedTable.statsByDir(spark, root, Some(4)).contains))
    assert(VersionedTable.commitOp(spark, root, 4).contains("restore"))
    // the mistake stays in history (roll-forward, not erasure)
    assert(VersionedTable.read(spark, root, Some(3)).count() == 150)
    // content diff across the restore is exactly the deleted rows back
    val feed = VersionedTable.changesBetween(spark, root, 3, 4)
    assert(feed.filter(col("change_kind") === "insert").count() == 150)
  }

  test("a reader's pinned snapshot survives a concurrent delete, and " +
    "vacuum after DML drops only what no kept manifest references") {
    val root = rangedTable()
    val pinned = VersionedTable.read(spark, root, Some(2)) // pre-DML
    VersionedTable.delete(spark, root, col("id") < 100) // v3 rewrites dir 1
    // the pinned frame resolved an explicit immutable file list — the
    // DML commit never touches it
    assert(pinned.count() == 300)
    assert(VersionedTable.read(spark, root).count() == 200)
    // retention: keep only the live version; the rewritten dir's OLD
    // copy ages out, the two carried dirs survive (still referenced)
    VersionedTable.vacuum(spark, root, keepVersions = 1, retainMillis = 0)
    assert(VersionedTable.read(spark, root).count() == 200)
    // v2 is gone with its manifest — pinning it now fails loudly
    intercept[Exception] {
      VersionedTable.read(spark, root, Some(2)).count()
    }
  }

  test("DML on a schema-evolved table: the #schema pin carries through " +
    "the partial rewrite, old files still read NULL for evolved columns") {
    val root = freshRoot()
    VersionedTable.init(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    VersionedTable.append(spark, root,
      Seq((3L, "c", Some(30))).toDF("id", "s", "n"),
      expectedVersion = 0, evolveSchema = true)
    VersionedTable.update(spark, root, col("id") === 1L,
      Seq("s" -> lit("a2")))
    val got = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String, Option[Int])].collect().toSeq
    assert(got == Seq((1L, "a2", None), (2L, "b", None), (3L, "c", Some(30))))
    // the pin survived the DML commit: the snapshot still reads under
    // the evolved schema even though dir 1's files predate column n
    assert(VersionedTable.manifestSchema(spark, root,
      VersionedTable.latestVersion(spark, root)).isDefined)
    // delete the evolved row; the pre-evolution rows keep reading
    VersionedTable.delete(spark, root, col("n") === 30)
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("delete without any stats coverage still deletes correctly " +
    "(conservative full rewrite)") {
    val root = freshRoot()
    VersionedTable.init(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    // strip the #file: lines from the manifest to simulate a
    // pre-stats-era table
    val mpath = new org.apache.hadoop.fs.Path(root, "_manifests/v0.json")
    val fs = mpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = {
      val in = fs.open(mpath)
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    }
    fs.delete(mpath, false)
    val out = fs.create(mpath, true)
    try out.write(body.linesIterator.filterNot(_.startsWith("#file:"))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    VersionedTable.delete(spark, root, col("id") === 1L)
    assert(VersionedTable.read(spark, root).select("id").as[Long]
      .collect().toSeq == Seq(2L))
  }
}
