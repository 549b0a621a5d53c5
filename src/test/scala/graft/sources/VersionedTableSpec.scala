package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtable").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private def snapshot(rows: (Long, String)*) = rows.toDF("id", "body")

  test("init + read round-trips; versions advance monotonically") {
    val root = freshRoot()
    assert(VersionedTable.latestVersion(spark, root) == -1)
    val v0 = VersionedTable.init(spark, root, snapshot(1L -> "a", 2L -> "b"))
    assert(v0 == 0 && VersionedTable.latestVersion(spark, root) == 0)
    val got = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(1L -> "a", 2L -> "b"))
    val v1 = VersionedTable.commit(spark, root,
      snapshot(1L -> "a2", 2L -> "b"), expectedVersion = 0)
    assert(v1 == 1)
    assert(VersionedTable.read(spark, root).filter(col("id") === 1L)
      .select("body").as[String].collect().toSeq == Seq("a2"))
  }

  test("merge applies the changeset and time travel keeps old versions") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a", 2L -> "b", 3L -> "c"))
    val cs = Seq((2L, "b2", "U"), (3L, "", "D"), (9L, "i", "U"))
      .toDF("id", "body", "op")
    val v = VersionedTable.merge(spark, root, cs, "id")
    assert(v == 1)
    val now = VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(now == Seq(1L -> "a", 2L -> "b2", 9L -> "i"))
    // time travel: version 0 is intact
    val was = VersionedTable.read(spark, root, Some(0)).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(was == Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("a reader's pinned snapshot survives a concurrent merge — the atomicity raw swap lacked") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a", 2L -> "b"))
    // reader resolves BEFORE the merge...
    val pinned = VersionedTable.read(spark, root)
    val cs = Seq((1L, "a2", "U"), (2L, "", "D")).toDF("id", "body", "op")
    VersionedTable.merge(spark, root, cs, "id")
    // ...and collects AFTER it: the old version's files are untouched,
    // so the pinned plan still yields the old complete snapshot (the
    // raw-parquet rename swap would have yanked the directory away)
    val got = pinned.orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq(1L -> "a", 2L -> "b"))
    // and a fresh resolve sees the merged state
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a2"))
  }

  test("optimistic concurrency: a stale commit fails loudly and leaves no orphans") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a"))
    VersionedTable.commit(spark, root, snapshot(1L -> "win"),
      expectedVersion = 0)
    val e = intercept[IllegalStateException] {
      VersionedTable.commit(spark, root, snapshot(1L -> "lose"),
        expectedVersion = 0) // derived from v0, but v1 exists
    }
    assert(e.getMessage.contains("version conflict"))
    // the winner's state is intact and the loser's data dir is gone
    assert(VersionedTable.read(spark, root)
      .select("body").as[String].collect().toSeq == Seq("win"))
    val dataDirs = new java.io.File(root, "data").list().toSeq
    assert(dataDirs.size == 2, s"orphan commit dir left behind: $dataDirs")
  }

  test("append reuses existing data files: only the batch is written") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a", 2L -> "b"))
    val v = VersionedTable.append(spark, root, snapshot(3L -> "c"),
      expectedVersion = 0)
    assert(v == 1)
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // v0's single commit dir is REFERENCED by v1, not copied: two data
    // dirs total, and v1's manifest lists both
    assert(new java.io.File(root, "data").list().length == 2)
    // time travel still resolves the pre-append state
    assert(VersionedTable.read(spark, root, Some(0)).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"))
  }

  test("append is optimistic: a stale append fails and leaves no orphans") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a"))
    VersionedTable.append(spark, root, snapshot(2L -> "b"), 0)
    intercept[IllegalStateException](
      VersionedTable.append(spark, root, snapshot(9L -> "x"), 0))
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"))
    assert(new java.io.File(root, "data").list().length == 2)
  }

  test("append rejects a mismatched schema loudly") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a"))
    val e = intercept[IllegalArgumentException](
      VersionedTable.append(spark, root,
        Seq((2L, "b", 1.0)).toDF("id", "body", "extra"), 0))
    assert(e.getMessage.contains("schema"))
  }

  test("compact folds many appends into one commit dir; reads unchanged; history intact") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a"))
    VersionedTable.append(spark, root, snapshot(2L -> "b"), 0)
    VersionedTable.append(spark, root, snapshot(3L -> "c"), 1)
    assert(new java.io.File(root, "data").list().length == 3)
    val v = VersionedTable.compact(spark, root)
    assert(v == 3)
    // compacted snapshot reads identically...
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // ...v3's manifest references exactly ONE dir (4 dirs on disk
    // until vacuum)...
    assert(new java.io.File(root, "data").list().length == 4)
    VersionedTable.vacuum(spark, root, keepVersions = 1, retainMillis = 0L)
    assert(new java.io.File(root, "data").list().length == 1)
    // ...and the compacted version still serves after vacuum
    assert(VersionedTable.read(spark, root).count() == 3)
  }

  test("vacuum drops unreferenced commit dirs, keeps the retained window") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "v0"))
    VersionedTable.commit(spark, root, snapshot(1L -> "v1"), 0)
    VersionedTable.commit(spark, root, snapshot(1L -> "v2"), 1)
    VersionedTable.vacuum(spark, root, keepVersions = 2, retainMillis = 0L)
    // v1 and v2 readable; v0's manifest and data are gone
    assert(VersionedTable.read(spark, root, Some(2))
      .select("body").as[String].collect().toSeq == Seq("v2"))
    assert(VersionedTable.read(spark, root, Some(1))
      .select("body").as[String].collect().toSeq == Seq("v1"))
    intercept[IllegalArgumentException](
      VersionedTable.read(spark, root, Some(0)))
    assert(new java.io.File(root, "data").list().length == 2)
  }

  test("vacuum's retention horizon spares a recent unreferenced dir — the in-flight commit window") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "v0"))
    // simulate a concurrent writer mid-commit: data dir written, its
    // manifest not yet renamed into place
    val inflight = new java.io.File(new java.io.File(root, "data"),
      "c00001-inflight")
    snapshot(9L -> "pending").write.parquet(inflight.getAbsolutePath)
    VersionedTable.vacuum(spark, root, keepVersions = 1) // default horizon
    assert(inflight.exists(),
      "a dir younger than the retention horizon must survive vacuum")
    // once aged past the horizon it IS garbage and goes
    VersionedTable.vacuum(spark, root, keepVersions = 1, retainMillis = 0L)
    assert(!inflight.exists())
  }

  test("vacuum never deletes a version a pinned reader resolved within the keep window") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "v0"))
    VersionedTable.commit(spark, root, snapshot(1L -> "v1"), 0)
    // reader pins v1 (within keepVersions=2), then v2 commits and
    // vacuum runs — the pinned snapshot's files must survive because
    // v1's manifest is kept
    val pinned = VersionedTable.read(spark, root, Some(1))
    VersionedTable.commit(spark, root, snapshot(1L -> "v2"), 1)
    VersionedTable.vacuum(spark, root, keepVersions = 2, retainMillis = 0L)
    assert(pinned.select("body").as[String].collect().toSeq == Seq("v1"))
  }

  test("txn marker rides the manifest atomically and reads back per version") {
    val root = freshRoot()
    VersionedTable.init(spark, root, snapshot(1L -> "a"), txn = Some(0L))
    assert(VersionedTable.committedTxn(spark, root) == Some(0L))
    VersionedTable.append(spark, root, snapshot(2L -> "b"), 0, txn = Some(1L))
    assert(VersionedTable.committedTxn(spark, root) == Some(1L))
    assert(VersionedTable.committedTxn(spark, root, Some(0)) == Some(0L))
    // a txn-less maintenance commit clears the marker for its version
    VersionedTable.compact(spark, root)
    assert(VersionedTable.committedTxn(spark, root).isEmpty)
    // data reads are unaffected by marker lines
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a", 2L -> "b"))
  }
}
