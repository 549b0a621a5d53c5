package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Change-data-feed + OPTIMIZE contracts for the versioned table.
  * The gate row (pipeline_versioned_changes) hash-checks the general
  * content-diff path against DuckDB; this spec asserts what SQL
  * cannot: the append fast path's I/O shape (O(delta), zero
  * shuffles), the empty feed across data-equivalent rewrites
  * (compact/optimize), multiset multiplicity, and optimize's
  * clustering effect on file min/max envelopes.
  */
class CdfSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_cdf").resolve("tbl").toString

  private def docs(ids: (Long, String)*) = ids.toSeq.toDF("id", "text")

  test("append chain takes the fast path: inserts only, O(delta) read, no shuffle") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 0)
    VersionedTable.append(spark, root, docs(4L -> "d", 5L -> "e"),
      expectedVersion = 1)
    val feed = VersionedTable.changesBetween(spark, root, 0, 2)
    // exactly the two appended batches, all inserts
    val rows = feed.collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(rows == Set(3L -> "insert", 4L -> "insert", 5L -> "insert"))
    // the I/O-shape claim: the plan is a bare scan of the added commit
    // dirs — no Exchange (no shuffle), no join, no aggregate
    val plan = feed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fast path must not shuffle:\n$plan")
    assert(!plan.contains("Aggregate"), s"fast path must not aggregate:\n$plan")
    // and it reads ONLY the delta dirs: v0's commit dir is absent
    val v0Dir = VersionedTable.dataDirs(spark, root, Some(0)).head
    assert(!feed.inputFiles.exists(_.startsWith("file:" + v0Dir)),
      "fast path read the base snapshot — cost would be O(table), not O(delta)")
  }

  test("merge produces delete+insert pairs; multiset multiplicity is exact") {
    val root = freshRoot()
    // duplicate row ("dup") on purpose: multiset semantics
    VersionedTable.init(spark, root,
      docs(1L -> "keep", 2L -> "old", 3L -> "gone", 4L -> "dup", 4L -> "dup"))
    val changeset = docs(2L -> "new", 3L -> "x", 9L -> "fresh", 4L -> "dup2")
      .withColumn("op", when(col("id") === 3L, "D").otherwise("U"))
    VersionedTable.merge(spark, root, changeset, "id")
    val feed = VersionedTable.changesBetween(spark, root, 0, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(feed == Map(
      (2L, "old", "delete") -> 1, (2L, "new", "insert") -> 1,
      (3L, "gone", "delete") -> 1,
      (9L, "fresh", "insert") -> 1,
      // merge's 'U' on id=4 replaces BOTH duplicate rows with one new
      // row: the feed must carry the delete TWICE (multiset, not set)
      (4L, "dup", "delete") -> 2,
      (4L, "dup2", "insert") -> 1), s"feed was $feed")
  }

  test("keyed feed pairs updates as preimage/postimage; keyless emits " +
      "delete+insert for the same history") {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      docs(1L -> "keep", 2L -> "old", 3L -> "gone"))
    val changeset = docs(2L -> "new", 4L -> "fresh")
      .withColumn("op", lit("U"))
      .unionByName(docs(3L -> "x").withColumn("op", lit("D")))
    VersionedTable.merge(spark, root, changeset, "id")
    // keyed: the update on id=2 is a PAIRED pre/post image; unchanged
    // id=1 emits nothing
    val keyed = VersionedTable.changesBetween(spark, root, 0, 1,
        key = Some("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(keyed == Set(
      (2L, "old", "update_preimage"), (2L, "new", "update_postimage"),
      (3L, "gone", "delete"), (4L, "fresh", "insert")), s"keyed was $keyed")
    // keyless over the SAME history: the update surfaces as
    // delete+insert (no row identity to pair on)
    val keyless = VersionedTable.changesBetween(spark, root, 0, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(keyless == Set(
      (2L, "old", "delete"), (2L, "new", "insert"),
      (3L, "gone", "delete"), (4L, "fresh", "insert")), s"keyless was $keyless")
    // column order matches the table schema + trailing change_kind
    assert(VersionedTable.changesBetween(spark, root, 0, 1, Some("id"))
      .columns.toSeq == Seq("id", "text", "change_kind"))
  }

  test("keyed feed: NULL transitions count as updates (null-safe compare), " +
      "and the keyed plan is one join") {
    val root = freshRoot()
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("b")))
      .toDF("id", "text")
    VersionedTable.init(spark, root, withNull)
    VersionedTable.merge(spark, root,
      Seq((1L, Some("now-set")), (2L, Option.empty[String]))
        .toDF("id", "text").withColumn("op", lit("U")), "id")
    val feed = VersionedTable.changesBetween(spark, root, 0, 1, Some("id"))
    val rows = feed.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(rows == Set(
      (1L, None, "update_preimage"), (1L, Some("now-set"), "update_postimage"),
      (2L, Some("b"), "update_preimage"), (2L, None, "update_postimage")),
      s"feed was $rows")
    // plan shape: exactly one join (the full-outer on the key), no
    // repeated snapshot scans from the pre/post branches (AQE's
    // toString repeats the initial plan — count the final plan only)
    val plan = feed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).length == 1,
      s"keyed diff should cost exactly one join:\n$plan")
  }

  test("keyed feed takes the append fast path: inserts only, no join, O(delta)") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    val feed = VersionedTable.changesBetween(spark, root, 0, 1, Some("id"))
    assert(feed.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set(2L -> "insert"))
    val plan = feed.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"keyed append feed must stay O(delta):\n$plan")
  }

  test("compact and optimize are data-equivalent: empty feed, identical reads") {
    val root = freshRoot()
    val base = (1 to 500).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    VersionedTable.init(spark, root, base)
    VersionedTable.compact(spark, root)
    assert(VersionedTable.changesBetween(spark, root, 0, 1).count() == 0L,
      "compact must produce an empty change feed")
    VersionedTable.optimize(spark, root, ("id", "id"), nFiles = 4)
    assert(VersionedTable.changesBetween(spark, root, 1, 2).count() == 0L,
      "optimize must produce an empty change feed")
    assert(VersionedTable.changesBetween(spark, root, 0, 2).count() == 0L)
    val v0 = VersionedTable.read(spark, root, Some(0)).collect().map(_.toString).sorted
    val v2 = VersionedTable.read(spark, root, Some(2)).collect().map(_.toString).sorted
    assert(v0.sameElements(v2), "optimize changed table contents")
  }

  test("enableChangeFeed materializes commit-time change files: keyed " +
    "rewrite feeds serve from the file — no join, no snapshot scan — " +
    "and carry exactly the planted changes") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 0)
    VersionedTable.enableChangeFeed(spark, root, "id") // v2, metadata-only
    assert(VersionedTable.changeFeedKey(spark, root).contains("id"))
    // v3: full-rewrite merge — update 2, delete 1, insert 9
    VersionedTable.merge(spark, root,
      Seq((2L, "b2", "U"), (1L, "a", "D"), (9L, "i", "U"))
        .toDF("id", "text", "op"), "id")
    def noJoin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty
    val f3 = VersionedTable.changesBetween(spark, root, 2, 3,
      key = Some("id"))
    assert(noJoin(f3), "rewrite feed must serve from the change file")
    assert(f3.select("id", "text", "change_kind")
      .as[(Long, String, String)].collect().toSet == Set(
      (1L, "a", "delete"), (2L, "b", "update_preimage"),
      (2L, "b2", "update_postimage"), (9L, "i", "insert")))
    // v4: stats-pruned copy-on-write delete — file covers it too
    VersionedTable.delete(spark, root, col("id") === 3L)
    val f4 = VersionedTable.changesBetween(spark, root, 3, 4,
      key = Some("id"))
    assert(noJoin(f4))
    assert(f4.select("id", "change_kind").as[(Long, String)].collect()
      .toSet == Set(3L -> "delete"))
    // v5: UPDATE — pre/post pair from the file
    VersionedTable.update(spark, root, col("id") === 9L,
      Seq("text" -> lit("i2")))
    val f5 = VersionedTable.changesBetween(spark, root, 4, 5,
      key = Some("id"))
    assert(noJoin(f5))
    assert(f5.select("id", "text", "change_kind")
      .as[(Long, String, String)].collect().toSet == Set(
      (9L, "i", "update_preimage"), (9L, "i2", "update_postimage")))
    // v6: append — NO change file written (manifest delta serves it)
    VersionedTable.append(spark, root, docs(7L -> "g"), expectedVersion = 5)
    assert(VersionedTable.changeFilePathIfExists(spark, root, 6).isEmpty,
      "append must not pay change-file materialization")
    assert(VersionedTable.changeFilePathIfExists(spark, root, 3).isDefined
      && VersionedTable.changeFilePathIfExists(spark, root, 5).isDefined)
    val f6 = VersionedTable.changesBetween(spark, root, 5, 6,
      key = Some("id"))
    assert(f6.select("id", "change_kind").as[(Long, String)].collect()
      .toSet == Set(7L -> "insert"))
    // fold invariant across the whole file-served history: applying
    // the keyed feed version by version to the v2 snapshot reproduces
    // the v6 snapshot
    var state = VersionedTable.read(spark, root, Some(2))
      .select("id", "text").as[(Long, String)].collect().toMap
    (3 to 6).foreach { v =>
      VersionedTable.changesBetween(spark, root, v - 1, v,
        key = Some("id"))
        .select("id", "text", "change_kind")
        .as[(Long, String, String)].collect().foreach {
          case (id, _, "delete") => state -= id
          case (id, t, "insert" | "update_postimage") => state += id -> t
          case _ => () // update_preimage: informational
        }
    }
    assert(state == VersionedTable.read(spark, root, Some(6))
      .select("id", "text").as[(Long, String)].collect().toMap,
      "keyed file-served feed does not fold to the target snapshot")
  }

  test("a losing optimistic writer cannot disturb a committed " +
    "version's change file: uuid-named dirs referenced by the " +
    "manifest, losers clean only their own attempt") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.enableChangeFeed(spark, root, "id") // v1
    VersionedTable.delete(spark, root, col("id") === 1L) // v2 + file
    assert(VersionedTable.changeFilePathIfExists(spark, root, 2).isDefined)
    // a stale-based writer loses the v2 rename race; its cleanup path
    // must not touch the winner's committed change file
    intercept[VersionConflictException] {
      VersionedTable.append(spark, root, docs(9L -> "z"),
        expectedVersion = 1)
    }
    assert(VersionedTable.changeFilePathIfExists(spark, root, 2).isDefined,
      "loser's cleanup deleted the winner's committed change file")
    assert(VersionedTable.changesBetween(spark, root, 1, 2,
      key = Some("id")).select("id", "change_kind")
      .as[(Long, String)].collect().toSet == Set(1L -> "delete"))
  }

  test("enableChangeFeed refuses NULL and duplicate keys loudly") {
    val root = freshRoot()
    Seq((Some(1L), "a"), (None, "b"), (None, "c"))
      .toDF("id", "text")
      .write.mode("overwrite").parquet(root + "_src")
    VersionedTable.init(spark, root,
      spark.read.parquet(root + "_src"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.enableChangeFeed(spark, root, "id")
    }
    assert(e.getMessage.contains("NULL"))
    val root2 = freshRoot()
    VersionedTable.init(spark, root2, docs(1L -> "a", 1L -> "dup"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.enableChangeFeed(spark, root2, "id")
    }
    assert(e2.getMessage.contains("not unique"))
  }

  test("a feed across a data-equivalent maintenance version is empty " +
    "from the #op: marker alone: no parquet scan, no exchange planned") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    VersionedTable.compact(spark, root) // v2, data-equivalent
    val f = VersionedTable.changesBetween(spark, root, 1, 2)
    assert(f.count() == 0L)
    val plan = f.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"maintenance skip must plan no exchange:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"),
      s"maintenance skip must not scan data:\n$plan")
    // changeFeed across the range carries zero rows for the compact
    // version and the append rows around it
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 2)
    val cf = VersionedTable.changeFeed(spark, root, 1)
    assert(cf.filter(col("_commit_version") === 2L).count() == 0L)
    assert(cf.filter(col("_commit_version") === 3L).select("id")
      .as[Long].collect().toSeq == Seq(3L))
  }

  test("general path is ONE wide aggregate: single exchange, no join") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.merge(spark, root,
      docs(2L -> "b2").withColumn("op", lit("U")), "id")
    val feed = VersionedTable.changesBetween(spark, root, 0, 1)
    val plan = feed.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"content diff should cost exactly one shuffle, found $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"content diff must not join:\n$plan")
  }

  test("an empty initial snapshot feeds correctly: appends are pure inserts") {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        docs(1L -> "x").schema))
    VersionedTable.append(spark, root, docs(1L -> "a"), expectedVersion = 0)
    val feed = VersionedTable.changesBetween(spark, root, 0, 1)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(feed.toSeq == Seq(1L -> "insert"))
  }

  test("same-version feed is empty with the feed schema") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    val feed = VersionedTable.changesBetween(spark, root, 0, 0)
    assert(feed.count() == 0L)
    assert(feed.columns.toSeq == Seq("id", "text", "change_kind"))
  }

  test("tailChanges: each version handled exactly once; crash before the " +
      "checkpoint marker replays that version; nothing re-runs after") {
    val root = freshRoot()
    val ck = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Set[(Long, String)])]()
    def handle(v: Int, feed: org.apache.spark.sql.DataFrame): Unit =
      seen += (v -> feed.collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet)
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    assert(VersionedTable.tailChanges(spark, root, ck)(handle) == 2)
    assert(seen.toList == List(
      0 -> Set(1L -> "insert"), 1 -> Set(2L -> "insert")))
    // idempotent: nothing new → nothing handled
    assert(VersionedTable.tailChanges(spark, root, ck)(handle) == 0)
    assert(seen.size == 2)
    // new commits → only the new versions flow
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    assert(VersionedTable.tailChanges(spark, root, ck)(handle) == 1)
    assert(seen.last == (2 -> Set(3L -> "insert")))
    // crash between handler and marker: simulate by a handler that
    // throws AFTER observing the feed — the version must replay
    VersionedTable.append(spark, root, docs(4L -> "d"), expectedVersion = 2)
    intercept[RuntimeException](
      VersionedTable.tailChanges(spark, root, ck) { (v, feed) =>
        handle(v, feed); throw new RuntimeException("crash after handle")
      })
    assert(seen.last == (3 -> Set(4L -> "insert")))
    // recovery re-delivers v3 (at-least-once), then the marker lands
    assert(VersionedTable.tailChanges(spark, root, ck)(handle) == 1)
    assert(seen.last == (3 -> Set(4L -> "insert")) && seen.size == 5)
    assert(VersionedTable.tailChanges(spark, root, ck)(handle) == 0)
  }

  test("fold invariant: from-snapshot + feed == to-snapshot for EVERY version " +
      "pair across a mixed append/merge/compact/optimize history") {
    val root = freshRoot()
    VersionedTable.init(spark, root,                       // v0
      docs(1L -> "a", 2L -> "b", 2L -> "b", 3L -> "c"))
    VersionedTable.append(spark, root, docs(4L -> "d"), 0) // v1 append
    VersionedTable.merge(spark, root,                      // v2 rewrite
      docs(2L -> "b2", 5L -> "e")
        .withColumn("op", lit("U"))
        .unionByName(docs(3L -> "x").withColumn("op", lit("D"))), "id")
    VersionedTable.compact(spark, root)                    // v3 no-op rewrite
    VersionedTable.append(spark, root, docs(6L -> "f"), 3) // v4 append
    VersionedTable.optimize(spark, root, ("id", "id"), 2)  // v5 no-op rewrite

    def multiset(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Int] =
      df.collect().map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
    for (from <- 0 to 5; to <- from to 5) {
      val a = scala.collection.mutable.Map(
        multiset(VersionedTable.read(spark, root, Some(from))).toSeq: _*)
      VersionedTable.changesBetween(spark, root, from, to).collect().foreach {
        r =>
          val key = (r.getLong(0), r.getString(1))
          val delta = if (r.getString(2) == "insert") 1 else -1
          a(key) = a.getOrElse(key, 0) + delta
      }
      val folded = a.filter(_._2 != 0).toMap
      assert(a.values.forall(_ >= 0), s"feed $from->$to deleted a missing row")
      assert(folded == multiset(VersionedTable.read(spark, root, Some(to))),
        s"feed $from->$to does not fold onto the target snapshot")
    }
  }

  test("a feed over a vacuumed-away version fails loudly, never silently empty") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.merge(spark, root,
      docs(1L -> "a2").withColumn("op", lit("U")), "id")
    VersionedTable.merge(spark, root,
      docs(1L -> "a3").withColumn("op", lit("U")), "id")
    VersionedTable.vacuum(spark, root, keepVersions = 1, retainMillis = 0L)
    // v2 still reads; a feed anchored at the vacuumed v0 must throw
    assert(VersionedTable.read(spark, root, Some(2)).count() == 1L)
    intercept[Exception](
      VersionedTable.changesBetween(spark, root, 0, 2).collect())
  }

  test("vacuumPreview accounts for the CHANGE-FILE sweep too: " +
    "scope-'changes' rows list exactly what vacuum then deletes " +
    "(shared candidate selection — DRY RUN and destructive never " +
    "drift on the CDC plane)") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.enableChangeFeed(spark, root, "id") // v1
    VersionedTable.merge(spark, root,
      docs(1L -> "a2").withColumn("op", lit("U")), "id") // v2 + change file
    VersionedTable.merge(spark, root,
      docs(1L -> "a3").withColumn("op", lit("U")), "id") // v3 + change file
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val chDir = new org.apache.hadoop.fs.Path(root, "_changes")
    val before = fs.listStatus(chDir).map(_.getPath.getName).toSet
    assert(before.size >= 2, s"two keyed merges write change files: $before")
    // DRY RUN at keep=1: v2's change entry ages out (v3's survives
    // with its manifest), and the preview LISTS it under its own scope
    val pv = VersionedTable.vacuumPreview(spark, root,
      keepVersions = 1, retainMillis = 0L).collect()
    val changeRows = pv.filter(_.getString(3) == "changes")
    assert(changeRows.nonEmpty,
      s"the preview must account for the change-file sweep: ${pv.toSeq}")
    assert(changeRows.forall(_.getLong(2) > 0L),
      s"change rows carry real bytes: ${changeRows.toSeq}")
    // the destructive vacuum deletes EXACTLY the previewed entries
    VersionedTable.vacuum(spark, root, keepVersions = 1,
      retainMillis = 0L)
    val after = fs.listStatus(chDir).map(_.getPath.getName).toSet
    assert(before -- after == changeRows.map(_.getString(0)).toSet,
      s"vacuum must sweep exactly the previewed change entries: " +
        s"previewed=${changeRows.map(_.getString(0)).toSeq} " +
        s"swept=${before -- after}")
    // the surviving feed still serves from the kept change file
    assert(VersionedTable.read(spark, root).count() == 1L)
  }

  test("optimize clusters: per-file min/max envelopes narrow vs scattered layout") {
    val root = freshRoot()
    // write deliberately scattered: round-robin ids across partitions
    val scattered = (0 until 4000).map(i => (i.toLong, i % 97))
      .toDF("a", "b").repartition(8)
    VersionedTable.init(spark, root, scattered)
    VersionedTable.optimize(spark, root, ("a", "b"), nFiles = 8)
    def spanFraction(version: Int): Double = {
      val dirs = VersionedTable.dataDirs(spark, root, Some(version))
      val spans = dirs.flatMap { dir =>
        new java.io.File(dir.stripPrefix("file:")).listFiles()
          .filter(_.getName.endsWith(".parquet")).map { f =>
            val df = spark.read.parquet(f.getAbsolutePath)
            val r = df.agg(min(col("a")), max(col("a"))).head
            (r.getLong(1) - r.getLong(0)).toDouble / 4000.0
          }
      }
      spans.sum / spans.length
    }
    val before = spanFraction(0)
    val after = spanFraction(1)
    // scattered files each span ~the whole id range; z-ordered files
    // cover disjoint slices — the property parquet min/max pruning buys
    assert(before > 0.9, s"scattered baseline should span ~full range, got $before")
    assert(after < 0.5, s"optimize should narrow per-file envelopes, got $after")
  }

  test("changeFeed unions per-version deltas in commit order, each " +
      "tagged _commit_version; version 0 replays the snapshot as inserts") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 0)
    VersionedTable.merge(spark, root,
      Seq((2L, "b2", "U")).toDF("id", "text", "op"), "id")
    val feed = VersionedTable.changeFeed(spark, root, 0)
      .select("id", "text", "change_kind", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (3L, "c", "insert", 1L),
      (2L, "b", "delete", 2L), (2L, "b2", "insert", 2L)),
      s"feed wrong: $feed")
    // an insert-then-delete inside the range surfaces as BOTH events
    // (per-version, never netted away end-to-end)
    assert(feed.count(_._1 == 2L) == 3)
    // keyed mode switches every per-version delta to pre/post images
    val keyed = VersionedTable.changeFeed(spark, root, 2, key = Some("id"))
      .select("id", "text", "change_kind", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(keyed == Set(
      (2L, "b", "update_preimage", 2L),
      (2L, "b2", "update_postimage", 2L)), s"keyed feed wrong: $keyed")
    // bounds are validated loudly
    intercept[IllegalArgumentException](
      VersionedTable.changeFeed(spark, root, -1))
    intercept[IllegalArgumentException](
      VersionedTable.changeFeed(spark, root, 0, Some(99)))
    intercept[IllegalArgumentException](
      VersionedTable.changeFeed(spark, root, 3, Some(2)))
  }
}
