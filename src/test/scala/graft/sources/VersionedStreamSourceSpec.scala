package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The versioned table as a Structured Streaming SOURCE: offsets are
  * version numbers, each micro-batch reads only the commit dirs its
  * version range added, batch 0 is the current snapshot. */
class VersionedStreamSourceSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vss").resolve("tbl").toString

  private def docs(ids: (Long, String)*) = ids.toSeq.toDF("id", "text")

  test("streams the snapshot then tails appends, one micro-batch per offset range") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 0)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Set[Long])]()
    val q = spark.readStream.format("graft-versioned-stream").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized {
          seen += (id -> batch.select("id").as[Long].collect().toSet)
        }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      // batch 0 = the snapshot as of the latest version at start (v1)
      assert(seen.map(_._2).reduce(_ ++ _) == Set(1L, 2L, 3L),
        s"initial load wrong: $seen")
      val before = seen.size
      // live append lands as its own delta batch with ONLY the new rows
      VersionedTable.append(spark, root, docs(4L -> "d", 5L -> "e"),
        expectedVersion = 1)
      q.processAllAvailable()
      assert(seen.size == before + 1 && seen.last._2 == Set(4L, 5L),
        s"append batch wrong: $seen")
      // nothing new → no new batch
      q.processAllAvailable()
      assert(seen.size == before + 1)
    } finally q.stop()
  }

  test("checkpointed restart resumes from the last committed version, " +
      "not the snapshot") {
    val root = freshRoot()
    val ck = java.nio.file.Files.createTempDirectory("graft_vss_ck").toString
    VersionedTable.init(spark, root, docs(1L -> "a"))
    val seen = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned-stream").load(root)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen += batch.select("id").as[Long].collect().toSet
          }: Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.flatten.toSet == Set(1L))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    run() // restart: offset checkpoint says v0 done → only v1's delta flows
    assert(seen.last == Set(2L), s"restart replayed the snapshot: $seen")
  }

  test("capstone topology: curation ingest sink upstream, streaming source " +
      "downstream — the tail sees exactly the curated survivors") {
    def words(prefix: String, n: Int) =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val root = freshRoot()
    val bench = Seq(0L -> words("bench", 25)).toDF("doc_id", "text")
    VersionedTable.init(spark, root,
      Seq(100L -> words("alpha", 25)).toDF("doc_id", "text"))
    val seen = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q = spark.readStream.format("graft-versioned-stream").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen += batch.select("doc_id").as[Long].collect().toSet
        }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.flatten.toSet == Set(100L)) // seed snapshot
      // batch 0: fresh doc + near re-crawl of the seed (curated away)
      graft.streaming.Streams.ingestBatch(spark, root,
        Seq(200L -> words("delta", 25),
            201L -> (words("alpha", 25) + " extra0")).toDF("doc_id", "text"),
        bench, batchId = 0L)
      q.processAllAvailable()
      assert(seen.last == Set(200L),
        s"tail must carry ONLY the curated survivor: $seen")
      // batch 1: near-dup of batch 0's survivor (grown-corpus check) + fresh
      graft.streaming.Streams.ingestBatch(spark, root,
        Seq(300L -> (words("delta", 25) + " extra1"),
            301L -> words("omega", 25)).toDF("doc_id", "text"),
        bench, batchId = 1L)
      q.processAllAvailable()
      assert(seen.last == Set(301L), s"grown-corpus dedup leaked: $seen")
      // crash replay of batch 1 appends nothing → no new micro-batch
      val n = seen.size
      graft.streaming.Streams.ingestBatch(spark, root,
        Seq(300L -> (words("delta", 25) + " extra1"),
            301L -> words("omega", 25)).toDF("doc_id", "text"),
        bench, batchId = 1L)
      q.processAllAvailable()
      assert(seen.size == n, "idempotent replay must not re-emit downstream")
    } finally q.stop()
  }

  test("the engine selects the DSv2 micro-batch path by default") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    val q = spark.readStream.format("graft-versioned-stream").load(root)
      .writeStream.format("noop").start()
    try {
      q.processAllAvailable()
      val desc = q.lastProgress.sources.head.description
      assert(desc.contains("MicroBatchStream"),
        s"expected the DSv2 stream, engine picked: $desc")
    } finally q.stop()
  }

  test("a checkpoint written by the v1 source restarts under DSv2 — " +
      "offset wire compatibility across the seam migration") {
    val root = freshRoot()
    val ck = java.nio.file.Files.createTempDirectory("graft_vss_mig").toString
    VersionedTable.init(spark, root, docs(1L -> "a"))
    val seen = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    def run(expectV1: Boolean): Unit = {
      val q = spark.readStream.format("graft-versioned-stream").load(root)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen += batch.select("id").as[Long].collect().toSet
          }: Unit
        }
        .start()
      try {
        q.processAllAvailable()
        val desc = q.lastProgress match {
          case null => "" // no batch ran this time — selection not observable
          case p => p.sources.head.description
        }
        if (desc.nonEmpty)
          assert(desc.contains("MicroBatchStream") != expectV1,
            s"wrong seam selected (expectV1=$expectV1): $desc")
      } finally q.stop()
    }
    val disableKey = "spark.sql.streaming.disabledV2MicroBatchReaders"
    spark.conf.set(disableKey,
      classOf[VersionedTableStreamSourceProvider].getName)
    try run(expectV1 = true) // snapshot flows through the v1 Source
    finally spark.conf.unset(disableKey)
    assert(seen.flatten.toSet == Set(1L))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    run(expectV1 = false) // DSv2 resumes from the v1 offset checkpoint
    assert(seen.last == Set(2L),
      s"DSv2 restart from a v1 checkpoint replayed the snapshot: $seen")
  }

  test("a rewrite inside the streamed range fails the query loudly") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    val q = spark.readStream.format("graft-versioned-stream").load(root)
      .writeStream.format("noop").start()
    try {
      q.processAllAvailable()
      VersionedTable.merge(spark, root,
        docs(2L -> "b2").withColumn("op", lit("U")), "id")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(e.getMessage.contains("rewrite") ||
        String.valueOf(e.getCause).contains("rewrite"),
        s"wrong failure: ${e.getMessage}")
    } finally q.stop()
  }

  test("change-feed stream mode (DSv2): every row tagged change_kind + " +
      "_commit_version; folded it equals the batch changeFeed; live " +
      "appends tail with their own version") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val q = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select("id", "change_kind", "_commit_version")
            .as[(Long, String, Long)].collect()
        }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      val expected = VersionedTable.changeFeed(spark, root, 0)
        .select("id", "change_kind", "_commit_version")
        .as[(Long, String, Long)].collect().toSet
      assert(seen.toSet == expected, s"stream != batch feed: $seen")
      assert(seen.toSet == Set((1L, "insert", 0L), (2L, "insert", 1L),
        (3L, "insert", 2L)))
      // a live append arrives as its version's changes
      VersionedTable.append(spark, root, docs(4L -> "d"), expectedVersion = 2)
      q.processAllAvailable()
      assert(seen.toSet.contains((4L, "insert", 3L)), s"tail missing: $seen")
    } finally q.stop()
  }

  test("change-feed stream mode honors startingVersion: replay begins " +
      "at the requested commit, earlier versions never flow") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select("id", "_commit_version")
            .as[(Long, Long)].collect()
        }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.toSet == Set((3L, 2L)), s"startingVersion ignored: $seen")
    } finally q.stop()
  }

  test("maxVersionsPerTrigger bounds each micro-batch: a cold change-" +
      "feed consumer catches up one version at a time, then tails; the " +
      "snapshot stream bounds post-initial appends the same way") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    val batches =
      scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
    val q = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized {
          batches += batch.select("id", "_commit_version")
            .as[(Long, Long)].collect().toSet
        }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      val nonEmpty = batches.filter(_.nonEmpty)
      assert(nonEmpty.size == 3,
        s"expected 3 one-version batches, got: $batches")
      assert(nonEmpty.forall(_.map(_._2).size == 1),
        s"a batch spanned versions: $batches")
      assert(nonEmpty.flatten.toSet ==
        Set((1L, 0L), (2L, 1L), (3L, 2L)))
    } finally q.stop()
    // snapshot stream: the initial batch is the whole snapshot (one
    // version's worth by definition), later appends split per trigger
    val snapBatches = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q2 = spark.readStream.format("graft-versioned-stream")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        snapBatches.synchronized {
          snapBatches += batch.select("id").as[Long].collect().toSet
        }: Unit
      }
      .start()
    try {
      q2.processAllAvailable()
      assert(snapBatches.flatten.toSet == Set(1L, 2L, 3L))
      val n = snapBatches.size // BEFORE the appends: a trigger may
      // fire between them and deliver v3's batch immediately
      VersionedTable.append(spark, root, docs(4L -> "d"),
        expectedVersion = 2)
      VersionedTable.append(spark, root, docs(5L -> "e"),
        expectedVersion = 3)
      q2.processAllAvailable()
      val fresh = snapBatches.drop(n).filter(_.nonEmpty)
      assert(fresh.size == 2 && fresh.map(_.head).toSet == Set(4L, 5L),
        s"two appends must land as two bounded batches: $fresh")
    } finally q2.stop()
  }

  test("vacuum under a lagging bounded consumer: the stream dies with " +
      "the typed GraftDataLossException naming the vacuumed range and " +
      "the restart recipe, never a raw missing-file error") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    // v3 is a REWRITE: pre-rewrite commit dirs leave the live manifest,
    // so vacuum can actually delete data a replaying consumer needs
    VersionedTable.merge(spark, root,
      Seq((2L, "b2", "U")).toDF("id", "text", "op"), "id")
    VersionedTable.append(spark, root, docs(4L -> "d"), expectedVersion = 3)
    // retention horizon shorter than the consumer's lag — the
    // misconfiguration the guard exists to catch (test-only 0 ms);
    // keepVersions=2 leaves v3..v4 live, so a correctly-restarted
    // consumer still has a working range to tail
    VersionedTable.vacuum(spark, root, keepVersions = 2, retainMillis = 0L)
    // a cold bounded consumer replaying from version 0 (the
    // maxVersionsPerTrigger cold-start scenario)
    val q = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    val loss = causes(e).collectFirst { case d: GraftDataLossException => d }
    assert(loss.isDefined,
      s"expected GraftDataLossException in the cause chain, got: " +
        causes(e).map(_.getClass.getSimpleName).mkString(" <- "))
    assert(loss.get.getMessage.contains("VACUUM") &&
      loss.get.getMessage.contains("startingVersion >= 4"),
      s"error must name the vacuumed range and the restart floor: " +
        loss.get.getMessage)
    // batch changeFeed over the vacuumed range: same typed error
    val e2 = intercept[GraftDataLossException] {
      VersionedTable.changeFeed(spark, root, startingVersion = 0)
    }
    assert(e2.getMessage.contains("earliest surviving manifest: 3"))
    // and the prescribed restart floor works: v4's delta is servable
    // because its predecessor's manifest (v3) survived
    assert(VersionedTable.changeFeed(spark, root, startingVersion = 4)
      .count() == 1L)
  }

  test("a FRESH snapshot stream starts on a long-vacuumed table: the " +
      "initial batch needs only the LATEST manifest, not the vacuumed " +
      "prefix — on both the DSv2 seam and the bounded v1 seam") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.merge(spark, root,
      Seq((1L, "a2", "U"), (2L, "b", "U")).toDF("id", "text", "op"), "id")
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    VersionedTable.vacuum(spark, root, keepVersions = 1, retainMillis = 0L)
    assert(VersionedTable.earliestVersion(spark, root) == 2)
    def drive(bounded: Boolean): Set[Long] = {
      val seen = scala.collection.mutable.ArrayBuffer[Long]()
      var r = spark.readStream.format("graft-versioned-stream")
      if (bounded) r = r.option("maxVersionsPerTrigger", "1")
      val q = r.load(root).writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= b.select("id").as[Long].collect()
          }: Unit
        }
        .start()
      try { q.processAllAvailable(); seen.toSet } finally q.stop()
    }
    // DSv2 (default) — the round-14 review caught the initial batch
    // requiring manifests 0..latest and failing here
    assert(drive(bounded = false) == Set(1L, 2L, 3L))
    // v1 seam with a trigger bound: the initial snapshot batch is one
    // unsplittable version's worth and must NOT be pinned to v(n-1)
    val disableKey = "spark.sql.streaming.disabledV2MicroBatchReaders"
    spark.conf.set(disableKey,
      classOf[VersionedTableStreamSourceProvider].getName)
    try assert(drive(bounded = true) == Set(1L, 2L, 3L))
    finally spark.conf.unset(disableKey)
  }

  test("a commit dir missing under a surviving manifest (interrupted " +
      "vacuum) also surfaces as the typed data-loss error") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    // simulate the torn state: v1's added dir deleted, manifest intact
    val v0 = VersionedTable.dataDirs(spark, root, Some(0)).toSet
    val added = VersionedTable.dataDirs(spark, root, Some(1))
      .filterNot(v0).head
    val p = new org.apache.hadoop.fs.Path(added)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val e = intercept[GraftDataLossException] {
      VersionedTable.changesBetween(spark, root, 0, 1).count()
    }
    assert(e.getMessage.contains("removed by VACUUM"))
  }

  test("keyed change-feed streaming through the v1 seam: three versions " +
      "of keyed changes fold to the batch changeFeed result, update " +
      "pre/post images included") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 0)
    // v2 is a rewrite: update key 2, delete key 1 — the DSv2 append
    // tail refuses this range; the v1 getBatch seam serves it as keyed
    // pre/post images
    VersionedTable.merge(spark, root,
      Seq((2L, "b2", "U"), (1L, "a", "D")).toDF("id", "text", "op"), "id")
    val seen =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    val disableKey = "spark.sql.streaming.disabledV2MicroBatchReaders"
    spark.conf.set(disableKey,
      classOf[VersionedTableStreamSourceProvider].getName)
    try {
      val q = spark.readStream.format("graft-versioned-stream")
        .option("readChangeFeed", "true").option("key", "id").load(root)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= batch
              .select("id", "text", "change_kind", "_commit_version")
              .as[(Long, String, String, Long)].collect()
          }: Unit
        }
        .start()
      try {
        q.processAllAvailable()
        val expected = VersionedTable.changeFeed(spark, root, 0,
            key = Some("id"))
          .select("id", "text", "change_kind", "_commit_version")
          .as[(Long, String, String, Long)].collect().toSet
        assert(seen.toSet == expected, s"stream != batch feed: $seen")
        assert(seen.toSet.contains((2L, "b", "update_preimage", 2L)))
        assert(seen.toSet.contains((2L, "b2", "update_postimage", 2L)))
        assert(seen.toSet.contains((1L, "a", "delete", 2L)))
      } finally q.stop()
    } finally spark.conf.unset(disableKey)
  }

  test("the v1 seam honors maxVersionsPerTrigger: a keyed CDF cold " +
      "start catches up in bounded per-version batches instead of one " +
      "giant initial replay") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.append(spark, root, docs(2L -> "b"), expectedVersion = 0)
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    val disableKey = "spark.sql.streaming.disabledV2MicroBatchReaders"
    spark.conf.set(disableKey,
      classOf[VersionedTableStreamSourceProvider].getName)
    try {
      val batches =
        scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
      val q = spark.readStream.format("graft-versioned-stream")
        .option("readChangeFeed", "true").option("key", "id")
        .option("maxVersionsPerTrigger", "1").load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += b.select("id", "_commit_version")
              .as[(Long, Long)].collect().toSet
          }: Unit
        }
        .start()
      try {
        q.processAllAvailable()
        val nonEmpty = batches.filter(_.nonEmpty)
        assert(nonEmpty.size == 3,
          s"expected 3 one-version batches, got: $batches")
        assert(nonEmpty.forall(_.map(_._2).size == 1),
          s"a batch spanned versions: $batches")
        assert(nonEmpty.flatten.toSet ==
          Set((1L, 0L), (2L, 1L), (3L, 2L)))
      } finally q.stop()
    } finally spark.conf.unset(disableKey)
  }

  test("table-to-table capstone: one table's change-feed stream sinks " +
    "into another via writeStream.toTable — versioned log in, versioned " +
    "log out, exactly-once both ends") {
    val up = freshRoot()
    VersionedTable.init(spark, up, docs(1L -> "a"))
    val wh = java.nio.file.Files.createTempDirectory("graft_t2t_wh")
    val ck = java.nio.file.Files.createTempDirectory("graft_t2t_ck").toString
    val cat = "t2t" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.sink (id BIGINT, text STRING, " +
      "change_kind STRING, `_commit_version` BIGINT)")
    val down = s"$wh/sink"
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned-stream")
        .option("readChangeFeed", "true").load(up)
        .writeStream.option("checkpointLocation", ck)
        .toTable(s"$cat.sink")
      try q.processAllAvailable() finally q.stop()
    }
    run()
    VersionedTable.append(spark, up, docs(2L -> "b"), expectedVersion = 0)
    run()
    val got = spark.sql(s"SELECT id, change_kind, `_commit_version` " +
      s"FROM $cat.sink").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "insert", 0L), (2L, "insert", 1L)),
      s"downstream != upstream feed: $got")
    // replay restart: downstream version census unchanged
    val v = VersionedTable.latestVersion(spark, down)
    run()
    assert(VersionedTable.latestVersion(spark, down) == v,
      "restart replayed an epoch into the sink")
    // provenance composes: the sink is itself a versioned log whose
    // change feed replays the relay history
    assert(VersionedTable.changeFeed(spark, down, 0)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("the DSv2 change-feed stream refuses a keyed request and a " +
      "rewrite range loudly instead of emitting a wrong feed") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.merge(spark, root,
      Seq((1L, "a2", "U")).toDF("id", "text", "op"), "id")
    // rewrite inside the replayed range → loud failure
    val q = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("noop").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("rewrite") ||
        String.valueOf(e.getCause).contains("rewrite"),
        s"wrong failure: ${e.getMessage}")
    } finally q.stop()
    // keyed request WITHOUT commit-time change files → loud refusal
    // carrying the enableChangeFeed recipe
    val q2 = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true").option("key", "id").load(root)
      .writeStream.format("noop").start()
    try {
      val e2 = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q2.processAllAvailable() }
      assert(e2.getMessage.contains("enableChangeFeed") ||
        String.valueOf(e2.getCause).contains("enableChangeFeed"),
        s"wrong failure: ${e2.getMessage}")
    } finally q2.stop()
  }

  test("keyed change feed on the DSv2 seam: rewrites serve from commit-" +
      "time change files, and the streamed fold equals batch changeFeed " +
      "pre/post images included") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 0)
    VersionedTable.enableChangeFeed(spark, root, "id") // v2 (metadata)
    // v3: a full-rewrite merge — update 2, delete 1, insert 9
    VersionedTable.merge(spark, root,
      Seq((2L, "b2", "U"), (1L, "a", "D"), (9L, "i", "U"))
        .toDF("id", "text", "op"), "id")
    // v4: a targeted copy-on-write delete
    VersionedTable.delete(spark, root, col("id") === 3L)
    // v5: a plain append (no change file needed — manifest delta)
    VersionedTable.append(spark, root, docs(7L -> "g"), expectedVersion = 4)
    // DSv2 selected by default: no disabledV2MicroBatchReaders set
    assert(spark.conf.getOption(
      "spark.sql.streaming.disabledV2MicroBatchReaders").forall(_.isEmpty))
    val seen = scala.collection.mutable
      .ArrayBuffer[(Long, String, String, Long)]()
    val q = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true").option("key", "id").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch
            .select("id", "text", "change_kind", "_commit_version")
            .as[(Long, String, String, Long)].collect()
        }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      val expected = VersionedTable.changeFeed(spark, root, 0,
        key = Some("id"))
        .select("id", "text", "change_kind", "_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      assert(seen.toSet == expected,
        s"DSv2 keyed stream != batch changeFeed:\n got ${seen.toSet}\n " +
          s"exp $expected")
      // the rewrite versions really contributed pre/post images
      assert(seen.exists(_._3 == "update_preimage") &&
        seen.exists(_._3 == "update_postimage") &&
        seen.exists(_._3 == "delete"))
      // a live append lands as an ordinary keyed insert batch
      val n = seen.size
      VersionedTable.append(spark, root, docs(8L -> "h"),
        expectedVersion = 5)
      q.processAllAvailable()
      assert(seen.drop(n).toSet == Set((8L, "h", "insert", 6L)))
    } finally q.stop()
  }

  test("keyed DSv2 stream checkpoint-restarts across a rewrite: the " +
      "second run resumes at the committed version and serves the new " +
      "rewrite from its change file") {
    val root = freshRoot()
    val ck = java.nio.file.Files.createTempDirectory("graft_kcdf_ck")
      .toString
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    VersionedTable.enableChangeFeed(spark, root, "id")
    val seen =
      scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned-stream")
        .option("readChangeFeed", "true").option("key", "id").load(root)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= b.select("id", "change_kind", "_commit_version")
              .as[(Long, String, Long)].collect()
          }: Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val afterFirst = seen.size
    assert(seen.map(_._1).toSet == Set(1L, 2L))
    // between the runs: one append and one rewrite land
    VersionedTable.append(spark, root, docs(3L -> "c"), expectedVersion = 1)
    VersionedTable.merge(spark, root,
      Seq((2L, "b2", "U")).toDF("id", "text", "op"), "id")
    run()
    val fresh = seen.drop(afterFirst)
    // no replay of the first run's rows, and the rewrite's pre/post
    // pair arrives from the materialized file
    assert(fresh.map(_._1).toSet == Set(2L, 3L), s"wrong resume: $fresh")
    assert(fresh.count(_._1 == 1L) == 0, "restart replayed old versions")
    assert(fresh.filter(_._1 == 2L).map(_._2).toSet ==
      Set("update_preimage", "update_postimage"))
  }

  test("triggerOnly mode: the stream is a COMMIT TICKER — one batch " +
    "per version range, zero rows ever, and rewrites tick instead of " +
    "failing the append-only rule") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a", 2L -> "b"))
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = spark.readStream.format("graft-versioned-stream")
      .option("triggerOnly", "true").load(root)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized { batches += (id -> batch.count()) }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(batches.nonEmpty && batches.forall(_._2 == 0L),
        s"triggerOnly batches must carry no rows: $batches")
      val before = batches.size
      // an append ticks
      VersionedTable.append(spark, root, docs(3L -> "c"), 0)
      q.processAllAvailable()
      assert(batches.size == before + 1 && batches.last._2 == 0L)
      // a REWRITE also ticks — the append-only restriction never
      // applies when no partitions are planned
      VersionedTable.delete(spark, root,
        org.apache.spark.sql.functions.col("id") === 1L)
      q.processAllAvailable()
      assert(batches.size == before + 2 && batches.last._2 == 0L,
        s"a rewrite must tick, not fail: $batches")
      // nothing new → no tick
      q.processAllAvailable()
      assert(batches.size == before + 2)
    } finally q.stop()
    // PARITY under the v1 fallback: a follow consumer selected onto
    // the legacy Source seam (disabledV2MicroBatchReaders) must get
    // the same commit-ticker contract — zero rows, rewrites tick
    val disableKey = "spark.sql.streaming.disabledV2MicroBatchReaders"
    spark.conf.set(disableKey,
      classOf[VersionedTableStreamSourceProvider].getName)
    try {
      val batches1 = scala.collection.mutable.ArrayBuffer[Long]()
      val q1 = spark.readStream.format("graft-versioned-stream")
        .option("triggerOnly", "true").load(root)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches1.synchronized { batches1 += b.count() }: Unit
        }
        .start()
      try {
        q1.processAllAvailable()
        VersionedTable.delete(spark, root,
          org.apache.spark.sql.functions.col("id") === 2L)
        q1.processAllAvailable()
        assert(batches1.nonEmpty && batches1.forall(_ == 0L),
          s"v1 triggerOnly must tick data-free through a rewrite: " +
            batches1)
      } finally q1.stop()
    } finally spark.conf.unset(disableKey)
  }

  test("a rewrite committed BEFORE enableChangeFeed refuses on the " +
      "keyed DSv2 stream with the batch/v1 replay recipe") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))
    VersionedTable.merge(spark, root,
      Seq((1L, "a2", "U")).toDF("id", "text", "op"), "id") // pre-CDC rewrite
    VersionedTable.enableChangeFeed(spark, root, "id")
    val q = spark.readStream.format("graft-versioned-stream")
      .option("readChangeFeed", "true").option("key", "id").load(root)
      .writeStream.format("noop").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.processAllAvailable() }
      def chain(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
      assert(chain(e).contains("BEFORE"), s"wrong failure: ${chain(e)}")
    } finally q.stop()
  }

  test("a bare readStream consumer AUTO-publishes its committed " +
      "version floor under a checkpoint-derived id — first commit, " +
      "then every floorPublishEvery epochs — so RESPECT CONSUMERS " +
      "retention finally sees plain streaming readers; a restart " +
      "re-claims the SAME registry row, and MAX LAG still clamps an " +
      "abandoned floor") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))                // v0
    VersionedTable.append(spark, root, docs(2L -> "b"), 0)           // v1
    VersionedTable.append(spark, root, docs(3L -> "c"), 1)           // v2
    val ck = java.nio.file.Files
      .createTempDirectory("graft_floor_ck").toString
    def floorRows() = VersionedTable.consumerFloors(spark, root)
      .select("consumer", "floor_version").as[(String, Long)]
      .collect().toSeq.filter(_._1.startsWith("stream:"))
    // source.commit fires on the trigger cycle AFTER the batch (the
    // engine's clean-up point), so give the publish a moment to land
    def await(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
    }
    def tail() = spark.readStream.format("graft-versioned-stream")
      .option("floorPublishEvery", "1").load(root)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val q = tail()
    val sid = try {
      q.processAllAvailable()
      // the engine fires source.commit(batch N-1) when it CONSTRUCTS
      // batch N, so the snapshot batch's offset (v2) publishes when
      // the first append-delta batch is planned
      VersionedTable.append(spark, root, docs(4L -> "d"), 2)         // v3
      q.processAllAvailable()
      await(floorRows().nonEmpty)
      val rows = floorRows()
      assert(rows.size == 1 && rows.head._2 == 2L,
        s"the snapshot batch's committed offset must publish when " +
          s"the next batch constructs, got $rows")
      // every=1: the next constructed batch advances the floor to 3
      VersionedTable.append(spark, root, docs(5L -> "e"), 3)         // v4
      q.processAllAvailable()
      await(floorRows().exists(_._2 == 3L))
      assert(floorRows() == Seq(rows.head._1 -> 3L),
        s"cadence-1 publish must track each commit, got ${floorRows()}")
      rows.head._1
    } finally q.stop()
    // the consumer now LAGS: another version lands while it is down
    VersionedTable.append(spark, root, docs(6L -> "f"), 4)           // v5
    // RESPECT CONSUMERS widens the requested horizon around the
    // auto-published floor: keep must reach back to v3
    val (keep, respected, clamped) =
      VersionedTable.consumerKeepVersions(spark, root, requested = 1)
    assert((keep, respected, clamped) == ((3, 1, 0)),
      s"floor 3 at latest 5 must widen keep to 3, got " +
        s"($keep, $respected, $clamped)")
    // MAX LAG 1 treats the same floor as abandoned and clamps it
    val (keep2, _, clamped2) = VersionedTable.consumerKeepVersions(
      spark, root, requested = 1, maxLag = Some(1))
    assert(keep2 == 2 && clamped2 == 1,
      s"MAX LAG 1 must clamp the lagging floor, got ($keep2, $clamped2)")
    // restart from the SAME checkpoint: the consumer re-claims its
    // row (no id churn — one consumer, one registry entry); catching
    // up on v5 constructs a batch whose clean-up commits offset 4
    val q2 = tail()
    try {
      q2.processAllAvailable()
      await(floorRows().exists(_._2 >= 4L))
      val after = floorRows()
      assert(after.size == 1 && after.head._1 == sid &&
        after.head._2 >= 4L,
        s"restart must re-claim the same id at the caught-up floor, " +
          s"got $after")
    } finally q2.stop()
  }

  test("floor auto-publish default cadence fires on the FIRST commit " +
      "call (no option needed — a consumer the table moves past is " +
      "visible to retention from its second batch on) and " +
      "floorPublishEvery=0 disables it") {
    val root = freshRoot()
    VersionedTable.init(spark, root, docs(1L -> "a"))                // v0
    def floorCount() = VersionedTable.consumerFloors(spark, root)
      .filter(org.apache.spark.sql.functions.col("consumer")
        .startsWith("stream:")).count()
    def drive(ck: String, opts: Map[String, String],
        expectPublish: Boolean = false): Unit = {
      val r = spark.readStream.format("graft-versioned-stream")
      opts.foreach { case (k, v) => r.option(k, v) }
      val w = r.load(root).writeStream
      // empty ck = let Spark auto-create its `temporary-<uuid>`
      // checkpoint (the console/memory exploration shape)
      if (ck.nonEmpty) w.option("checkpointLocation", ck)
      val q = w
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try {
        q.processAllAvailable()
        // force a SECOND batch so the engine's clean-up point (where
        // source.commit fires) runs at least once
        val v = VersionedTable.latestVersion(spark, root)
        VersionedTable.append(spark, root,
          docs((100L + v) -> s"x$v"), v)
        q.processAllAvailable()
        val before = floorCount()
        val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
        while (floorCount() <= before && System.nanoTime() < deadline &&
          expectPublish) Thread.sleep(100)
        if (!expectPublish) Thread.sleep(1500) // absence check
      } finally q.stop()
    }
    // default options: the first commit call publishes
    drive(java.nio.file.Files
      .createTempDirectory("graft_floor_d").toString, Map.empty,
      expectPublish = true)
    assert(floorCount() == 1L,
      "default cadence must publish on the first commit")
    // opt-out: no SECOND registry row appears
    drive(java.nio.file.Files
      .createTempDirectory("graft_floor_o").toString,
      Map("floorPublishEvery" -> "0"))
    assert(floorCount() == 1L,
      "floorPublishEvery=0 must not publish")
    // Spark's auto-created `temporary-<uuid>` checkpoint: the
    // consumer can never resume (the dir dies with the run), so no
    // ghost floor may register from an exploratory readStream
    drive("", Map.empty)
    assert(floorCount() == 1L,
      "a temp-checkpoint run must not register a ghost consumer")
    // ...unless explicitly opted in (the user owns the registry then)
    drive("", Map("floorPublishEvery" -> "1"), expectPublish = true)
    assert(floorCount() == 2L,
      "explicit floorPublishEvery must publish even from a temp " +
        "checkpoint")
  }
}
