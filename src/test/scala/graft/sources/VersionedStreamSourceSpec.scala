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
}
