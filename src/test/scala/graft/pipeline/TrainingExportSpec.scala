package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trainer-handoff export contracts the gate row can't express:
  * manifest-as-commit-point, shard-pruned loader reads, and
  * manifest/data agreement. */
class TrainingExportSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def fixture = (0 until 200)
    .map(i => (i.toLong, s"tok${i % 7} " * (i % 13 + 1)))
    .toDF("doc_id", "text")

  private def freshOut(): String =
    java.nio.file.Files.createTempDirectory("graft_texp").resolve("e").toString

  test("manifest totals agree with the written data; export is deterministic") {
    val out = freshOut()
    val m1 = TrainingExport.writeShards(fixture, out, budget = 64, shards = 4)
      .collect().map(_.toSeq).toSeq
    val data = spark.read.parquet(s"$out/data")
    assert(data.count() == 200L)
    val recomputed = data.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("seq_idx")).as("n_seqs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("doc_id")).as("sum_doc_id"))
      .orderBy("shard").collect().map(_.toSeq).toSeq
    assert(m1 == recomputed, "manifest disagrees with the data it describes")
    // determinism: a second export of the same corpus lands the same manifest
    val out2 = freshOut()
    val m2 = TrainingExport.writeShards(fixture, out2, budget = 64, shards = 4)
      .collect().map(_.toSeq).toSeq
    assert(m1 == m2)
  }

  test("a loader's shard read prunes to that shard's directory only") {
    val out = freshOut()
    TrainingExport.writeShards(fixture, out, budget = 64, shards = 4)
    val one = TrainingExport.readShard(spark, out, shard = 2)
    assert(one.collect().nonEmpty)
    // pruning happens at planning, not listing (inputFiles shows all
    // dirs): assert the scan carries the partition filter AND that the
    // executed scan touched exactly one shard's files
    val plan = one.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters") &&
      plan.toString.contains("shard"), s"no partition filter in:\n$plan")
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val shardFiles = spark.read.parquet(s"$out/data").inputFiles
      .count(_.contains("shard=2"))
    assert(scan.metrics("numFiles").value == shardFiles,
      s"scan read ${scan.metrics("numFiles").value} files, shard=2 has $shardFiles")
    // the pruned read returns exactly the manifest's row count for it
    val declared = TrainingExport.readManifest(spark, out)
      .filter(col("shard") === 2).head.getAs[Long]("n_docs")
    assert(one.count() == declared)
  }

  test("writePacked exports upstream-packed rows without re-packing; " +
      "extra columns ride along; totals match writeShards") {
    val docs = fixture
    val packed = TextAnalysis.packSequences(docs, budget = 64, shards = 4)
      .join(docs, "doc_id")
      .withColumn("mix_source", lit("en_heavy")) // upstream metadata
    val out = freshOut()
    val m = TrainingExport.writePacked(packed, out).collect().map(_.toSeq).toSeq
    // same manifest as the pack-inside path on the same corpus
    val out2 = freshOut()
    val m2 = TrainingExport.writeShards(docs, out2, budget = 64, shards = 4)
      .collect().map(_.toSeq).toSeq
    assert(m == m2)
    // the metadata column landed in the shard files
    val shardRows = TrainingExport.readShard(spark, out, 1)
    assert(shardRows.columns.contains("mix_source"))
    assert(shardRows.select("mix_source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("en_heavy"))
    // refuses rows missing the contract columns
    intercept[IllegalArgumentException](
      TrainingExport.writePacked(docs, freshOut()))
  }

  test("an EMPTY corpus exports cleanly: zero-row manifest, loud missing-shard read") {
    val out = freshOut()
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = TrainingExport.writeShards(empty, out, budget = 64, shards = 4)
    assert(m.count() == 0L)
    assert(m.columns.toSeq ==
      Seq("shard", "n_docs", "n_seqs", "n_tokens", "sum_doc_id"))
    // the commit still landed: a re-read sees the committed (empty) manifest
    assert(TrainingExport.readManifest(spark, out).count() == 0L)
    // reading a shard that holds nothing is a loud error, not a hang or NPE
    intercept[IllegalArgumentException](TrainingExport.readShard(spark, out, 0))
  }

  test("the manifest is the commit point: no manifest, no export") {
    val out = freshOut()
    // simulate a crash mid-export: data present, manifest absent
    fixture.withColumn("shard", pmod(col("doc_id"), lit(4)))
      .withColumn("seq_idx", lit(0L)).withColumn("n_tokens", lit(1L))
      .write.partitionBy("shard").parquet(s"$out/data")
    intercept[IllegalArgumentException](TrainingExport.readManifest(spark, out))
    intercept[IllegalArgumentException](TrainingExport.readShard(spark, out, 0))
  }
}
