package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

class IoSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-io").toString

  test("round-trips documents through every format") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val expected = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    for (fmt <- Io.formats) {
      val p = s"${tmp()}/docs-$fmt"
      Io.write(docs, p, fmt)
      val back = Io.read(spark, p, fmt, Some(docs.schema))
      assert(back.orderBy("doc_id").collect().map(_.toSeq).toSeq == expected,
        s"format $fmt")
    }
  }

  test("hive-style partitioning enables partition pruning") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val p = s"${tmp()}/docs-part"
    Io.write(docs, p, "parquet", partitionBy = Seq("lang"))
    val pruned = Io.read(spark, p).filter(col("lang") === "en")
    // pruning is visible in the scan's partition filters: the physical
    // plan must not read non-en directories
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang"), s"no partition filter in:\n$plan")
    val expected = docs.filter(col("lang") === "en").count()
    assert(pruned.count() == expected)
  }

  test("compact merges a many-small-files dir, preserving rows exactly") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val p = s"${tmp()}/docs-compact"
    docs.repartition(23).write.parquet(p) // 23 tiny files
    val before = docs.collect().map(_.getLong(0)).sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .filter(_.isFile).map(_.getPath.getName)
      .count(_.endsWith(".parquet"))
    assert(parquetFiles() == 23)
    val n = Io.compact(spark, p, targetBytes = 512L * 1024)
    assert(parquetFiles() == n && n < 23, s"got $n files")
    val after = spark.read.parquet(p).collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before, "compaction changed the data")
    // no temp/old dirs left behind
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p + "._compact_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p + "._compact_old")))
  }

  test("compact preserves a hive-partitioned layout and its pruning") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val p = s"${tmp()}/docs-part-compact"
    // many tiny files inside EACH lang=... partition directory
    docs.repartition(7).write.partitionBy("lang").parquet(p)
    val before = docs.collect().map(_.getLong(0)).sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("lang=")).sorted.toSeq
    val dirsBefore = partDirs()
    assert(dirsBefore.nonEmpty)
    val n = Io.compact(spark, p, targetBytes = 512L * 1024)
    // partition skeleton intact, each leaf compacted to few files
    assert(partDirs() == dirsBefore, "partition directories changed")
    assert(n == dirsBefore.size, s"expected 1 file per leaf, got $n total")
    val after = spark.read.parquet(p)
    assert(after.collect().map(_.getLong(0)).sorted.toSeq == before,
      "compaction changed the data")
    // pruning still works: the compacted layout keeps partition filters
    val plan = after.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition filter after compaction:\n${plan.take(1200)}")
  }

  test("dynamic partition pruning reaches the partitioned scan through a join") {
    // the 100 TB layout contract: when the partition column is a JOIN
    // key and the dim side is filtered, the fact scan must receive a
    // runtime partition filter (DPP) — directories for langs the dim
    // filter eliminates are never read, even though the eliminated set
    // is only known at run time
    val docs = Tables.documents(spark, sf("sf0.001"))
    val p = s"${tmp()}/docs-dpp"
    Io.write(docs, p, "parquet", partitionBy = Seq("lang"))
    val fact = Io.read(spark, p)
    val dim = docs.groupBy("lang").count()
      .filter(col("count") > 0 && col("lang") < lit("zz"))
      .select("lang")
    val j = fact.join(dim, "lang").groupBy("lang")
      .agg(count(lit(1)).as("n"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n${plan.take(2000)}")
  }

  test("bucketed tables join without an exchange") {
    val wh = tmp()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, sf("sf0.001"))
        .select("doc_id", "lang", "n_chars")
      val feats = Tables.documents(spark, sf("sf0.001"))
        .select(col("doc_id"), length(col("text")).as("len"))
      Io.writeBucketed(docs, "b_docs", "doc_id", 4, Some("doc_id"))
      Io.writeBucketed(feats, "b_feats", "doc_id", 4, Some("doc_id"))
      val joined = spark.table("b_docs")
        .join(spark.table("b_feats"), "doc_id")
      joined.count() // materialize with AQE final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == docs.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_feats")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
