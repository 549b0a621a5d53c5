package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucket-pinned tables and storage-partitioned joins: the writer
  * lays rows out by `pmod(murmur3(key,42), n)` (commitDirs routes
  * through `repartition(n, key)`), the catalog proves the layout
  * through FunctionCatalog + KeyGroupedPartitioning, and Spark plans
  * co-bucketed joins with NO shuffle exchange. Every claim here is
  * either a plan assertion or a file-level layout check — the two
  * things that must hold for SPJ to be sound rather than lucky. */
class BucketedTableSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bwh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gb.warehouse", d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def rootOf(tbl: String) = s"$wh/$tbl"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE's final plan is what we read
    df.queryExecution.executedPlan.toString
  }

  // the executed plan spells a shuffle "Exchange hashpartitioning"
  // (and an SPJ-satisfied join has none); assert on the real spelling
  // AND on the join operator so a vacuously-missing marker can never
  // green a broken claim
  private def assertNoShuffle(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = planOf(df)
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("BroadcastExchange"),
      s"expected a shuffle-free storage-partitioned join:\n$plan")
  }

  private def assertShuffles(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = planOf(df)
    assert(plan.contains("Exchange hashpartitioning"),
      s"expected a shuffling fallback plan:\n$plan")
  }

  private def noBroadcast[T](body: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("every file of a bucketed commit dir holds ONLY its bucket's " +
    "rows — the writer/reader agreement SPJ correctness rests on") {
    wh
    spark.sql("CREATE TABLE gb.b1 (id BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(200).select($"id", concat(lit("v"), $"id").as("s"))
      .createOrReplaceTempView("b1_src")
    spark.sql("INSERT INTO gb.b1 SELECT * FROM b1_src")
    val root = rootOf("b1")
    assert(VersionedTable.bucketSpec(spark, root) == Some(("id", 4)))
    val marked = VersionedTable.bucketedDirs(spark, root)
    assert(marked.nonEmpty)
    val dataRoot = new java.io.File(root, "data")
    for (dir <- marked; f <- new java.io.File(dataRoot, dir).listFiles()
        if f.getName.endsWith(".parquet")) {
      val b = GraftBucket.fileBucket(f.getName).get
      val bad = spark.read.parquet(f.getAbsolutePath)
        .filter(GraftBucket.idColumn(col("id"), 4) =!= b).count()
      assert(bad == 0, s"file ${f.getName} holds rows outside bucket $b")
    }
    // the V2 function the planner binds evaluates the same formula
    val bound = GraftBucket.Bound(org.apache.spark.sql.types.LongType)
    val expect = spark.range(50)
      .select($"id", GraftBucket.idColumn($"id", 4).as("b"))
      .as[(Long, Int)].collect()
    for ((id, b) <- expect) {
      val row = org.apache.spark.sql.catalyst.InternalRow(4, id)
      assert(bound.produceResult(row) == b, s"function drift at id=$id")
    }
  }

  test("a co-bucketed join plans with ZERO shuffle exchanges and " +
    "matches the shuffled answer") {
    wh
    spark.sql("CREATE TABLE gb.facts (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("CREATE TABLE gb.dims (id BIGINT, w STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(1000).select($"id", ($"id" * 3).as("v"))
      .createOrReplaceTempView("facts_src")
    spark.range(0, 1000, 2)
      .select($"id", concat(lit("w"), $"id").as("w"))
      .createOrReplaceTempView("dims_src")
    spark.sql("INSERT INTO gb.facts SELECT * FROM facts_src")
    spark.sql("INSERT INTO gb.dims SELECT * FROM dims_src")
    noBroadcast {
      val joined = spark.sql(
        "SELECT f.id, f.v, d.w FROM gb.facts f JOIN gb.dims d " +
          "ON f.id = d.id")
      assertNoShuffle(joined)
      assert(joined.count() == 500)
      // answers match the layout-oblivious computation
      val expect = spark.table("facts_src")
        .join(spark.table("dims_src"), "id").count()
      assert(expect == 500)
    }
  }

  test("appends, SQL UPDATE, and streaming epochs ALL keep the claim " +
    "(row-level write and epoch write both demand the bucket " +
    "distribution; the epoch commit verifies file purity before " +
    "marking)") {
    wh
    spark.sql("CREATE TABLE gb.f2 (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("CREATE TABLE gb.d2 (id BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(100).select($"id", $"id".as("v"))
      .createOrReplaceTempView("f2_src")
    spark.sql("INSERT INTO gb.f2 SELECT * FROM f2_src")
    spark.sql("INSERT INTO gb.f2 SELECT id + 100, id FROM f2_src")
    spark.range(200).select($"id", ($"id" + 7).as("w"))
      .createOrReplaceTempView("d2_src")
    spark.sql("INSERT INTO gb.d2 SELECT * FROM d2_src")
    def join() = spark.sql(
      "SELECT f.id, f.v, d.w FROM gb.f2 f JOIN gb.d2 d ON f.id = d.id")
    val root = rootOf("f2")
    noBroadcast {
      // two appended commit dirs, both marked: still shuffle-free
      assertNoShuffle(join())
      // SQL UPDATE rides RequiresDistributionAndOrdering: its rewrite
      // dir is laid out bucketed+sorted and MARKED — the claim (and
      // every downstream join plan) survives the statement
      val before = VersionedTable.readManifest(spark, root,
        VersionedTable.latestVersion(spark, root)).toSet
      spark.sql("UPDATE gb.f2 SET v = -1 WHERE id = 17")
      val dirs = VersionedTable.readManifest(spark, root,
        VersionedTable.latestVersion(spark, root))
      val marked = VersionedTable.bucketedDirs(spark, root)
      val added = dirs.filterNot(before)
      assert(added.nonEmpty && added.forall(marked.contains),
        s"the DML rewrite dir must carry the #bucketed: mark " +
          s"(added=$added marked=$marked)")
      assertNoShuffle(join())
      assert(spark.sql("SELECT v FROM gb.f2 WHERE id = 17")
        .as[Long].head() == -1L)
      // the rewritten dir really is bucket-pure (the physical fact)
      val dataRoot = new java.io.File(root, "data")
      for (dir <- marked; f <- new java.io.File(dataRoot, dir).listFiles()
          if f.getName.endsWith(".parquet")) {
        val b = GraftBucket.fileBucket(f.getName).get
        assert(spark.read.parquet(f.getAbsolutePath)
          .filter(GraftBucket.idColumn(col("id"), 4) =!= b)
          .count() == 0, s"file ${f.getName} outside bucket $b")
      }
      // a streaming epoch now holds the bucket layout too (the
      // V1Write demands the strict clustered distribution and the
      // epoch commit VERIFIES file purity before marking) — the SPJ
      // claim SURVIVES streaming ingest instead of degrading until
      // the next compact
      val ck = java.nio.file.Files.createTempDirectory("graft_bck").toString
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      ms.addData(500L -> 1L, 501L -> 2L, 502L -> 3L, 17L -> 9L)
      val q = ms.toDF().toDF("id", "v").writeStream
        .option("checkpointLocation", ck).toTable("gb.f2")
      try q.processAllAvailable() finally q.stop()
      val dirs2 = VersionedTable.readManifest(spark, root,
        VersionedTable.latestVersion(spark, root))
      // the EPOCH's own dir (absent from the pre-stream manifest)
      val epochDir = dirs2.filterNot(
        VersionedTable.readManifest(spark, root,
          VersionedTable.latestVersion(spark, root) - 1).toSet)
      assert(epochDir.nonEmpty && epochDir.forall(
        VersionedTable.bucketedDirs(spark, root).contains),
        s"the verified epoch dir must carry the #bucketed: mark, " +
          s"got epoch=$epochDir marked=" +
          VersionedTable.bucketedDirs(spark, root))
      assertNoShuffle(join())
      for (dir <- epochDir;
          f <- new java.io.File(dataRoot, dir).listFiles()
          if f.getName.endsWith(".parquet")) {
        val b = GraftBucket.fileBucket(f.getName).get
        assert(spark.read.parquet(f.getAbsolutePath)
          .filter(GraftBucket.idColumn(col("id"), 4) =!= b)
          .count() == 0, s"epoch file ${f.getName} outside bucket $b")
      }
      assert(join().count() == 201) // 500..502 have no join partner;
      // id=17 joined once more via its second (streamed) row
    }
  }

  test("enableBucketing on an existing table is metadata-only: no SPJ " +
    "claim until compact() rewrites; OPTIMIZE ZORDER refuses while " +
    "pinned; disableBucketing drops the pin") {
    wh
    spark.sql("CREATE TABLE gb.m1 (id BIGINT, v BIGINT)")
    spark.range(100).select($"id", $"id".as("v"))
      .createOrReplaceTempView("m1_src")
    spark.sql("INSERT INTO gb.m1 SELECT * FROM m1_src")
    val root = rootOf("m1")
    VersionedTable.enableBucketing(spark, root, "id", 4)
    spark.sql("CREATE TABLE gb.m2 (id BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gb.m2 SELECT id, id + 1 FROM m1_src")
    def join() = spark.sql(
      "SELECT a.id, a.v, b.w FROM gb.m1 a JOIN gb.m2 b ON a.id = b.id")
    noBroadcast {
      assertShuffles(join()) // pre-pin dirs are not bucketed yet
      VersionedTable.compact(spark, root)
      assertNoShuffle(join())
      assert(join().count() == 100)
    }
    val e = intercept[IllegalArgumentException] {
      VersionedTable.optimize(spark, root, ("id", "v"), 2)
    }
    assert(e.getMessage.contains("bucket"))
    VersionedTable.disableBucketing(spark, root)
    assert(VersionedTable.bucketSpec(spark, root).isEmpty)
    assert(VersionedTable.bucketedDirs(spark, root).isEmpty)
  }

  test("bucket purity survives an input plan already hash-partitioned " +
    "on the key into exactly n partitions — the optimizer collapses " +
    "the bucket repartition into the plan's own exchange and AQE " +
    "would coalesce it; the AQE-off write keeps the identity") {
    wh
    spark.sql("CREATE TABLE gb.hz (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(100).select($"id", $"id".as("v"))
      .createOrReplaceTempView("hz_src")
    spark.sql("INSERT INTO gb.hz SELECT * FROM hz_src")
    val root = rootOf("hz")
    // anti-join output is hashpartitioned(id, shuffle.partitions=4) ==
    // the bucket layout's (key, n) — the exact shape that collapsed
    // the write repartition and let AQE fold buckets together
    val anti = spark.range(500, 520).select($"id", $"id".as("v"))
      .join(spark.table("gb.hz").select("id"), Seq("id"), "left_anti")
    val v = VersionedTable.append(spark, root, anti,
      VersionedTable.latestVersion(spark, root))
    val added = VersionedTable.readManifest(spark, root, v)
      .filterNot(VersionedTable.readManifest(spark, root, v - 1).toSet)
    val dataRoot = new java.io.File(root, "data")
    val files = for (dir <- added;
        f <- new java.io.File(dataRoot, dir).listFiles()
        if f.getName.endsWith(".parquet")) yield f
    assert(files.size > 1, "coalesced into one file — the hazard is back")
    for (f <- files) {
      val b = GraftBucket.fileBucket(f.getName).get
      assert(spark.read.parquet(f.getAbsolutePath)
        .filter(GraftBucket.idColumn(col("id"), 4) =!= b).count() == 0,
        s"file ${f.getName} outside bucket $b")
    }
  }

  test("MERGE INTO a bucket-pinned table preserves the layout — the " +
    "mixed update+insert rewrite AND the insert-only pure append " +
    "both land bucketed, marked, and bucket-pure") {
    wh
    spark.sql("CREATE TABLE gb.mg (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(100).select($"id", $"id".as("v"))
      .createOrReplaceTempView("mg_src")
    spark.sql("INSERT INTO gb.mg SELECT * FROM mg_src")
    val root = rootOf("mg")
    def addedByStatement(stmt: String): Seq[String] = {
      val before = VersionedTable.readManifest(spark, root,
        VersionedTable.latestVersion(spark, root)).toSet
      spark.sql(stmt)
      VersionedTable.readManifest(spark, root,
        VersionedTable.latestVersion(spark, root)).filterNot(before)
    }
    def assertBucketPure(dirs: Seq[String]): Unit = {
      val marked = VersionedTable.bucketedDirs(spark, root)
      assert(dirs.nonEmpty && dirs.forall(marked.contains),
        s"dirs $dirs must be marked (marked=$marked)")
      val dataRoot = new java.io.File(root, "data")
      for (dir <- dirs; f <- new java.io.File(dataRoot, dir).listFiles()
          if f.getName.endsWith(".parquet")) {
        val b = GraftBucket.fileBucket(f.getName).get
        assert(spark.read.parquet(f.getAbsolutePath)
          .filter(GraftBucket.idColumn(col("id"), 4) =!= b)
          .count() == 0, s"file ${f.getName} outside bucket $b")
      }
    }
    spark.range(50, 150).select($"id", lit(-5L).as("v"))
      .createOrReplaceTempView("mg_changes")
    assertBucketPure(addedByStatement(
      s"MERGE INTO gb.mg t USING mg_changes c ON t.id = c.id " +
        "WHEN MATCHED THEN UPDATE SET v = c.v " +
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (c.id, c.v)"))
    assert(spark.sql("SELECT count(*) FROM gb.mg").as[Long].head == 150L)
    // insert-only MERGE (no key matches): the pure-append publish path
    spark.range(500, 520).select($"id", $"id".as("v"))
      .createOrReplaceTempView("mg_new")
    assertBucketPure(addedByStatement(
      s"MERGE INTO gb.mg t USING mg_new c ON t.id = c.id " +
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (c.id, c.v)"))
    assert(spark.sql("SELECT count(*) FROM gb.mg").as[Long].head == 170L)
    assert(spark.sql("SELECT sum(v) FROM gb.mg WHERE id BETWEEN 50 " +
      "AND 149").as[Long].head == -500L)
  }

  test("runtime bucket pruning (DSv2 dynamic pruning): a selective " +
    "broadcast dim join on the bucket key carries a runtime filter " +
    "and the fact scan reads ONLY the matched buckets' rows") {
    wh
    spark.sql("CREATE TABLE gb.rpf (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(1000).select($"id", $"id".as("v"))
      .createOrReplaceTempView("rpf_src")
    spark.sql("INSERT INTO gb.rpf SELECT * FROM rpf_src")
    spark.sql("CREATE TABLE gb.rpd (id BIGINT, w STRING)")
    spark.sql("INSERT INTO gb.rpd VALUES (17, 'hit'), (18, 'hit'), " +
      "(523, 'miss')")
    val joined = spark.sql(
      "SELECT f.id, f.v, d.w FROM gb.rpf f JOIN gb.rpd d " +
        "ON f.id = d.id WHERE d.w = 'hit'")
    assert(joined.collect().map(_.getLong(0)).toSet == Set(17L, 18L))
    // AQE wraps stages in leaf QueryStageExec nodes — recurse through
    // them, or collect() never reaches the scans
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec] = p.collect {
      case b: org.apache.spark.sql.execution.datasources.v2
        .BatchScanExec if b.runtimeFilters.nonEmpty => Seq(b)
      case q: org.apache.spark.sql.execution.adaptive
        .QueryStageExec => scans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => scans(a.executedPlan)
    }.flatten
    val finalPlan = joined.queryExecution.executedPlan
    val factScans = scans(finalPlan)
    assert(factScans.nonEmpty,
      s"fact scan must carry a runtime filter:\n$finalPlan")
    // rows actually read == rows living in the buckets of 17 and 18;
    // every other bucket's files never left the driver
    val hitBuckets = spark.createDataset(Seq(17L, 18L))
      .select(GraftBucket.idColumn($"value", 4)).as[Int].collect().toSet
    assert(hitBuckets.size < 4, "test premise: some bucket unmatched")
    val expected = spark.range(1000)
      .select(GraftBucket.idColumn($"id", 4).as("b"))
      .filter($"b".isin(hitBuckets.toSeq.map(Int.box): _*)).count()
    val read = factScans.map(_.metrics("numOutputRows").value).max
    assert(read == expected,
      s"runtime pruning must shrink the read to the matched buckets " +
        s"($expected rows), got $read")
  }

  test("single-file-per-bucket snapshots prove key ORDER too: the " +
    "co-bucketed join runs with no shuffle AND no sort; a second " +
    "append (two files per bucket) withdraws only the order claim") {
    wh
    spark.sql("CREATE TABLE gb.s1 (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("CREATE TABLE gb.s2 (id BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(400).select($"id", $"id".as("v"))
      .createOrReplaceTempView("s1_src")
    spark.sql("INSERT INTO gb.s1 SELECT * FROM s1_src")
    spark.sql("INSERT INTO gb.s2 SELECT id, id + 1 FROM s1_src")
    def join() = spark.sql(
      "SELECT a.id, a.v, b.w FROM gb.s1 a JOIN gb.s2 b ON a.id = b.id")
    noBroadcast {
      val plan = planOf(join())
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(!plan.contains("Sort ["),
        s"sorted single-file buckets must not re-sort:\n$plan")
      assert(join().count() == 400)
      // rows inside each file really are key-ascending (the physical
      // fact the claim stands on)
      val root = rootOf("s1")
      val dataRoot = new java.io.File(root, "data")
      for (dir <- VersionedTable.sortedDirs(spark, root);
          f <- new java.io.File(dataRoot, dir).listFiles()
          if f.getName.endsWith(".parquet")) {
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("id").as[Long].collect()
        assert(ids.sameElements(ids.sorted), s"unsorted file ${f.getName}")
      }
      // a second append doubles the files per bucket: partitioning
      // stays provable, ordering does not
      spark.sql("INSERT INTO gb.s1 SELECT id + 400, id FROM s1_src")
      val plan2 = planOf(join())
      assert(!plan2.contains("Exchange hashpartitioning"), plan2)
      assert(plan2.contains("Sort ["),
        s"two files per bucket cannot claim order:\n$plan2")
      assert(join().count() == 400)
    }
  }

  test("GROUP BY on the bucket key aggregates WITHOUT a shuffle — " +
    "KeyGroupedPartitioning satisfies the aggregation's distribution") {
    wh
    spark.sql("CREATE TABLE gb.ga (id BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(300).select(($"id" % 50).as("id"), $"id".as("v"))
      .createOrReplaceTempView("ga_src")
    spark.sql("INSERT INTO gb.ga SELECT * FROM ga_src")
    val agg = spark.sql(
      "SELECT id, count(*) AS n, sum(v) AS sv FROM gb.ga GROUP BY id")
    val plan = planOf(agg)
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-keyed aggregation still shuffles:\n$plan")
    assert(agg.count() == 50)
    assert(agg.filter($"id" === 7).select($"n")
      .as[Long].head() == 6L)
  }

  test("COUNT/MIN/MAX on a catalog table push into the parquet " +
    "footers — the plan carries PushedAggregation and answers match; " +
    "a filtered aggregate correctly refuses the shortcut") {
    wh
    spark.sql("CREATE TABLE gb.agg1 (id BIGINT, v BIGINT)")
    spark.range(500).select($"id", ($"id" * 2).as("v"))
      .createOrReplaceTempView("agg1_src")
    spark.sql("INSERT INTO gb.agg1 SELECT * FROM agg1_src")
    spark.sql("INSERT INTO gb.agg1 SELECT id + 500, id FROM agg1_src")
    val q = spark.sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi FROM gb.agg1")
    val (n, lo, hi) = q.as[(Long, Long, Long)].head()
    assert((n, lo, hi) == (1000L, 0L, 999L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate not pushed to the footers:\n$plan")
    // a data filter makes footer stats unusable — Spark must fall
    // back to the exact scan, never a wrong shortcut
    val filtered = spark.sql(
      "SELECT count(*) AS n FROM gb.agg1 WHERE id % 2 = 0")
    assert(filtered.as[Long].head() == 500L)
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("PushedAggregation: [COUNT(*)"))
    // composes with bucketing: same pushdown on a bucket-pinned table
    spark.sql("CREATE TABLE gb.agg2 (id BIGINT) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gb.agg2 SELECT id FROM agg1_src")
    val qb = spark.sql("SELECT count(*) AS n, max(id) AS hi FROM gb.agg2")
    assert(qb.as[(Long, Long)].head() == ((500L, 499L)))
    assert(qb.queryExecution.executedPlan.toString
      .contains("PushedAggregation: [COUNT(*)"))
  }

  test("the pin survives unrelated metadata commits and refuses a " +
    "schema that drops the key; keyless scans stay unaffected") {
    wh
    spark.sql("CREATE TABLE gb.p1 (id BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(2, id))")
    spark.sql("INSERT INTO gb.p1 VALUES (1, 'a'), (2, 'b')")
    val root = rootOf("p1")
    VersionedTable.addConstraint(spark, root, "ok", "id >= 0")
    assert(VersionedTable.bucketSpec(spark, root) == Some(("id", 2)))
    // a full rewrite whose schema drops the bucket key must refuse
    val e = intercept[Exception] {
      VersionedTable.commit(spark, root,
        spark.range(3).select($"id".as("other")),
        VersionedTable.latestVersion(spark, root))
    }
    assert(e.getMessage.contains("bucket key"))
    // count(*) prunes every column away — no key to anchor the
    // partitioning, and the scan must not break over it
    assert(spark.sql("SELECT count(*) FROM gb.p1").as[Long].head() == 2L)
  }
}
