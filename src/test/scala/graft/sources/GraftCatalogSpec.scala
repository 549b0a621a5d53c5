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

  test("DELETE FROM runs the stats-pruned copy-on-write delete; " +
    "untranslatable predicates refuse at analysis") {
    wh
    spark.sql("CREATE TABLE graft.t3 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.t3 SELECT id, CAST(id AS STRING) " +
      "FROM range(10)")
    spark.sql("DELETE FROM graft.t3 WHERE id >= 7")
    assert(spark.sql("SELECT count(*) FROM graft.t3").as[Long].head == 7L)
    assert(VersionedTable.commitOp(spark, rootOf("t3"),
      VersionedTable.latestVersion(spark, rootOf("t3"))).contains("delete"))
    // id % 2 = 0 has no v1-Filter translation → loud refusal, never a
    // silent wrong/approximate delete
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graft.t3 WHERE id % 2 = 0")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))
    assert(spark.sql("SELECT count(*) FROM graft.t3").as[Long].head == 7L)
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

  test("SHOW TABLES lists, DROP TABLE removes, ALTER refuses with the " +
    "evolution recipe, RENAME moves the root") {
    wh
    spark.sql("CREATE TABLE graft.t6 (id BIGINT)")
    val names = spark.sql("SHOW TABLES IN graft")
      .select("tableName").as[String].collect().toSet
    assert(names.contains("t6"))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.t6 ADD COLUMN s STRING")
    }
    assert(e.getMessage.contains("evolve"))
    spark.sql("ALTER TABLE graft.t6 RENAME TO t6b")
    assert(spark.sql("SELECT count(*) FROM graft.t6b").as[Long].head == 0L)
    spark.sql("DROP TABLE graft.t6b")
    val after = spark.sql("SHOW TABLES IN graft")
      .select("tableName").as[String].collect().toSet
    assert(!after.contains("t6b") && !after.contains("t6"))
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
