package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints on the versioned table: enforced on the files
  * each commit writes, BEFORE its manifest lands — a violating write
  * refuses atomically and no reader ever sees a violating snapshot. */
class ConstraintSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vconstraint").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  test("addConstraint validates existing data: a broken guarantee is " +
    "refused and the table is unchanged") {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      Seq((1L, 10), (2L, -5)).toDF("id", "n"))
    val e = intercept[IllegalStateException] {
      VersionedTable.addConstraint(spark, root, "n_pos", "n > 0")
    }
    assert(e.getMessage.contains("n_pos") &&
      e.getMessage.contains("1 row(s)"))
    assert(VersionedTable.latestVersion(spark, root) == 0)
    assert(VersionedTable.constraints(spark, root).isEmpty)
  }

  test("a commit the constraint expression cannot even ANALYZE against " +
    "(schema dropped the constrained column) refuses atomically: no " +
    "version, no orphan dir") {
    val root = freshRoot()
    VersionedTable.init(spark, root, Seq((1L, 10)).toDF("id", "n"))
    VersionedTable.addConstraint(spark, root, "n_pos", "n > 0")
    val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
    val fs = dataRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirsBefore = fs.listStatus(dataRoot).map(_.getPath.getName).toSet
    // a full rewrite whose schema drops `n`: checkViolations throws an
    // AnalysisException — pre-fix the already-written dir was orphaned
    // until a vacuum; the atomic-refusal contract requires cleanup
    intercept[Exception] {
      VersionedTable.commit(spark, root, Seq((1L, "x")).toDF("id", "s"),
        expectedVersion = 1)
    }
    assert(VersionedTable.latestVersion(spark, root) == 1)
    val dirsAfter = fs.listStatus(dataRoot).map(_.getPath.getName).toSet
    assert(dirsAfter == dirsBefore,
      s"orphaned commit dir left behind: ${dirsAfter -- dirsBefore}")
  }

  test("a violating append refuses atomically: no new version, no " +
    "orphan data, error names the constraint; valid appends pass") {
    val root = freshRoot()
    VersionedTable.init(spark, root, Seq((1L, 10)).toDF("id", "n"))
    VersionedTable.addConstraint(spark, root, "n_pos", "n > 0")
    assert(VersionedTable.latestVersion(spark, root) == 1)
    val e = intercept[IllegalStateException] {
      VersionedTable.append(spark, root,
        Seq((2L, 7), (3L, -1)).toDF("id", "n"), expectedVersion = 1)
    }
    assert(e.getMessage.contains("n_pos") && e.getMessage.contains("n > 0"))
    assert(VersionedTable.latestVersion(spark, root) == 1)
    // no orphan commit dir survives the refusal
    val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
    val fs = dataRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(dataRoot).length ==
      VersionedTable.dataDirs(spark, root).size)
    VersionedTable.append(spark, root,
      Seq((2L, 7)).toDF("id", "n"), expectedVersion = 1)
    assert(VersionedTable.read(spark, root).count() == 2)
  }

  test("constraints carry through append/compact/DML and NULL counts " +
    "as a violation (the NOT NULL spelling works)") {
    val root = freshRoot()
    VersionedTable.init(spark, root,
      Seq((1L, Some("a"))).toDF("id", "s"))
    VersionedTable.addConstraint(spark, root, "s_set", "s IS NOT NULL")
    VersionedTable.append(spark, root,
      Seq((2L, Some("b"))).toDF("id", "s"), expectedVersion = 1)
    VersionedTable.compact(spark, root)
    // carried through both commits
    assert(VersionedTable.constraints(spark, root)
      .contains("s_set" -> "s IS NOT NULL"))
    // an UPDATE that would null the column refuses
    val e = intercept[IllegalStateException] {
      VersionedTable.update(spark, root, col("id") === 2L,
        Seq("s" -> lit(null)))
    }
    assert(e.getMessage.contains("s_set"))
    assert(VersionedTable.read(spark, root)
      .filter(col("s").isNull).count() == 0)
  }

  test("dropConstraint lifts enforcement; history keeps each version's " +
    "constraint set; restore restores the target's set") {
    val root = freshRoot()
    VersionedTable.init(spark, root, Seq((1L, 10)).toDF("id", "n")) // v0
    VersionedTable.addConstraint(spark, root, "n_pos", "n > 0") // v1
    VersionedTable.dropConstraint(spark, root, "n_pos") // v2
    VersionedTable.append(spark, root,
      Seq((2L, -1)).toDF("id", "n"), expectedVersion = 2) // v3: allowed now
    assert(VersionedTable.read(spark, root).count() == 2)
    assert(VersionedTable.constraints(spark, root, Some(1))
      .contains("n_pos" -> "n > 0"))
    assert(VersionedTable.constraints(spark, root, Some(2)).isEmpty)
    // restore to v1 restores its constraint set (and its data)
    VersionedTable.restore(spark, root, 1) // v4
    assert(VersionedTable.constraints(spark, root)
      .contains("n_pos" -> "n > 0"))
    val e = intercept[IllegalStateException] {
      VersionedTable.append(spark, root,
        Seq((3L, -2)).toDF("id", "n"), expectedVersion = 4)
    }
    assert(e.getMessage.contains("n_pos"))
  }

  test("duplicate names and malformed names refuse; one scan checks " +
    "many constraints") {
    val root = freshRoot()
    VersionedTable.init(spark, root, Seq((1L, 10, "x")).toDF("id", "n", "s"))
    VersionedTable.addConstraint(spark, root, "n_pos", "n > 0")
    intercept[IllegalArgumentException] {
      VersionedTable.addConstraint(spark, root, "n_pos", "n > 1")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.addConstraint(spark, root, "a:b", "n > 0")
    }
    VersionedTable.addConstraint(spark, root, "s_set", "s IS NOT NULL")
    // a batch violating BOTH reports both names
    val e = intercept[IllegalStateException] {
      VersionedTable.append(spark, root,
        Seq((2L, -1, null.asInstanceOf[String])).toDF("id", "n", "s"),
        expectedVersion = 2)
    }
    assert(e.getMessage.contains("n_pos") && e.getMessage.contains("s_set"))
  }
}
