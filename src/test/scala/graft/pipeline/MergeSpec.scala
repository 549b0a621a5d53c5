package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private lazy val snapshot = Seq(
    (1L, "alpha", 10L), (2L, "beta", 20L), (3L, "gamma", 30L),
    (4L, "delta", 40L)).toDF("id", "body", "sz")

  test("applyChangeset: upsert replaces, delete removes, insert adds") {
    val cs = Seq(
      (2L, "beta-v2", 21L, "U"),  // update
      (3L, "", 0L, "D"),          // delete
      (9L, "iota", 90L, "U"))     // insert
      .toDF("id", "body", "sz", "op")
    val got = Merge.applyChangeset(snapshot, cs, "id")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "alpha", 10L), (2L, "beta-v2", 21L),
      (4L, "delta", 40L), (9L, "iota", 90L)))
  }

  test("applyChangeset: latest version wins; delete beats upsert at a tied version") {
    val cs = Seq(
      (2L, "beta-v2", 21L, "U", 1L), (2L, "beta-v3", 22L, "U", 2L),
      (3L, "ghost", 99L, "U", 5L), (3L, "", 0L, "D", 5L))
      .toDF("id", "body", "sz", "op", "ver")
    val got = Merge.applyChangeset(snapshot, cs, "id",
        versionCol = Some("ver"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "alpha", 10L), (2L, "beta-v3", 22L),
      (4L, "delta", 40L)))
  }

  test("applyChangeset: an unknown op value fails loudly, not silently") {
    val cs = Seq((2L, "x", 0L, "UPSERT")).toDF("id", "body", "sz", "op")
    val e = intercept[Exception] {
      Merge.applyChangeset(snapshot, cs, "id").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("UPSERT")), e.toString)
  }

  test("applyChangeset: duplicate changeset keys without versionCol fail loudly") {
    // without a version column latest-wins is undefined — the merge
    // must refuse, not keep both rows in the "deduplicated" snapshot
    val cs = Seq((2L, "beta-v2", 21L, "U"), (2L, "beta-v3", 22L, "U"))
      .toDF("id", "body", "sz", "op")
    val e = intercept[Exception] {
      Merge.applyChangeset(snapshot, cs, "id").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("duplicate")),
      e.toString)
    // the same changeset WITH a version column collapses cleanly
    val versioned = Seq((2L, "beta-v2", 21L, "U", 1L),
      (2L, "beta-v3", 22L, "U", 2L)).toDF("id", "body", "sz", "op", "ver")
    val got = Merge.applyChangeset(snapshot, versioned, "id",
        versionCol = Some("ver"))
      .filter(col("id") === 2L).as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((2L, "beta-v3", 22L)))
  }

  test("applyChangeset: the key eviction broadcasts — the snapshot never shuffles") {
    val cs = Seq((2L, "beta-v2", 21L, "U")).toDF("id", "body", "sz", "op")
    val p = Merge.applyChangeset(snapshot, cs, "id")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"), "anti join fell back to shuffle")
  }

  test("applyChangeset: empty changeset is the identity") {
    val cs = Seq.empty[(Long, String, Long, String)]
      .toDF("id", "body", "sz", "op")
    val got = Merge.applyChangeset(snapshot, cs, "id")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "alpha", 10L), (2L, "beta", 20L),
      (3L, "gamma", 30L), (4L, "delta", 40L)))
  }
}
