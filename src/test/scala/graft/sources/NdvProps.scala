package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck invariants for the NDV sketch layer over RANDOM commit
  * histories: whatever sequence of appends / merges / deletes /
  * compactions a pinned table lives through, the unioned per-dir
  * sketches must equal the EXACT distinct count of the live snapshot
  * at every surviving version — exactly, because the generator's
  * cardinalities stay far below the HLL coupon-mode capacity, so any
  * mismatch is a bookkeeping bug (a stale carried sketch, a dropped
  * dir's sketch surviving, a rewrite not re-sketched), never sketch
  * noise. Small keyspace → heavy collisions, which is where
  * carry/recompute bugs live.
  *
  * Case count is bounded: each case commits a real table to disk and
  * runs ~a dozen Spark jobs.
  */
object NdvProps extends Properties("NdvStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxDiscardRatio(10f)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private sealed trait Op
  private case class Append(rows: List[(Long, String)]) extends Op
  private case class Merge(rows: List[(Long, String)], deletes: List[Long])
      extends Op
  private case class Delete(below: Long) extends Op
  private case object Compact extends Op

  private val rowGen = for {
    id <- Gen.choose(0L, 7L)
    t <- Gen.oneOf("a", "b", "c")
  } yield (id, t)

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.nonEmptyListOf(rowGen).map(rs =>
      Append(rs.take(4).zipWithIndex.map { case ((id, t), i) =>
        (id + 100L * (i + 1), t)
      })),
    3 -> (for {
      ups0 <- Gen.listOf(rowGen).map(_.take(3))
      dels0 <- Gen.listOf(Gen.choose(0L, 7L)).map(_.take(2))
    } yield {
      val ups = ups0.groupBy(_._1).map(_._2.head).toList
      val dels = dels0.distinct.filterNot(ups.map(_._1).contains)
      Merge(ups, dels)
    }),
    2 -> Gen.choose(1L, 6L).map(Delete(_)),
    1 -> Gen.const(Compact))

  private val historyGen = for {
    init <- Gen.nonEmptyListOf(rowGen).map(_.take(5))
    enableAt <- Gen.choose(0, 2)
    ops <- Gen.listOfN(4, opGen)
  } yield (init, enableAt, ops)

  private def exactNdv(root: String, v: Int): (Long, Long) = {
    val r = VersionedTable.read(spark, root, Some(v))
      .agg(countDistinct(col("id")), countDistinct(col("text"))).head()
    (r.getLong(0), r.getLong(1))
  }

  property("the unioned sketches equal the exact snapshot NDV at " +
      "every post-enable version, on any append/merge/delete/compact " +
      "history (coupon-mode cardinalities: exact, not approximate)") =
    Prop.forAllNoShrink(historyGen) { case (init0, enableAt, ops) =>
      // merge requires unique keys in the snapshot it reads — the op
      // stream keeps them unique; dedup the init batch
      val init = init0.groupBy(_._1).map(_._2.head).toList
      val root = java.nio.file.Files
        .createTempDirectory("graft_ndvprop").resolve("t").toString
      VersionedTable.init(spark, root, init.toDF("id", "text"))
      var enabled = enableAt == 0
      if (enabled) VersionedTable.enableNdvStats(spark, root)
      var step = 0
      val checks = ops.map { op =>
        step += 1
        if (!enabled && step == enableAt) {
          VersionedTable.enableNdvStats(spark, root)
          enabled = true
        }
        op match {
          case Append(rows) =>
            VersionedTable.append(spark, root, rows.toDF("id", "text"),
              VersionedTable.latestVersion(spark, root))
          case Merge(ups, dels) =>
            val cs = ups.map { case (id, t) => (id, t, "U") } ++
              dels.map(id => (id, "", "D"))
            if (cs.nonEmpty) VersionedTable.merge(spark, root,
              cs.toDF("id", "text", "op"), "id")
          case Delete(below) =>
            VersionedTable.delete(spark, root, col("id") < below)
          case Compact =>
            VersionedTable.compact(spark, root)
        }
        val v = VersionedTable.latestVersion(spark, root)
        val ndv = VersionedTable.tableNdv(spark, root, Some(v))
        if (!enabled)
          (ndv.isEmpty: Prop) :| s"v$v: estimates before enable"
        else if (VersionedTable.read(spark, root, Some(v)).isEmpty)
          // an empty snapshot has no data-bearing dirs — any report
          // must be empty-or-absent, never a stale positive
          (ndv.getOrElse("id", 0L) == 0L ||
            ndv.isEmpty: Prop) :| s"v$v: stale NDV on empty snapshot"
        else {
          val (ids, texts) = exactNdv(root, v)
          ((ndv.get("id").contains(ids) &&
            ndv.get("text").contains(texts)): Prop) :|
            s"v$v: sketch union ${ndv.get("id")}/${ndv.get("text")} " +
              s"!= exact $ids/$texts"
        }
      }
      checks.reduce(_ && _)
    }
}
