package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck invariants for row-level DML over RANDOM histories: any
  * interleaving of append / delete / update / compact / restore must
  * leave every surviving version's content equal to an in-memory
  * model's snapshot at that point — the stats-pruned partial rewrite
  * (which dirs get touched depends on envelope geometry the generator
  * varies freely) must be answer-invisible, and restore must land
  * exactly on the modeled earlier state.
  *
  * Case count is bounded (each case commits a real table to disk);
  * the id space is small and ranges overlap dirs arbitrarily, so
  * partially-affected commits — the interesting rewrite geometry —
  * are frequent.
  */
object DmlProps extends Properties("VersionedDml") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10f)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private sealed trait Op
  private case class Append(rows: List[(Long, String)]) extends Op
  private case class Delete(lo: Long, hi: Long) extends Op
  private case class Update(lo: Long, hi: Long, t: String) extends Op
  private case object Compact extends Op
  private case object CompactSmall extends Op
  private case class RestoreRel(j: Int) extends Op // index into history

  private val rowGen = for {
    id <- Gen.choose(0L, 19L)
    t <- Gen.oneOf("a", "b", "c")
  } yield (id, t)

  private val rangeGen = for {
    lo <- Gen.choose(0L, 19L)
    w <- Gen.choose(0L, 8L)
  } yield (lo, lo + w)

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.nonEmptyListOf(rowGen).map(rs =>
      Append(rs.take(3).zipWithIndex.map { case ((id, t), i) =>
        (id + 100L * (i + 1), t) // disjoint from snapshot ids
      })),
    3 -> rangeGen.map { case (lo, hi) => Delete(lo, hi) },
    3 -> (for { (lo, hi) <- rangeGen; t <- Gen.oneOf("X", "Y") }
      yield Update(lo, hi, t)),
    1 -> Gen.const(Compact),
    1 -> Gen.const(CompactSmall),
    1 -> Gen.choose(0, 10).map(RestoreRel))

  private val historyGen = for {
    init <- Gen.nonEmptyListOf(rowGen).map(_.take(6))
    ops <- Gen.listOfN(4, opGen)
  } yield (init, ops)

  private def multiset(root: String, v: Int): Map[(Long, String), Int] =
    VersionedTable.read(spark, root, Some(v)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

  property("every surviving version equals the model snapshot under " +
      "random append/delete/update/compact/restore histories") =
    Prop.forAllNoShrink(historyGen) { case (init, ops) =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_dmlprop").resolve("t").toString
      type Model = Map[(Long, String), Int]
      def toModel(rows: Seq[(Long, String)]): Model =
        rows.groupBy(identity).view.mapValues(_.length).toMap
      VersionedTable.init(spark, root, init.toDF("id", "text"))
      // snapshots(v) = modeled content of version v
      val snapshots = scala.collection.mutable.ArrayBuffer[Model](
        toModel(init))
      def cur = snapshots.last
      ops.foreach {
        case Append(rows) =>
          VersionedTable.append(spark, root, rows.toDF("id", "text"),
            VersionedTable.latestVersion(spark, root))
          snapshots += rows.foldLeft(cur) { case (m, r) =>
            m.updated(r, m.getOrElse(r, 0) + 1)
          }
        case Delete(lo, hi) =>
          val before = VersionedTable.latestVersion(spark, root)
          val v = VersionedTable.delete(spark, root,
            col("id").between(lo, hi))
          val next = cur.filterNot { case ((id, _), _) =>
            id >= lo && id <= hi }
          // a provably-empty match is a no-op: no version, no snapshot
          if (v != before) snapshots += next
          else if (next != cur)
            sys.error(s"delete [$lo,$hi] was a no-op but the model says " +
              "rows matched — pruning dropped a live dir")
        case Update(lo, hi, t) =>
          val before = VersionedTable.latestVersion(spark, root)
          val v = VersionedTable.update(spark, root,
            col("id").between(lo, hi), Seq("text" -> lit(t)))
          val next = toModel(cur.toSeq.flatMap { case ((id, tx), n) =>
            Seq.fill(n)((id, if (id >= lo && id <= hi) t else tx))
          })
          if (v != before) snapshots += next
          else if (next != cur)
            sys.error(s"update [$lo,$hi] was a no-op but the model says " +
              "rows matched — pruning dropped a live dir")
        case Compact =>
          VersionedTable.compact(spark, root)
          snapshots += cur
        case CompactSmall =>
          // data-equivalent like compact, but may be a true no-op
          // (fewer than two small dirs) — the model only advances
          // when a version committed
          val before = VersionedTable.latestVersion(spark, root)
          val v = VersionedTable.compactSmall(spark, root,
            smallDirMaxRows = 4L)
          if (v != before) snapshots += cur
        case RestoreRel(j) =>
          val target = j % snapshots.length
          VersionedTable.restore(spark, root, target)
          snapshots += snapshots(target)
      }
      val latest = VersionedTable.latestVersion(spark, root)
      ((latest == snapshots.length - 1) :|
        s"version count ${latest + 1} != modeled ${snapshots.length}") && {
        val mismatches = (0 to latest).filter(v =>
          multiset(root, v) != snapshots(v))
        mismatches.isEmpty :| s"versions $mismatches diverge from the model"
      }
    }
}
