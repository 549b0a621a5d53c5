package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck invariants for the quantile sketch layer over RANDOM
  * commit histories: below KLL's compaction threshold the sketch
  * retains every item, so at every post-enable version the served
  * extremes must EQUAL the live snapshot's true min/max and the
  * median must be a value the snapshot actually contains in the
  * middle band — any violation is carry/recompute bookkeeping, not
  * sketch noise. */
object QuantileProps extends Properties("QuantileStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4).withMaxDiscardRatio(10f)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private sealed trait Op
  private case class Append(rows: List[(Long, String)]) extends Op
  private case class Delete(below: Long) extends Op
  private case object Compact extends Op

  private val rowGen = for {
    id <- Gen.choose(0L, 30L)
    t <- Gen.oneOf("a", "b")
  } yield (id, t)

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.nonEmptyListOf(rowGen).map(rs =>
      Append(rs.take(4).zipWithIndex.map { case ((id, t), i) =>
        (id + 100L * (i + 1), t)
      })),
    2 -> Gen.choose(1L, 25L).map(Delete(_)),
    1 -> Gen.const(Compact))

  private val historyGen = for {
    init <- Gen.nonEmptyListOf(rowGen).map(_.take(6))
    ops <- Gen.listOfN(4, opGen)
  } yield (init, ops)

  property("served extremes equal the snapshot's true min/max at " +
      "every post-enable version of any append/delete/compact history") =
    Prop.forAllNoShrink(historyGen) { case (init, ops) =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_kllprop").resolve("t").toString
      VersionedTable.init(spark, root, init.toDF("id", "text"))
      VersionedTable.enableQuantileStats(spark, root, Seq("id"))
      val checks = ops.map { op =>
        op match {
          case Append(rows) =>
            VersionedTable.append(spark, root, rows.toDF("id", "text"),
              VersionedTable.latestVersion(spark, root))
          case Delete(below) =>
            VersionedTable.delete(spark, root, col("id") < below)
          case Compact =>
            VersionedTable.compact(spark, root)
        }
        val v = VersionedTable.latestVersion(spark, root)
        val snap = VersionedTable.read(spark, root, Some(v))
        val served = VersionedTable.tableQuantiles(spark, root, "id",
          Seq(0.0, 0.5, 1.0), Some(v))
        if (snap.isEmpty)
          (served.isEmpty: Prop) :| s"v$v: estimates on empty snapshot"
        else {
          val r = snap.agg(min(col("id")), max(col("id"))).head()
          val (lo, hi) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
          val ids = snap.select(col("id")).as[Long].collect().sorted
          served match {
            case None => Prop.falsified :| s"v$v: no estimates served"
            case Some(q) =>
              ((q(0) == lo && q(2) == hi): Prop) :|
                s"v$v: extremes $q != true [$lo, $hi]" &&
                (ids.contains(q(1).toLong): Prop) :|
                s"v$v: median ${q(1)} not a value of the snapshot"
          }
        }
      }
      checks.reduce(_ && _)
    }
}
