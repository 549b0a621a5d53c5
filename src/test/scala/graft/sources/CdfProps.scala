package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck invariants for the change feed over RANDOM commit
  * histories — the fixed-history fold test generalized: whatever
  * sequence of appends/merges/compactions a table lives through, the
  * feed between ANY two surviving versions must fold the earlier
  * snapshot exactly onto the later one, never delete a missing row,
  * and deletes must be impossible across append-only ranges.
  *
  * Case count is bounded (each case commits a real table to disk and
  * runs ~a dozen Spark jobs); the generator's keyspace is small so
  * collisions — updates, re-inserts, duplicate rows — are FREQUENT,
  * which is where diff bugs live.
  */
object CdfProps extends Properties("ChangeFeed") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10f)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private sealed trait Op
  private case class Append(rows: List[(Long, String)]) extends Op
  private case class Merge(rows: List[(Long, String)], deletes: List[Long])
      extends Op
  // row-level range delete: the op whose rewrite can SPLIT a dir into
  // carried file references — its CDC removed-set must be computed at
  // file granularity or carried rows surface as phantom deletes
  private case class RangeDelete(lo: Long, hi: Long) extends Op
  private case object Compact extends Op

  private val rowGen = for {
    id <- Gen.choose(0L, 7L)
    t <- Gen.oneOf("a", "b", "c")
  } yield (id, t)

  private val opGen: Gen[Op] = Gen.frequency(
    // appends must not collide with snapshot ids (append is the
    // new-rows path); shift into a disjoint id range
    4 -> Gen.nonEmptyListOf(rowGen).map(rs =>
      Append(rs.take(4).zipWithIndex.map { case ((id, t), i) =>
        (id + 100L * (i + 1), t)
      })),
    4 -> (for {
      ups0 <- Gen.listOf(rowGen).map(_.take(3))
      dels0 <- Gen.listOf(Gen.choose(0L, 7L)).map(_.take(2))
    } yield {
      // the merge contract refuses duplicate changeset keys (latest-
      // wins is undefined without a versionCol): one op per key
      val ups = ups0.groupBy(_._1).map(_._2.head).toList
      val dels = dels0.distinct.filterNot(ups.map(_._1).contains)
      Merge(ups, dels)
    }),
    2 -> (for {
      lo <- Gen.choose(0L, 7L); w <- Gen.choose(0L, 3L)
    } yield RangeDelete(lo, lo + w)),
    1 -> Gen.const(Compact))

  private val historyGen = for {
    init <- Gen.nonEmptyListOf(rowGen).map(_.take(5))
    ops <- Gen.listOfN(3, opGen)
  } yield (init, ops)

  private def build(init: List[(Long, String)], ops: List[Op]): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdfprop").resolve("t").toString
    VersionedTable.init(spark, root, init.toDF("id", "text"))
    ops.foreach {
      case Append(rows) =>
        VersionedTable.append(spark, root, rows.toDF("id", "text"),
          VersionedTable.latestVersion(spark, root))
      case Merge(ups, dels) =>
        val cs = ups.map { case (id, t) => (id, t, "U") } ++
          dels.map(id => (id, "", "D"))
        if (cs.nonEmpty)
          VersionedTable.merge(spark, root, cs.toDF("id", "text", "op"), "id")
      case RangeDelete(lo, hi) =>
        VersionedTable.delete(spark, root,
          col("id").between(lo, hi)): Unit
      case Compact =>
        VersionedTable.compact(spark, root)
    }
    root
  }

  private def multiset(root: String, v: Int): Map[(Long, String), Int] =
    VersionedTable.read(spark, root, Some(v)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

  private def folds(root: String, from: Int, to: Int): Prop = {
    val acc = scala.collection.mutable.Map(multiset(root, from).toSeq: _*)
    var undeleted = List.empty[(Long, String)]
    VersionedTable.changesBetween(spark, root, from, to).collect().foreach {
      r =>
        val key = (r.getLong(0), r.getString(1))
        val d = if (r.getString(2) == "insert") 1 else -1
        acc(key) = acc.getOrElse(key, 0) + d
        if (acc(key) < 0) undeleted ::= key
    }
    (undeleted.isEmpty :| s"feed $from->$to deleted missing rows $undeleted") &&
      ((acc.filter(_._2 != 0).toMap == multiset(root, to)) :|
        s"feed $from->$to does not fold")
  }

  property("feed folds from->to for the full range and a middle pair, " +
      "on any append/merge/delete/compact history") =
    Prop.forAllNoShrink(historyGen) { case (init, ops) =>
      val root = build(init, ops)
      val latest = VersionedTable.latestVersion(spark, root)
      val mid = latest / 2
      folds(root, 0, latest) && folds(root, mid, latest) &&
        folds(root, mid, mid)
    }

  property("with commit-time CDC files enabled, every single-step " +
      "keyed feed (file-served for rewrites) remapped to delete/insert " +
      "equals the unkeyed content diff — two serving regimes, one " +
      "multiset of changes") =
    Prop.forAllNoShrink(historyGen) { case (init0, ops0) =>
      // the CDC pin requires key uniqueness: dedup the init batch and
      // give every append op globally fresh ids
      val init = init0.groupBy(_._1).map(_._2.head).toList
      var fresh = 1000L
      val ops = ops0.map {
        case Append(rows) => Append(rows.map { case (_, t) =>
          fresh += 1; (fresh, t)
        })
        case other => other
      }
      val root = java.nio.file.Files
        .createTempDirectory("graft_cdcfprop").resolve("t").toString
      VersionedTable.init(spark, root, init.toDF("id", "text"))
      VersionedTable.enableChangeFeed(spark, root, "id")
      ops.foreach {
        case Append(rows) =>
          VersionedTable.append(spark, root, rows.toDF("id", "text"),
            VersionedTable.latestVersion(spark, root))
        case Merge(ups, dels) =>
          val cs = ups.map { case (id, t) => (id, t, "U") } ++
            dels.map(id => (id, "", "D"))
          if (cs.nonEmpty)
            VersionedTable.merge(spark, root,
              cs.toDF("id", "text", "op"), "id")
        case RangeDelete(lo, hi) =>
          VersionedTable.delete(spark, root,
            col("id").between(lo, hi)): Unit
        case Compact =>
          VersionedTable.compact(spark, root)
      }
      val latest = VersionedTable.latestVersion(spark, root)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def signed(df: org.apache.spark.sql.DataFrame, keyed: Boolean)
          : Map[(Long, String), Int] =
        df.collect().toSeq.map { r =>
          val sign = r.getString(2) match {
            case "insert" | "update_postimage" => 1
            case "delete" | "update_preimage" => -1
          }
          ((r.getLong(0), r.getString(1)), sign)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
          .filter(_._2 != 0).toMap
      Prop.all((2 to latest).map { v =>
        // every rewrite version past the pin materialized its file
        val dropped = VersionedTable
          .readManifest(spark, root, v - 1)
          .exists(d => !VersionedTable.readManifest(spark, root, v)
            .contains(d))
        val fileThere = VersionedTable
          .changeFilePathIfExists(spark, root, v).isDefined
        val keyed = signed(VersionedTable.changesBetween(
          spark, root, v - 1, v, key = Some("id"))
          .select("id", "text", "change_kind"), keyed = true)
        val unkeyed = signed(VersionedTable.changesBetween(
          spark, root, v - 1, v)
          .select("id", "text", "change_kind"), keyed = false)
        ((!dropped || fileThere) :|
          s"rewrite v$v did not materialize its change file") &&
          ((keyed == unkeyed) :|
            s"v$v keyed(file) != content diff: $keyed vs $unkeyed")
      }: _*)
    }

  property("append-only histories never produce a delete and take the " +
      "no-shuffle path") =
    Prop.forAllNoShrink(historyGen) { case (init, ops) =>
      val appendsOnly = ops.collect { case a: Append => a }
      val root = build(init, appendsOnly)
      val latest = VersionedTable.latestVersion(spark, root)
      val feed = VersionedTable.changesBetween(spark, root, 0, latest)
      val kinds = feed.select("change_kind").distinct()
        .collect().map(_.getString(0)).toSet
      val plan = feed.queryExecution.executedPlan.toString
      (kinds.subsetOf(Set("insert")) :| s"append-only range emitted $kinds") &&
        ((!plan.contains("Exchange")) :| "append fast path shuffled") &&
        folds(root, 0, latest)
    }
}
