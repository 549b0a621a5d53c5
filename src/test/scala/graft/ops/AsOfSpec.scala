package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  // left: lookups at t; right: quotes (key, ts, px)
  private lazy val left = Seq(
    (1L, 10L, "a"), // after two quotes -> latest at 7
    (1L, 5L, "b"),  // exactly on a quote ts -> inclusive match
    (1L, 1L, "c"),  // before any quote -> null
    (2L, 100L, "d"), // other key, one quote before
    (3L, 50L, "e"),  // key with no quotes at all -> null
  ).toDF("k", "lts", "tag")

  private lazy val right = Seq(
    (1L, 5L, 500.0),
    (1L, 7L, 700.0),
    (1L, 11L, 1100.0), // in the future of every lookup -> never matched
    (2L, 90L, 900.0),
  ).toDF("k", "rts", "px")

  test("as-of join: latest right row at-or-before each left row") {
    val r = AsOf.asofJoin(left, right, "k", "lts", "rts", Seq("px", "rts"))
      .collect().map(x => x.getString(2) ->
        (if (x.isNullAt(3)) None else Some((x.getDouble(3), x.getLong(4))))).toMap
    assert(r("a").contains((700.0, 7L)))
    assert(r("b").contains((500.0, 5L))) // inclusive at equal ts
    assert(r("c").isEmpty)               // nothing precedes
    assert(r("d").contains((900.0, 90L)))
    assert(r("e").isEmpty)               // key absent from right
  }

  test("forward as-of join: earliest right row at-or-after each left row") {
    val r = AsOf.asofJoinForward(left, right, "k", "lts", "rts",
        Seq("px", "rts"))
      .collect().map(x => x.getString(2) ->
        (if (x.isNullAt(3)) None else Some((x.getDouble(3), x.getLong(4))))).toMap
    assert(r("a").contains((1100.0, 11L))) // next quote after t=10
    assert(r("b").contains((500.0, 5L)))   // inclusive at equal ts
    assert(r("c").contains((500.0, 5L)))   // everything is ahead of t=1
    assert(r("d").isEmpty)                 // no quote at/after t=100
    assert(r("e").isEmpty)                 // key absent from right
  }

  test("forward as-of matches a per-row scan oracle on random data") {
    val rng = new scala.util.Random(43)
    val ls = Seq.tabulate(200)(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i.toLong))
    val rs = Seq.tabulate(300)(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i.toDouble))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val got = AsOf.asofJoinForward(ls.toDF("k", "lts", "row"),
        rs.toDF("k", "rts", "v"), "k", "lts", "rts", Seq("v"))
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    ls.foreach { case (k, lts, row) =>
      val expect = rs.filter(r => r._1 == k && r._2 >= lts)
        .sortBy(r => (r._2, -r._3)).headOption.map(_._3)
      assert(got(row) == expect, s"row $row key $k ts $lts")
    }
  }

  test("as-of join matches a per-row scan oracle on random data") {
    val rng = new scala.util.Random(42)
    val ls = Seq.tabulate(200)(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i.toLong))
    val rs = Seq.tabulate(300)(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i.toDouble))
      // one row per (key, ts): the documented precondition
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val lDf = ls.toDF("k", "lts", "row")
    val rDf = rs.toDF("k", "rts", "v")
    val got = AsOf.asofJoin(lDf, rDf, "k", "lts", "rts", Seq("v"))
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    ls.foreach { case (k, lts, row) =>
      val expect = rs.filter(r => r._1 == k && r._2 <= lts)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(row) == expect, s"row $row key $k ts $lts")
    }
  }
}
