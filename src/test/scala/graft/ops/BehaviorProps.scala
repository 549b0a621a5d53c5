package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck invariants for the event-behavior family: structural
  * truths that must hold on ANY event set, not just BehaviorSpec's
  * hand-built fixtures. Uses the shared test session (graft.SparkSpec). */
object BehaviorProps extends Properties("Behavior") {

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val eventGen = for {
    user <- Gen.choose(1L, 6L)
    tpe <- Gen.oneOf("a", "b", "c")
    sec <- Gen.choose(0, 5000)
  } yield (user, tpe, new java.sql.Timestamp(1700000000000L + sec * 1000L))

  private val eventsGen = Gen.nonEmptyListOf(eventGen).map(_.take(60))

  property("funnel counts never grow down the steps; step 1 is exact") =
    Prop.forAllNoShrink(eventsGen) { evs =>
      val df = evs.toDF("user_id", "event_type", "ts")
      val counts = Behavior.funnel(df, Seq("a", "b", "c"))
        .orderBy("step_idx").select("users").as[Long].collect().toSeq
      val ua = evs.filter(_._2 == "a").map(_._1).distinct.size.toLong
      (counts.size == 3) :| s"3 rows: $counts" &&
        counts.sliding(2).forall(p => p(0) >= p(1)) :| s"monotone: $counts" &&
        (counts.head == ua) :| s"step1 ${counts.head} != distinct-a $ua"
    }

  property("retention cells partition the distinct (user, day) set") =
    Prop.forAllNoShrink(eventsGen) { evs =>
      val df = evs.toDF("user_id", "event_type", "ts")
      val cells = Behavior.retention(df).collect()
      val total = cells.map(_.getLong(2)).sum
      val want = evs.map(e =>
        (e._1, e._3.toInstant.toString.take(10))).distinct.size.toLong
      val cohorts = cells.map(_.getLong(0)).distinct
      val day0 = cells.filter(_.getLong(1) == 0L).map(_.getLong(0)).toSet
      (total == want) :| s"cells sum $total != user-days $want" &&
        cohorts.forall(day0.contains) :| "a cohort lacks its day 0" &&
        cells.forall(_.getLong(1) >= 0L) :| "negative offset"
    }
}
