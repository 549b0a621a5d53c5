package graft.plans

import graft.SparkSpec
import graft.ops.{GroupedMedian, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GroupedMedianPlanSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def canon(df: DataFrame): Seq[(String, Double, Long)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2)).toSeq

  test("the custom physical operator matches the RDD operator and the window spelling") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_returnflag"), col("l_extendedprice"))
    val viaPlanner = canon(GroupedMedianPlan.exactMedian(li, "l_returnflag", "l_extendedprice"))
    val viaOp = canon(GroupedMedian.exactMedian(li, "l_returnflag", "l_extendedprice"))
    assert(viaPlanner.nonEmpty && viaPlanner == viaOp)
  }

  test("random data with ties and multi-partition groups: parity holds") {
    val rng = new scala.util.Random(7)
    val df = (0 until 5000)
      .map(_ => (s"g${rng.nextInt(4)}", (rng.nextInt(40) * 0.5)))
      .toDF("grp", "v").repartition(17)
    val viaPlanner = canon(GroupedMedianPlan.exactMedian(df, "grp", "v"))
    val viaOp = canon(GroupedMedian.exactMedian(df, "grp", "v"))
    assert(viaPlanner == viaOp)
  }

  test("the planner inserts the range exchange and runs GroupedMedianExec") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_returnflag"), col("l_extendedprice"))
    val df = GroupedMedianPlan.exactMedian(li, "l_returnflag", "l_extendedprice")
    df.collect()
    // SparkPlan.nodeName strips the Exec suffix: the node prints as
    // "GroupedMedian <attrs>"
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GroupedMedian "), p.take(1200))
    assert(p.contains("rangepartitioning"),
      "missing the OrderedDistribution-induced range exchange:\n" + p.take(1200))
  }

  test("a single-row group and an empty input behave") {
    val df = Seq(("solo", 3.5), ("pair", 1.0), ("pair", 2.0)).toDF("grp", "v")
    val got = canon(GroupedMedianPlan.exactMedian(df, "grp", "v"))
    assert(got == Seq(("pair", 1.0, 2L), ("solo", 3.5, 1L)))
    val empty = GroupedMedianPlan.exactMedian(
      df.filter(lit(false)), "grp", "v")
    assert(empty.count() == 0)
  }
}
