package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("HLL cardinality estimate within rsd bounds of exact") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val row = docs.select(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text"), 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    // 2% rsd sketch: allow 5 sigma
    assert(math.abs(approx - exact) / exact < 0.10,
      s"approx $approx vs exact $exact")
  }

  test("sketch is partitioning-invariant (mergeable state)") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val a = docs.repartition(1)
      .select(approx_count_distinct(col("text"), 0.02)).head().getLong(0)
    val b = docs.repartition(13)
      .select(approx_count_distinct(col("text"), 0.02)).head().getLong(0)
    assert(a == b, "HLL merge must not depend on partitioning")
  }
}
