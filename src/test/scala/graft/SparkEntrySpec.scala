package graft

import graft.SparkSpec

/** Driver-contract guard: every declared query must RUN (the driver's
  * correctness gate executes all of them — one broken query would
  * silently zero its round score), every oracle key must have a query,
  * and the flagship entry must return rows. */
class SparkEntrySpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql without queries: $dangling")
  }

  test("every query executes and is non-empty on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, dir).count()
          // dedup_embedding legitimately returns few rows at tiny SF;
          // everything else must produce data
          if (n == 0 && name != "dedup_embedding") Some(s"$name: 0 rows")
          else None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(100)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("query results have stable, alias-named columns (no expr blobs)") {
    // driver compare sorts columns BY NAME; auto-generated names like
    // "sum(CAST(x AS ...))" would break Spark/DuckDB matching
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try fn(spark, dir).schema.fieldNames
          .filter(n => n.contains("(") || n.contains(" "))
          .map(n => s"$name: '$n'")
        catch { case _: Throwable => Nil }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
