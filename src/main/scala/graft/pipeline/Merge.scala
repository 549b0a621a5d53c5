package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changeset application — the MERGE/upsert half of corpus
  * versioning (SURVEY.md §2.3 extension; no reference counterpart).
  * A 100 TB training corpus is not rebuilt per crawl: each ingestion
  * produces a delta (new docs, re-crawled docs, takedown deletes) that
  * must be APPLIED to the settled snapshot — the batch spelling of
  * what Delta/Iceberg's MERGE INTO does, expressed in two plain
  * relational ops so any engine can reproduce (and hash-gate) it.
  *
  * Shape: every changeset key evicts its old snapshot row (one
  * LEFT ANTI join); upsert rows then union back in. Deletes are
  * changeset rows whose op is `deleteOp` — evicted and not re-added.
  *
  * At 100 TB the changeset is typically orders of magnitude smaller
  * than the snapshot (a day's crawl vs the corpus), so the anti join
  * broadcasts the KEY SET only — the snapshot never shuffles, and the
  * union is scan-append. For a rare snapshot-sized changeset, pass
  * `broadcastKeys = false` and the anti join falls back to a hash
  * shuffle join under AQE.
  */
object Merge {

  /** Apply `changeset` to `snapshot`. The changeset carries the
    * snapshot's columns plus `opCol` ∈ {upsertOp, deleteOp}; rows with
    * any other op value are rejected up front (a typo'd op silently
    * dropping rows is the worst failure mode a corpus-versioning step
    * can have).
    *
    * If `versionCol` is set, multiple changeset rows per key collapse
    * to the highest version first (latest-wins, `max_by` over the
    * whole row — partial+final, no window funnel); otherwise one row
    * per key is a CHECKED precondition: a per-key count rides the
    * changeset plan (the small side by contract) and raise_error trips
    * on the first duplicate, because duplicate keys without a version
    * column make the merged snapshot order-dependent — the silent
    * corruption this operator exists to prevent.
    */
  def applyChangeset(snapshot: DataFrame, changeset: DataFrame,
      keyCol: String, opCol: String = "op",
      upsertOp: String = "U", deleteOp: String = "D",
      versionCol: Option[String] = None,
      broadcastKeys: Boolean = true): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    require(dataCols.contains(keyCol), s"snapshot lacks key '$keyCol'")
    require(changeset.columns.contains(opCol),
      s"changeset lacks op column '$opCol'")

    val validated = changeset.filter(
      when(col(opCol).isin(upsertOp, deleteOp), lit(true))
        .otherwise(raise_error(concat(
          lit(s"Merge.applyChangeset: op must be '$upsertOp' or " +
            s"'$deleteOp', got '"), col(opCol), lit("'")))))

    val latest = versionCol match {
      case Some(v) =>
        // latest-wins: one partial+final max_by per key — ties on the
        // version are broken by the op column (delete beats upsert at
        // the same version: a takedown must never lose to a re-crawl
        // racing it) so the collapse is deterministic
        val payload = struct((dataCols :+ opCol).map(col): _*)
        validated.groupBy(col(keyCol).as("__k"))
          .agg(max_by(payload, struct(col(v), col(opCol) === deleteOp))
            .as("__row"))
          .select(col("__row.*"))
      case None =>
        // duplicate-key check in-plan: the window shuffles only the
        // changeset (small by contract), never the snapshot
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
        validated
          .withColumn("__kcnt", count(lit(1)).over(w))
          .filter(when(col("__kcnt") === 1L, lit(true))
            .otherwise(raise_error(concat(
              lit("Merge.applyChangeset: duplicate changeset key '"),
              col(keyCol).cast("string"),
              lit("' without versionCol — latest-wins is undefined")))))
          .drop("__kcnt")
    }

    val keys = {
      val k = latest.select(col(keyCol))
      if (broadcastKeys) broadcast(k) else k
    }
    val upserts = latest.filter(col(opCol) === upsertOp)
      .select(dataCols.map(col): _*)
    snapshot.join(keys, Seq(keyCol), "left_anti").unionByName(upserts)
  }
}
