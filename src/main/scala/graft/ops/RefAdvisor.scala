package graft.ops

import org.apache.spark.sql.SparkSession

import graft.sources.VersionedTable
import graft.sources.VersionedTable.RefFragmentation

/** Maintenance signal for DML-history REF FRAGMENTATION — the
  * operational other half of the file-granular carry
  * ([[VersionedTable.rewriteWhere]]'s split): every point-DML that
  * splits a stats-covered dir leaves `dir/file.parquet` manifest
  * references behind, each costing every subsequent scan's manifest
  * parse one ref line plus its carried `#file:` skipping line plus
  * its per-ref `#ndv:`/`#kll:` sketch lines, and each pinning its
  * parent dir (listing + sidecar + replaced siblings until the file
  * sweep ages them out). [[VersionedTable.compactRefs]] is the
  * antidote — O(fragmented refs) I/O — but nothing told an operator
  * WHEN to run it. This advisor does, on the [[SkewAdvisor]]
  * discipline: measure from what the manifest already records,
  * recommend from a derived threshold, refuse to guess what is not
  * measured.
  *
  * Threshold derivation (the two-guard shape, both documented in
  * SURVEY §versioned):
  *
  *  - `shareThreshold` (default 0.5): the recurring cost of
  *    fragmentation is METADATA — every scan of every reader parses
  *    the whole manifest, so the dimensionless quantity that decides
  *    "is this manifest mostly servicing fragmentation?" is the
  *    OVERHEAD SHARE: fragmentation lines (ref lines + per-ref
  *    `#file:` lines + per-ref sketch lines) over total manifest
  *    lines. Past 0.5 the MAJORITY of every manifest parse services
  *    carried refs, and a fold returns the manifest to O(dirs) —
  *    the share is an upper bound on the saving (the fold's fresh
  *    dir brings its own per-dir lines), which is why the trigger
  *    is the majority point and not lower.
  *  - `minRefs` (default 16): an absolute floor so a barely-split
  *    table is never nagged — a fold costs a fixed commit (one write
  *    job, one version, one manifest rename) regardless of size, and
  *    below ~16 refs the lines it saves are noise next to that fixed
  *    cost. 16 = two splits of the 8-file dirs the DML canaries pin,
  *    i.e. the smallest history that reads as a PATTERN of point-DML
  *    rather than a one-off.
  *
  * Both guards come from counted manifest lines — never from scan
  * frequency, which the table cannot know (same honesty as the skew
  * advisor's refusal when no sketch covers a key). `foldRows` (the
  * fold's I/O cost in rows) is served only when `#file:` stats cover
  * every ref; uncovered refs yield None, not an estimate. */
object RefAdvisor {

  val DefaultMinRefs = 16
  val DefaultShareThreshold = 0.5

  /** The measured census plus the verdict. `overheadShare` is
    * fragmentation lines / manifest lines; `recommend` means "run
    * `OPTIMIZE t REFS` / [[VersionedTable.compactRefs]] now";
    * `basis` spells out which guard decided, for the dashboard. */
  final case class RefAdvice(frag: RefFragmentation,
      overheadShare: Double, recommend: Boolean, basis: String)

  /** Pure verdict from a measured census — unit-testable without a
    * table (the [[SkewAdvisor.saltFor]] analog). */
  def adviseFrom(frag: RefFragmentation,
      minRefs: Int = DefaultMinRefs,
      shareThreshold: Double = DefaultShareThreshold): RefAdvice = {
    require(minRefs >= 1, s"minRefs must be positive, got $minRefs")
    require(shareThreshold > 0 && shareThreshold <= 1,
      s"shareThreshold must be in (0, 1], got $shareThreshold")
    val fragLines =
      frag.fileRefs + frag.refStatsLines + frag.refSketchLines
    val share =
      if (frag.manifestLines == 0) 0.0
      else fragLines.toDouble / frag.manifestLines
    val (recommend, basis) =
      if (frag.fileRefs == 0)
        (false, "no file-granular refs — nothing to fold")
      else if (frag.fileRefs < minRefs)
        (false, s"${frag.fileRefs} refs < floor $minRefs — a fold's " +
          "fixed commit cost outweighs the lines saved")
      else if (share < shareThreshold)
        (false, f"overhead share $share%.2f < $shareThreshold%.2f — " +
          "the manifest is not yet dominated by fragmentation")
      else
        (true, f"${frag.fileRefs} refs >= $minRefs and overhead " +
          f"share $share%.2f >= $shareThreshold%.2f — the majority " +
          "of every scan's manifest parse services carried refs; " +
          "OPTIMIZE ... REFS folds them at O(fragmented refs)")
    RefAdvice(frag, share, recommend, basis)
  }

  /** Advise on the table at `root` — one manifest read
    * ([[VersionedTable.refFragmentation]]), zero Spark jobs. */
  def advise(spark: SparkSession, root: String,
      version: Option[Int] = None,
      minRefs: Int = DefaultMinRefs,
      shareThreshold: Double = DefaultShareThreshold): RefAdvice =
    adviseFrom(VersionedTable.refFragmentation(spark, root, version),
      minRefs, shareThreshold)
}
