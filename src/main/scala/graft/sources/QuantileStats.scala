package graft.sources

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-commit-dir QUANTILE sketches — the percentile half of the
  * statistics plane, same discipline as [[NdvStats]]: KLL sketches
  * (DataSketches, the library Spark bundles) are mergeable, so one
  * sketch per eligible column per commit dir, carried byte-identical
  * while the dir survives and dropped with it, makes the union over
  * the CURRENT manifest the live table's distribution — maintained at
  * O(delta) per commit, served at O(manifest) per query. At 100 TB
  * this is the difference between a percentile dashboard costing a
  * driver-side merge of a few KB per dir and costing a full-table
  * range sort: `tableQuantiles(root, "latency_ms", Seq(0.5, 0.99))`
  * answers without a cluster job.
  *
  * Values sketch in the DOUBLE domain (integral casts lose precision
  * above 2^53 — irrelevant at KLL's ±ε rank error, documented).
  * Conservative like every stats layer: a data-bearing dir without
  * its sketch (pre-enable history, a failed best-effort compute)
  * makes the column's quantiles unknown. KLL is EXACT below its
  * compaction threshold (k=200 default), which is what the specs pin
  * arithmetic against. */
object QuantileStats {

  val PinPrefix = "#kllcols:" // comma-joined column list; "*" = all
  val LinePrefix = "#kll:" // {"v":2,"dir":"c…","cols":{"name":"<b64>"}}
  private val K = 200

  /** Sketch-DOMAIN version, same contract as
    * [[NdvStats.DomainVersion]]: stamped into every `#kll:` line,
    * required back at parse. v1→v2 moved timestamps from a seconds
    * cast to epoch micros; a v1 sketch merged into a v2 union would
    * serve garbage quantiles silently. Mismatched/absent `v` parses
    * as absent → the every-dir rule refuses the column. */
  val DomainVersion = 2

  /** The pinned column set: None = off; Some(Nil) = all eligible. */
  def pinnedCols(lines: Seq[String]): Option[Seq[String]] =
    lines.find(_.startsWith(PinPrefix)).map { l =>
      l.stripPrefix(PinPrefix) match {
        case "*" => Seq.empty
        case s => s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      }
    }

  /** The canonical DOUBLE-domain sketch input for a column: numerics
    * cast directly; DATE rides as its epoch-day number and TIMESTAMP
    * as epoch MICROseconds (`unix_date`/`unix_micros` — direct
    * date/timestamp→numeric casts are illegal in Spark 4, and micros
    * keep sub-second event times apart). TIMESTAMP_NTZ is NOT
    * eligible: its only numeric mapping goes through the session
    * timezone, which would mix domains across sessions — absent
    * beats wrong. The mapping is part of the on-disk contract. */
  private[sources] def sketchInput(f: StructField)
      : Option[org.apache.spark.sql.Column] = f.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType =>
      Some(col(f.name).cast(DoubleType))
    case DateType => Some(unix_date(col(f.name)).cast(DoubleType))
    case TimestampType => Some(unix_micros(col(f.name)).cast(DoubleType))
    case _ => None
  }

  /** Numeric-family columns the pin selects; the sketch domain is
    * double, so date/timestamp ride as their epoch numbers. */
  def eligibleCols(schema: StructType, pin: Seq[String]): Seq[String] = {
    val wanted = pin.map(_.toLowerCase).toSet
    schema.fields.toSeq
      .filter(f => pin.isEmpty || wanted.contains(f.name.toLowerCase))
      .filter(f => sketchInput(f).isDefined)
      .map(_.name)
  }

  /** ONE pass over `df` (which must carry `dirCol` naming each row's
    * commit dir): per-partition KLL sketches per (dir, column), byte
    * arrays collected and merged driver-side — no custom aggregate,
    * no shuffle; driver work is O(dirs × columns × sketch bytes). */
  def sketchByDir(df: DataFrame, dirCol: String, cols: Seq[String])
      : Map[String, Map[String, Array[Byte]]] = {
    if (cols.isEmpty) return Map.empty
    val fields = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val projected = df.select(
      (col(dirCol).cast(StringType) +:
        cols.map(c => sketchInput(fields(c.toLowerCase)).get)): _*)
    val n = cols.size
    val partial: Array[(String, Array[Array[Byte]])] =
      projected.queryExecution.toRdd.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap
          .empty[String, Array[KllDoublesSketch]]
        it.foreach { row =>
          val dir = row.getUTF8String(0).toString
          val sks = m.getOrElseUpdate(dir,
            Array.fill(n)(KllDoublesSketch.newHeapInstance(K)))
          var i = 0
          while (i < n) {
            if (!row.isNullAt(i + 1)) sks(i).update(row.getDouble(i + 1))
            i += 1
          }
        }
        m.iterator.map { case (d, sks) => (d, sks.map(_.toByteArray)) }
      }.collect()
    partial.groupBy(_._1).map { case (dir, parts) =>
      val merged = Array.fill(n)(KllDoublesSketch.newHeapInstance(K))
      parts.foreach { case (_, sks) =>
        var i = 0
        while (i < n) {
          merged(i).merge(KllDoublesSketch.heapify(Memory.wrap(sks(i))))
          i += 1
        }
      }
      dir -> cols.zip(merged.map(_.toByteArray)).toMap
    }
  }

  /** One `#kll:` line from per-column sketch bytes. */
  def renderLine(dir: String, entries: Seq[(String, Array[Byte])])
      : String = {
    val b64 = java.util.Base64.getEncoder
    LinePrefix + JsonMethods.compact(JsonMethods.render(JObject(
      "v" -> JInt(DomainVersion),
      "dir" -> JString(dir),
      "cols" -> JObject(entries.map { case (nm, bytes) =>
        nm -> (JString(b64.encodeToString(bytes)): JValue) }.toList))))
  }

  def parseLine(line: String): Option[(String, Map[String, Array[Byte]])] =
    scala.util.Try {
      val j = JsonMethods.parse(line.stripPrefix(LinePrefix))
      (j \ "v") match {
        case JInt(v) if v == DomainVersion => ()
        case _ => return None
      }
      val dir = (j \ "dir") match {
        case JString(s) => s
        case _ => return None
      }
      val b64 = java.util.Base64.getDecoder
      val cols = (j \ "cols") match {
        case JObject(fields) => fields.collect {
          case (nm, JString(s)) => nm -> b64.decode(s)
        }.toMap
        case _ => Map.empty[String, Array[Byte]]
      }
      (dir, cols)
    }.toOption

  /** Columns with at least one stale-domain `#kll:` line — their
    * table quantiles read as unknown until a repin/ANALYZE backfills
    * (see [[NdvStats.staleCols]]; same JSON shape, same contract). */
  def staleCols(lines: Seq[String]): Set[String] =
    NdvStats.staleDomainColsOf(lines, LinePrefix, DomainVersion)

  /** The `#kll:` lines of a base manifest describing `keep` dirs. */
  def carriedLines(lines: Seq[String], keep: Set[String]): Seq[String] =
    // dir parsed domain-agnostically: stale lines ride verbatim so
    // [[staleCols]] keeps naming the re-ANALYZE fix (see
    // [[NdvStats.carriedLines]]); unions still refuse them at parse
    lines.filter(_.startsWith(LinePrefix))
      .filter(l => NdvStats.lineDir(l, LinePrefix).exists(keep.contains))

  /** The sketch keys among `lines` (dir names and per-file-reference
    * keys) — see [[NdvStats.lineKeys]]. */
  def lineKeys(lines: Seq[String]): Set[String] =
    lines.filter(_.startsWith(LinePrefix))
      .flatMap(NdvStats.lineDir(_, LinePrefix)).toSet

  /** Union the per-dir sketches over exactly `dirs` for one column;
    * None unless EVERY dir carries the column's sketch. */
  def mergedSketch(lines: Seq[String], dirs: Seq[String],
      column: String): Option[KllDoublesSketch] =
    mergedSketches(lines, dirs, Seq(column)).get(column)

  /** Batch form of [[mergedSketch]]: ONE parse of the `#kll:` lines
    * serves every requested column (a per-column caller re-decodes
    * every dir's base64 blob N times). Keys are the requested
    * spellings; a column absent from any dir is absent from the
    * result. */
  def mergedSketches(lines: Seq[String], dirs: Seq[String],
      columns: Seq[String]): Map[String, KllDoublesSketch] = {
    if (dirs.isEmpty || columns.isEmpty) return Map.empty
    val byDir = lines.filter(_.startsWith(LinePrefix))
      .flatMap(parseLine).toMap
    columns.flatMap { column =>
      val lower = column.toLowerCase
      val perDir = dirs.map(d => byDir.get(d).flatMap(m =>
        m.collectFirst { case (nm, b) if nm.toLowerCase == lower => b }))
      if (perDir.exists(_.isEmpty)) None
      else scala.util.Try {
        val u = KllDoublesSketch.newHeapInstance(K)
        perDir.flatten.foreach(b =>
          u.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
        column -> u
      }.toOption
    }.toMap
  }

  /** Quantile estimates (INCLUSIVE rank semantics — the order
    * statistic on exact-mode sketches) at the given probabilities. */
  def quantilesOf(sk: KllDoublesSketch, probs: Seq[Double])
      : Option[Seq[Double]] =
    if (sk.isEmpty) None
    else Some(probs.map(p =>
      sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)))

  /** HEAVY-HITTER mass from a quantile sketch: the largest single
    * value's share of the rows, estimated as
    * `rank_inclusive(v) − rank_exclusive(v)` — the width of the rank
    * plateau a repeated value occupies in the CDF — maximized over
    * the candidate values at a `grid`-point quantile sweep. Any value
    * holding ≥ 1/grid of the rows MUST appear as some grid quantile
    * (its plateau spans a grid step), so the sweep cannot miss a
    * heavy hitter above that floor; mass below 1/grid is noise for
    * skew purposes (at grid=128 a missed key holds <0.8% of rows —
    * no single reducer's problem). Accuracy rides KLL's rank error
    * (~1.65% at k=200). None on an empty sketch. */
  def modalMass(sk: KllDoublesSketch, grid: Int = 128): Option[Double] = {
    if (sk.isEmpty) return None
    val candidates = (0 to grid).map(i =>
      sk.getQuantile(i.toDouble / grid,
        QuantileSearchCriteria.INCLUSIVE)).distinct
    Some(candidates.map(v =>
      sk.getRank(v, QuantileSearchCriteria.INCLUSIVE) -
        sk.getRank(v, QuantileSearchCriteria.EXCLUSIVE)).max)
  }
}
