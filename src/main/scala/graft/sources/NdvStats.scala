package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-commit-dir DISTINCT-COUNT sketches — the NDV half of the
  * statistics layer [[DataSkipping]] cannot provide (a parquet footer
  * carries min/max/nulls but no distinct count), and the input
  * Spark's CBO needs before it will estimate filter selectivity at
  * all (`FilterEstimation` requires a distinct count alongside the
  * min/max envelope). This is Iceberg's puffin-sketch idea re-derived
  * at commit-dir granularity:
  *
  *  - When a table pins `#ndvcols:` (via [[VersionedTable
  *    .enableNdvStats]] or the `graft.ndv.columns` TBLPROPERTY), every
  *    commit computes ONE HyperLogLog sketch per eligible column over
  *    the data JUST WRITTEN — O(delta), a single aggregate job over
  *    the staged dir, never a table scan — and records it as a
  *    `#ndv:` manifest line (base64 of the DataSketches compact HLL,
  *    the same library Spark's own `hll_sketch_agg` uses).
  *  - Dirs that survive a rewrite carry their lines verbatim, exactly
  *    like `#file:` skipping stats; dropped dirs' sketches drop with
  *    them. Because HLL union is content-associative, the union over
  *    the CURRENT manifest's dirs is always the live table's NDV —
  *    incremental maintenance with no recompute and no staleness.
  *  - At read time [[tableNdv]] unions the sketches driver-side
  *    (O(dirs × sketch bytes), microseconds) and the catalog scan
  *    reports the estimate as DSv2 `distinctCount`, unlocking CBO's
  *    range/equality selectivity and join reordering.
  *
  * Strictly conservative, like every stats layer here: a dir missing
  * its line (pre-enable history, a best-effort compute that failed)
  * makes that column's NDV unknown — absent beats wrong. Sketches are
  * APPROXIMATE (±1.6% at lgK=12) and feed only the optimizer; no
  * query answer ever depends on them.
  */
object NdvStats {

  val PinPrefix = "#ndvcols:" // comma-joined column list; "*" = all
  val LinePrefix = "#ndv:" // {"v":2,"dir":"c…","cols":{"name":"<b64>"}}
  private val LgK = 12

  /** The sketch-DOMAIN version stamped into every `#ndv:` line and
    * required back at parse time. [[sketchInput]]'s type→update
    * mapping is part of the on-disk contract — when it changes
    * (v1→v2: timestamps moved from a seconds cast to epoch micros,
    * NTZ to its string form), sketches written under the old domain
    * must NOT union with new-domain appends (a mixed-domain union
    * inflates NDV silently instead of refusing). Lines whose `v`
    * differs (or is absent) parse as ABSENT, so [[tableNdv]]'s
    * every-dir rule degrades the column to "unknown — repin/ANALYZE
    * to backfill" — absent beats wrong, mechanically enforced. */
  val DomainVersion = 2

  /** The pinned column set as of a manifest's lines: None = NDV
    * stats off; Some(Nil) = every eligible column. */
  def pinnedCols(lines: Seq[String]): Option[Seq[String]] =
    lines.find(_.startsWith(PinPrefix)).map { l =>
      l.stripPrefix(PinPrefix) match {
        case "*" => Seq.empty
        case s => s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      }
    }

  /** The canonical sketch input for a column: every integral-family
    * type widens to LONG (so int→long schema widening unions with its
    * own history); DATE sketches as its epoch-day number and
    * TIMESTAMP as epoch MICROseconds (`unix_date`/`unix_micros` —
    * direct date/timestamp→numeric casts are illegal in Spark 4, and
    * the microsecond domain keeps sub-second-distinct event times
    * distinct); TIMESTAMP_NTZ and fractional/decimal go through their
    * string form (injective per distinct value and, for NTZ,
    * independent of the session timezone — a zone-dependent numeric
    * mapping could collide distinct wall-clock values across DST
    * gaps); strings/binary hash as-is. None = type we keep no NDV
    * for (nested, interval, variant). The cast is part of the
    * on-disk contract — changing it invalidates every stored sketch. */
  private[sources] def sketchInput(f: StructField)
      : Option[org.apache.spark.sql.Column] = f.dataType match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType =>
      Some(col(f.name).cast(LongType))
    case DateType => Some(unix_date(col(f.name)).cast(LongType))
    case TimestampType => Some(unix_micros(col(f.name)))
    case TimestampNTZType | FloatType | DoubleType | _: DecimalType =>
      Some(col(f.name).cast(StringType))
    case StringType | BinaryType => Some(col(f.name))
    case _ => None
  }

  /** The columns of `schema` the pin selects and the sketch can host. */
  def eligibleCols(schema: StructType, pin: Seq[String]): Seq[StructField] = {
    val wanted = pin.map(_.toLowerCase).toSet
    schema.fields.toSeq
      .filter(f => pin.isEmpty || wanted.contains(f.name.toLowerCase))
      .filter(f => sketchInput(f).isDefined)
  }

  /** One `#ndv:` line from already-computed sketch bytes. */
  def renderLine(dir: String, entries: Seq[(String, Array[Byte])])
      : String = {
    val b64 = java.util.Base64.getEncoder
    LinePrefix + JsonMethods.compact(JsonMethods.render(JObject(
      "v" -> JInt(DomainVersion),
      "dir" -> JString(dir),
      "cols" -> JObject(entries.map { case (n, bytes) =>
        n -> (JString(b64.encodeToString(bytes)): JValue) }.toList))))
  }

  /** ONE pass over a staged commit dir computing BOTH sketch
    * families — the HLL distinct-count sketches AND the KLL quantile
    * sketches — so a dual-pinned table pays a single read of its
    * delta per commit instead of one per family. The HLL updates
    * replicate `hll_sketch_agg`'s exact hashing (long inputs via
    * `update(long)`, string/binary via their UTF-8 bytes — verified
    * by NdvStatsSpec's union-compatibility case: commit-path and
    * backfill-path sketches of the SAME rows union to n, not 2n), so
    * sketches from this path and the enable-time backfill remain
    * unionable. Returns (ndvLine, kllLine).
    *
    * ROLE since the one-pass fuse: the COMMIT path now runs
    * [[CommitStats.onePass]] (same updates plus the bloom sidecar in
    * one read); this function remains as the INDEPENDENT twin
    * CommitStatsSpec compares the fused output against — the
    * reference implementation that keeps the fused path honest. */
  def combinedLines(df: DataFrame, dir: String, ndvPin: Option[Seq[String]],
      kllPin: Option[Seq[String]]): (Option[String], Option[String]) = {
    val ndvCols = ndvPin.map(eligibleCols(df.schema, _))
      .getOrElse(Seq.empty)
    val kllCols = kllPin.map(QuantileStats.eligibleCols(df.schema, _))
      .getOrElse(Seq.empty)
    if (ndvCols.isEmpty && kllCols.isEmpty) return (None, None)
    // canonical casts: the NDV inputs keep their sketchInput domain
    // (long / string / binary), the KLL inputs QuantileStats' double
    // domain (epoch numbers for date/timestamp)
    val fields = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val projected = df.select(
      (ndvCols.map(f => sketchInput(f).get.as(s"__n_${f.name}")) ++
        kllCols.map(c => QuantileStats.sketchInput(fields(c.toLowerCase))
          .get.as(s"__k_$c"))): _*)
    val types = projected.schema.fields.map(_.dataType)
    val nN = ndvCols.size
    val nK = kllCols.size
    val partial = projected.queryExecution.toRdd.mapPartitions { it =>
      val hlls = Array.fill(nN)(
        new org.apache.datasketches.hll.HllSketch(12,
          org.apache.datasketches.hll.TgtHllType.HLL_8))
      val klls = Array.fill(nK)(
        org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200))
      it.foreach { row =>
        var i = 0
        while (i < nN) {
          if (!row.isNullAt(i)) types(i) match {
            case LongType => hlls(i).update(row.getLong(i))
            case StringType =>
              hlls(i).update(row.getUTF8String(i).getBytes)
            case BinaryType => hlls(i).update(row.getBinary(i))
            case other => throw new IllegalStateException(
              s"unexpected NDV sketch domain $other")
          }
          i += 1
        }
        var j = 0
        while (j < nK) {
          if (!row.isNullAt(nN + j)) klls(j).update(row.getDouble(nN + j))
          j += 1
        }
      }
      Iterator.single((hlls.map(_.toCompactByteArray),
        klls.map(_.toByteArray)))
    }.collect()
    val hllMerged: Seq[Array[Byte]] = (0 until nN).map { i =>
      val u = new org.apache.datasketches.hll.Union(12)
      partial.foreach(p => u.update(
        org.apache.datasketches.hll.HllSketch.heapify(p._1(i))))
      u.getResult.toCompactByteArray
    }
    val kllMerged: Seq[Array[Byte]] = (0 until nK).map { j =>
      val s = org.apache.datasketches.kll.KllDoublesSketch
        .newHeapInstance(200)
      partial.foreach(p => s.merge(
        org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(p._2(j)))))
      s.toByteArray
    }
    val ndvLine =
      if (ndvCols.isEmpty) None
      else Some(renderLine(dir, ndvCols.map(_.name).zip(hllMerged)))
    val kllLine =
      if (kllCols.isEmpty) None
      else Some(QuantileStats.renderLine(dir, kllCols.zip(kllMerged)))
    (ndvLine, kllLine)
  }

  /** Parse one line → (dir, colName → sketch bytes). None for a
    * line from another sketch-domain version (see [[DomainVersion]]) —
    * the dir then reads as sketch-less and the column's table stat
    * refuses rather than unioning mixed domains. */
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
          case (n, JString(s)) => n -> b64.decode(s)
        }.toMap
        case _ => Map.empty[String, Array[Byte]]
      }
      (dir, cols)
    }.toOption

  /** Column names (lowercased) carried by `prefix`-family sketch
    * lines whose domain version differs from `expected` — the
    * operator-facing half of the domain-version contract. A v-bumped
    * domain makes [[parseLine]] read old lines as ABSENT (correct:
    * mixed-domain unions lie), but absent-because-stale must be
    * DISTINGUISHABLE from never-pinned, or the degradation ("NDV
    * silently unknown everywhere") has no signal telling the operator
    * a re-ANALYZE/repin would fix it. Shared by the `#ndv:` and
    * `#kll:` families (same JSON shape). */
  private[sources] def staleDomainColsOf(lines: Seq[String],
      prefix: String, expected: Int): Set[String] =
    lines.filter(_.startsWith(prefix)).flatMap { line =>
      scala.util.Try {
        val j = JsonMethods.parse(line.stripPrefix(prefix))
        val stale = (j \ "v") match {
          case JInt(v) => v != expected
          case _ => true // pre-versioning line: stale by definition
        }
        if (!stale) Seq.empty[String]
        else (j \ "cols") match {
          case JObject(fields) => fields.map(_._1.toLowerCase)
          case _ => Seq.empty[String]
        }
      }.getOrElse(Seq.empty)
    }.toSet

  /** Columns with at least one stale-domain `#ndv:` line — their
    * table NDV reads as unknown until a repin/ANALYZE backfills. */
  def staleCols(lines: Seq[String]): Set[String] =
    staleDomainColsOf(lines, LinePrefix, DomainVersion)

  /** The dir a sketch line describes, parsed WITHOUT the domain
    * check — bookkeeping (carry, staleness surfacing) must see
    * old-domain lines; only sketch UNIONS refuse them. Shared by the
    * `#ndv:` and `#kll:` families (same JSON shape). */
  private[sources] def lineDir(line: String, prefix: String)
      : Option[String] =
    scala.util.Try {
      JsonMethods.parse(line.stripPrefix(prefix)) \ "dir" match {
        case JString(d) => Option(d)
        case _ => None
      }
    }.toOption.flatten

  /** The `#ndv:` lines of a base manifest that describe `keep` dirs —
    * carried VERBATIM alongside the dirs a rewrite never touched,
    * INCLUDING old-domain lines: a stale line must keep riding the
    * manifest chain so [[staleCols]] can keep naming the re-ANALYZE
    * fix (dropping it at the first post-bump commit would silently
    * convert "stale — backfill me" into indistinguishable
    * never-pinned absence). Unions still refuse stale lines at parse
    * time; a repin/ANALYZE backfill REPLACES them, which is the one
    * legitimate way they leave. */
  def carriedLines(lines: Seq[String], keep: Set[String]): Seq[String] =
    lines.filter(_.startsWith(LinePrefix))
      .filter(l => lineDir(l, LinePrefix).exists(keep.contains))

  /** The sketch KEYS present among `lines` — commit-dir names, plus
    * `dir/file.parquet` for per-file-reference sketches (written when
    * a partial rewrite splits a dir: the carried files get their own
    * lines so estimates stay maintained through DML). */
  def lineKeys(lines: Seq[String]): Set[String] =
    lines.filter(_.startsWith(LinePrefix))
      .flatMap(lineDir(_, LinePrefix)).toSet

  /** Union the per-dir sketches of `lines` over exactly `dirs` into a
    * per-column estimate. A column counts only when EVERY dir's line
    * carries its sketch (a gap means unknown history — no estimate).
    * Driver-side, O(dirs × sketch bytes). */
  def tableNdv(lines: Seq[String], dirs: Seq[String])
      : Map[String, Long] = {
    if (dirs.isEmpty) return Map.empty
    val byDir = lines.filter(_.startsWith(LinePrefix))
      .flatMap(parseLine).toMap
    val perDir = dirs.map(d => byDir.get(d))
    if (perDir.exists(_.isEmpty)) return Map.empty
    val sketches = perDir.map(_.get)
    val names = sketches.map(_.keySet.map(_.toLowerCase))
      .reduce(_ intersect _)
    // keep the first dir's casing for the reported name
    val casing = sketches.head.keys.map(n => n.toLowerCase -> n).toMap
    names.iterator.flatMap { lower =>
      scala.util.Try {
        val u = new org.apache.datasketches.hll.Union(LgK)
        sketches.foreach { m =>
          val bytes = m.collectFirst {
            case (n, b) if n.toLowerCase == lower => b
          }.get
          u.update(org.apache.datasketches.hll.HllSketch.heapify(bytes))
        }
        casing(lower) -> math.max(1L, math.round(u.getEstimate))
      }.toOption
    }.toMap
  }
}
