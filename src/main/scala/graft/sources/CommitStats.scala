package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.input_file_name
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** ONE-PASS COMMIT STATISTICS: a single read of a staged commit dir
  * computing EVERY pinned statistics family — the `#ndv:` HLL line,
  * the `#kll:` quantile line, AND the per-file `_bloom.bin` sidecar —
  * so a triple-pinned table pays one pass over its delta per commit
  * instead of one per family. At gate scale the saved pass is ~15% of
  * a pinned commit (ScaleBench `stats_commit_3pin` before/after); at
  * ingest scale it is a whole read of every appended gigabyte.
  *
  * The update logic REPLICATES the standalone paths exactly —
  * [[NdvStats.combinedLines]]'s hand-rolled `hll_sketch_agg`-exact
  * hashing, [[QuantileStats]]' double domain, [[BloomSkipping
  * .buildSidecar]]'s per-file filters sized from footer row counts —
  * because the bytes are on-disk contracts: commit-path sketches must
  * UNION with enable-time backfill sketches (not double them), and
  * the sidecar must be byte-identical to what the backfill builder
  * writes (CommitStatsSpec pins both). The standalone functions
  * remain the enable-time backfill spellings; this is the
  * steady-state commit spelling.
  *
  * Shape of the pass: one projection `(file, ndv inputs..., kll
  * inputs..., bloom inputs...)`, one `mapPartitions` carrying
  * per-partition HLL/KLL accumulators (dir-grained) and a per-file
  * bloom map (file-grained), one driver-side merge. Merge order
  * matches the standalone paths (partition index order), so even
  * order-sensitive serializations land identical.
  */
object CommitStats {

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.sources.CommitStats")

  /** GROUPED variant of [[onePass]] for the ANALYZE recovery path:
    * ONE job over a full SNAPSHOT computing per-commit-dir `#ndv:`
    * and `#kll:` lines for BOTH families — and rebuilding every
    * dir's `_bloom.bin` sidecar when `bloomCols` is non-empty — so a
    * multi-pinned table's ANALYZE reads the table once, not once per
    * family (on a 100 TB table the saved pass IS the recovery cost).
    * Accumulators key on the file's parent commit dir (the
    * `data/<dir>/part-*` layout every snapshot path resolves
    * through); blooms additionally key per file and are sized from
    * `rowsByFile` (manifest `#file:` row counts keyed `dir/file`;
    * absent → the builder's default). Sidecar publish is best-effort
    * PER DIR with a logged warning — one dir's failed rename costs
    * that dir's pruning, never the sketch lines.
    *
    * Sketch content matches the standalone repin paths: HLL bytes
    * identical (content-associative union), KLL equivalent
    * (compaction-order-sensitive serialization), sidecars built from
    * exactly the LIVE rows — for a dir carried partially by file
    * references this is tighter than the standalone bloom backfill,
    * which scans the whole physical dir. */
  /** `keyByFile = true` keys the sketch lines by `dir/file.parquet`
    * instead of the dir — the per-FILE-REFERENCE sketches a partial
    * rewrite writes for its carried files, so estimates stay
    * maintained through DML (a later delete of one ref just drops
    * its line, no re-read). Bloom sidecars are dir-scoped and are
    * not built in this mode (callers pass bloomCols empty — the
    * carried files keep their existing per-file sidecar entries). */
  def groupedPass(spark: SparkSession,
      snapshot: org.apache.spark.sql.DataFrame,
      ndvCols: Seq[StructField], kllCols: Seq[String],
      bloomCols: Seq[StructField], dataRoot: Path,
      rowsByFile: Map[String, Long],
      keyByFile: Boolean = false): (Seq[String], Seq[String]) = {
    if (ndvCols.isEmpty && kllCols.isEmpty && bloomCols.isEmpty)
      return (Seq.empty, Seq.empty)
    val fields = snapshot.schema.fields
      .map(f => f.name.toLowerCase -> f).toMap
    val nN = ndvCols.size
    val nK = kllCols.size
    val nB = bloomCols.size
    val projected = snapshot.select(
      input_file_name().as("__f") +:
        (ndvCols.map(f => NdvStats.sketchInput(f).get.as(s"__n_${f.name}")) ++
          kllCols.map(c => QuantileStats.sketchInput(fields(c.toLowerCase))
            .get.as(s"__k_$c")) ++
          bloomCols.map(f =>
            BloomSkipping.bloomInput(f).get.as(s"__b_${f.name}"))): _*)
    val types = projected.schema.fields.drop(1).map(_.dataType)
    val fpp = BloomSkipping.Fpp
    val defaultCap = BloomSkipping.DefaultCapacity
    val capacities = rowsByFile.map { case (f, r) =>
      f -> math.max(1L, if (r >= 0) r else defaultCap) }
    // per-partition: dir -> (hll[], kll[], file -> bloom[])
    val partial: Array[Map[String, (Array[Array[Byte]],
        Array[Array[Byte]], Map[String, Array[Array[Byte]]])]] =
      projected.queryExecution.toRdd.mapPartitions { it =>
        val byDir = scala.collection.mutable.HashMap.empty[String,
          (Array[org.apache.datasketches.hll.HllSketch],
            Array[org.apache.datasketches.kll.KllDoublesSketch],
            scala.collection.mutable.HashMap[String, Array[BloomFilter]])]
        it.foreach { row =>
          val path = row.getUTF8String(0).toString
          val cut = path.lastIndexOf('/')
          val dirStart = path.lastIndexOf('/', cut - 1)
          val dir = path.substring(dirStart + 1, cut)
          val file = path.substring(cut + 1)
          val key = if (keyByFile) s"$dir/$file" else dir
          val (hlls, klls, blooms) = byDir.getOrElseUpdate(key, (
            Array.fill(nN)(new org.apache.datasketches.hll.HllSketch(12,
              org.apache.datasketches.hll.TgtHllType.HLL_8)),
            Array.fill(nK)(org.apache.datasketches.kll.KllDoublesSketch
              .newHeapInstance(200)),
            scala.collection.mutable.HashMap
              .empty[String, Array[BloomFilter]]))
          var i = 0
          while (i < nN) {
            if (!row.isNullAt(1 + i)) types(i) match {
              case LongType => hlls(i).update(row.getLong(1 + i))
              case StringType =>
                hlls(i).update(row.getUTF8String(1 + i).getBytes)
              case BinaryType => hlls(i).update(row.getBinary(1 + i))
              case other => throw new IllegalStateException(
                s"unexpected NDV sketch domain $other")
            }
            i += 1
          }
          var j = 0
          while (j < nK) {
            if (!row.isNullAt(1 + nN + j))
              klls(j).update(row.getDouble(1 + nN + j))
            j += 1
          }
          if (nB > 0) {
            val bfs = blooms.getOrElseUpdate(file, {
              val cap = capacities.getOrElse(s"$dir/$file", defaultCap)
              Array.fill(nB)(BloomFilter.create(cap, fpp))
            })
            var b = 0
            while (b < nB) {
              val at = 1 + nN + nK + b
              if (!row.isNullAt(at)) types(nN + nK + b) match {
                case LongType => bfs(b).putLong(row.getLong(at))
                case StringType =>
                  bfs(b).putBinary(row.getUTF8String(at).getBytes)
                case BinaryType => bfs(b).putBinary(row.getBinary(at))
                case other => throw new IllegalStateException(
                  s"unexpected bloom domain $other")
              }
              b += 1
            }
          }
        }
        Iterator.single(byDir.iterator.map { case (d, (hs, ks, bs)) =>
          d -> (hs.map(_.toCompactByteArray), ks.map(_.toByteArray),
            bs.iterator.map { case (f, bfs) =>
              (f, bfs.map(BloomSkipping.ser)) }.toMap)
        }.toMap)
      }.collect()
    val dirs = partial.flatMap(_.keys).distinct.sorted.toSeq
    val ndvLines = scala.collection.mutable.ListBuffer.empty[String]
    val kllLines = scala.collection.mutable.ListBuffer.empty[String]
    dirs.foreach { d =>
      val parts = partial.flatMap(_.get(d))
      if (nN > 0) {
        val merged = (0 until nN).map { i =>
          val u = new org.apache.datasketches.hll.Union(12)
          parts.foreach(p => u.update(
            org.apache.datasketches.hll.HllSketch.heapify(p._1(i))))
          u.getResult.toCompactByteArray
        }
        ndvLines += NdvStats.renderLine(d,
          ndvCols.map(_.name).zip(merged))
      }
      if (nK > 0) {
        val merged = (0 until nK).map { j =>
          val s = org.apache.datasketches.kll.KllDoublesSketch
            .newHeapInstance(200)
          parts.foreach(p => s.merge(
            org.apache.datasketches.kll.KllDoublesSketch.heapify(
              org.apache.datasketches.memory.Memory.wrap(p._2(j)))))
          s.toByteArray
        }
        kllLines += QuantileStats.renderLine(d, kllCols.zip(merged))
      }
      if (nB > 0) scala.util.Try {
        val merged: Map[String, Array[BloomFilter]] = parts
          .flatMap(_._3.toSeq).groupBy(_._1).map { case (f, ps) =>
            val acc = ps.head._2.map(BloomSkipping.de)
            ps.tail.foreach { case (_, bs) =>
              var i = 0
              while (i < nB) {
                acc(i).mergeInPlace(BloomSkipping.de(bs(i))); i += 1
              }
            }
            f -> acc
          }
        BloomSkipping.publishSidecar(spark, new Path(dataRoot, d),
          bloomCols.map(_.name), merged)
      }.failed.foreach(e => log.warn(
        s"ANALYZE bloom sidecar publish failed for dir $d — its " +
          s"files scan unpruned until the next repin: $e"))
    }
    (ndvLines.toSeq, kllLines.toSeq)
  }

  /** Compute every family `ndvPin`/`kllPin`/`bloomPin` selects over
    * the staged dir in one pass. Returns the (`#ndv:`, `#kll:`)
    * manifest lines; the bloom sidecar publishes as a side effect.
    * `rowsByFile` sizes the per-file filters (footer counts; absent →
    * the builder's default). Callers on the commit path wrap
    * best-effort, same as the standalone spellings. */
  def onePass(spark: SparkSession, dirPath: Path, dirName: String,
      ndvPin: Option[Seq[String]], kllPin: Option[Seq[String]],
      bloomPin: Option[Seq[String]], rowsByFile: Map[String, Long])
      : (Option[String], Option[String]) = {
    val df = spark.read.parquet(dirPath.toString)
    val schema = df.schema
    val fields = schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val ndvCols = ndvPin.map(NdvStats.eligibleCols(schema, _))
      .getOrElse(Seq.empty)
    val kllCols = kllPin.map(QuantileStats.eligibleCols(schema, _))
      .getOrElse(Seq.empty)
    val bloomCols = bloomPin.map(BloomSkipping.eligibleCols(schema, _))
      .getOrElse(Seq.empty)
    if (ndvCols.isEmpty && kllCols.isEmpty && bloomCols.isEmpty)
      return (None, None)
    val nN = ndvCols.size
    val nK = kllCols.size
    val nB = bloomCols.size
    // one projection, one scan: [file, ndv..., kll..., bloom...] —
    // a column pinned by several families appears once per family
    // (a reference into the same read column, not a second read)
    val projected = df.select(
      input_file_name().as("__f") +:
        (ndvCols.map(f => NdvStats.sketchInput(f).get.as(s"__n_${f.name}")) ++
          kllCols.map(c => QuantileStats.sketchInput(fields(c.toLowerCase))
            .get.as(s"__k_$c")) ++
          bloomCols.map(f =>
            BloomSkipping.bloomInput(f).get.as(s"__b_${f.name}"))): _*)
    val types = projected.schema.fields.drop(1).map(_.dataType)
    val fpp = BloomSkipping.Fpp
    val defaultCap = BloomSkipping.DefaultCapacity
    val capacities = rowsByFile.map { case (f, r) =>
      f -> math.max(1L, if (r >= 0) r else defaultCap) }
    val partial: Array[(Array[Array[Byte]], Array[Array[Byte]],
        Map[String, Array[Array[Byte]]])] =
      projected.queryExecution.toRdd.mapPartitions { it =>
        val hlls = Array.fill(nN)(
          new org.apache.datasketches.hll.HllSketch(12,
            org.apache.datasketches.hll.TgtHllType.HLL_8))
        val klls = Array.fill(nK)(
          org.apache.datasketches.kll.KllDoublesSketch
            .newHeapInstance(200))
        val blooms = scala.collection.mutable.HashMap
          .empty[String, Array[BloomFilter]]
        it.foreach { row =>
          var i = 0
          while (i < nN) {
            if (!row.isNullAt(1 + i)) types(i) match {
              case LongType => hlls(i).update(row.getLong(1 + i))
              case StringType =>
                hlls(i).update(row.getUTF8String(1 + i).getBytes)
              case BinaryType => hlls(i).update(row.getBinary(1 + i))
              case other => throw new IllegalStateException(
                s"unexpected NDV sketch domain $other")
            }
            i += 1
          }
          var j = 0
          while (j < nK) {
            if (!row.isNullAt(1 + nN + j))
              klls(j).update(row.getDouble(1 + nN + j))
            j += 1
          }
          if (nB > 0) {
            val file = {
              val p = row.getUTF8String(0).toString
              p.substring(p.lastIndexOf('/') + 1)
            }
            val bfs = blooms.getOrElseUpdate(file, {
              val cap = capacities.getOrElse(file, defaultCap)
              Array.fill(nB)(BloomFilter.create(cap, fpp))
            })
            var b = 0
            while (b < nB) {
              val at = 1 + nN + nK + b
              if (!row.isNullAt(at)) types(nN + nK + b) match {
                case LongType => bfs(b).putLong(row.getLong(at))
                case StringType =>
                  bfs(b).putBinary(row.getUTF8String(at).getBytes)
                case BinaryType => bfs(b).putBinary(row.getBinary(at))
                case other => throw new IllegalStateException(
                  s"unexpected bloom domain $other")
              }
              b += 1
            }
          }
        }
        Iterator.single((hlls.map(_.toCompactByteArray),
          klls.map(_.toByteArray),
          blooms.iterator.map { case (f, bfs) =>
            (f, bfs.map(BloomSkipping.ser)) }.toMap))
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
    // BEST-EFFORT publish, per-family degradation preserved: by this
    // point the HLL/KLL lines are already computed from the shared
    // pass, so a transient failure in the sidecar's merge/rename must
    // cost ONLY this dir's bloom coverage (conservatively scanned),
    // never the sketch lines — losing a dir's #ndv:/#kll: line would
    // degrade the WHOLE table's estimates (the every-dir rule) until
    // a re-ANALYZE.
    if (nB > 0) scala.util.Try {
      val merged: Map[String, Array[BloomFilter]] = partial
        .flatMap(_._3.toSeq).groupBy(_._1).map { case (f, parts) =>
          val acc = parts.head._2.map(BloomSkipping.de)
          parts.tail.foreach { case (_, bs) =>
            var i = 0
            while (i < nB) {
              acc(i).mergeInPlace(BloomSkipping.de(bs(i))); i += 1
            }
          }
          f -> acc
        }
      BloomSkipping.publishSidecar(spark, dirPath,
        bloomCols.map(_.name), merged)
    }.failed.foreach(e => log.warn(
      s"bloom sidecar publish failed for $dirName — its files scan " +
        s"unpruned until repinBloomFilters/ANALYZE: $e"))
    (if (ndvCols.isEmpty) None
     else Some(NdvStats.renderLine(dirName,
       ndvCols.map(_.name).zip(hllMerged))),
      if (kllCols.isEmpty) None
      else Some(QuantileStats.renderLine(dirName, kllCols.zip(kllMerged))))
  }

}
