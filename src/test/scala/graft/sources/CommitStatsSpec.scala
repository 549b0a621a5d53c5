package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one-pass commit statistics contract ([[CommitStats.onePass]]):
  * the fused pass must produce BYTE-IDENTICAL artifacts to the
  * standalone spellings it replaces on the commit path — the same
  * `#ndv:`/`#kll:` manifest lines [[NdvStats.combinedLines]] renders
  * and the same `_bloom.bin` sidecar [[BloomSkipping.buildSidecar]]
  * writes — because those bytes are on-disk contracts (commit-path
  * sketches union with backfill sketches; sidecar probes must see
  * exactly the filters the backfill would build). */
class CommitStatsSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private def sidecarBytes(root: String, dir: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(root, "data"),
        s"$dir/${BloomSkipping.SidecarName}").toPath)

  test("a triple-pinned append writes the SAME sketch lines and the " +
    "SAME sidecar bytes as the standalone builders on the same dir") {
    val tmp = java.nio.file.Files.createTempDirectory("commitstats")
    try {
      val root = tmp.resolve("t").toString
      val vt = VersionedTable
      def rows(from: Long, n: Long) = spark.range(from, from + n)
        .select(col("id").as("doc_id"),
          md5(col("id").cast("string")).as("fp"),
          concat(lit("l"), col("id") % 5).as("lang"),
          (col("id") % 997).as("n_chars"))
      vt.init(spark, root, rows(0, 3000))
      vt.enableNdvStats(spark, root, Seq("doc_id", "lang"))
      vt.enableQuantileStats(spark, root, Seq("n_chars"))
      vt.enableBloomFilters(spark, root, Seq("fp"))
      val before = vt.dataDirs(spark, root).map(p =>
        p.substring(p.lastIndexOf('/') + 1)).toSet
      // the APPEND runs the fused one-pass commit path
      val v = vt.append(spark, root, rows(3000, 2000),
        vt.latestVersion(spark, root))
      val staged = (vt.dataDirs(spark, root).map(p =>
        p.substring(p.lastIndexOf('/') + 1)).toSet -- before).head
      val fusedSidecar = sidecarBytes(root, staged)
      val lines = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(root, s"_manifests/v$v.json").toPath), "UTF-8")
        .linesIterator.toSeq
      val fusedNdv = lines.find(l =>
        l.startsWith(NdvStats.LinePrefix) && l.contains(staged)).get
      val fusedKll = lines.find(l =>
        l.startsWith(QuantileStats.LinePrefix) && l.contains(staged)).get
      // standalone spellings over the SAME staged dir
      val dirPath = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "data"), staged)
      val staged_df = spark.read.parquet(dirPath.toString)
      val (aloneNdv, aloneKll) = NdvStats.combinedLines(staged_df,
        staged, Some(Seq("doc_id", "lang")), Some(Seq("n_chars")))
      assert(aloneNdv.contains(fusedNdv),
        "fused #ndv: line must equal the standalone render (HLL " +
          "registers are order-independent, so bytes must match)")
      // KLL serialization is compaction-ORDER-sensitive (two valid
      // sketches of the same rows can differ in retained items), so
      // the contract is EQUIVALENCE, not byte equality: same domain
      // version, same column, same quantile answers within the
      // sketch's rank error
      def kllMedian(line: Option[String]): Double = {
        val bytes = QuantileStats.parseLine(line.get).get._2("n_chars")
        org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bytes))
          .getQuantile(0.5)
      }
      val (mF, mA) = (kllMedian(Some(fusedKll)), kllMedian(aloneKll))
      assert(math.abs(mF - mA) <= 0.05 * math.max(mA.abs, 1.0),
        s"fused KLL must answer like the standalone sketch: $mF vs $mA")
      val rowsByFile = staged_df.select(input_file_name()).distinct()
        .as[String].collect().map { p =>
          val f = p.substring(p.lastIndexOf('/') + 1)
          f -> spark.read.parquet(p).count()
        }.toMap
      BloomSkipping.buildSidecar(spark, dirPath, Seq("fp"), rowsByFile)
      assert(java.util.Arrays.equals(fusedSidecar,
        sidecarBytes(root, staged)),
        "fused sidecar must be byte-identical to the standalone build")
      // and the artifacts SERVE: NDV/quantiles answer, the bloom
      // prunes a point lookup to one file's dirs
      assert(vt.tableNdv(spark, root).contains("doc_id"))
      assert(vt.tableQuantiles(spark, root, "n_chars", Seq(0.5)).isDefined)
      val probe = spark.range(4321, 4322)
        .select(md5(col("id").cast("string"))).head.getString(0)
      assert(vt.readWhere(spark, root, col("fp") === probe).count() == 1)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("single-family pins keep working through the fused path: " +
    "bloom-only commits get sidecars, sketch-only commits get lines") {
    val tmp = java.nio.file.Files.createTempDirectory("commitstats1")
    try {
      val broot = tmp.resolve("b").toString
      VersionedTable.init(spark, broot, spark.range(0, 1000)
        .select(col("id"), md5(col("id").cast("string")).as("fp")))
      VersionedTable.enableBloomFilters(spark, broot, Seq("fp"))
      VersionedTable.append(spark, broot, spark.range(1000, 2000)
        .select(col("id"), md5(col("id").cast("string")).as("fp")), 1)
      val dirs = VersionedTable.dataDirs(spark, broot)
      assert(dirs.forall(d => new java.io.File(
        d, BloomSkipping.SidecarName).exists()),
        "every commit dir of a bloom-pinned table carries a sidecar")
      val nroot = tmp.resolve("n").toString
      VersionedTable.init(spark, nroot, spark.range(0, 1000)
        .select(col("id"), (col("id") % 7).as("x")))
      VersionedTable.enableNdvStats(spark, nroot, Seq("id"))
      VersionedTable.append(spark, nroot, spark.range(1000, 2000)
        .select(col("id"), (col("id") % 7).as("x")), 1)
      val ndv = VersionedTable.tableNdv(spark, nroot)
      assert(ndv.get("id").exists(n => n > 1900 && n < 2100),
        s"sketch-only commit path must keep estimating, got $ndv")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("FUSED ANALYZE (repinStats): one pass + ONE manifest " +
    "transition produces per-dir lines equivalent to the sequential " +
    "per-family repins, and rebuilds bloom sidecars") {
    val tmp = java.nio.file.Files.createTempDirectory("fusedrepin")
    try {
      def build(at: String): String = {
        val root = tmp.resolve(at).toString
        def rows(from: Long, n: Long) = spark.range(from, from + n)
          .select(col("id").as("doc_id"),
            md5(col("id").cast("string")).as("fp"),
            (col("id") % 997).as("n_chars"))
        VersionedTable.init(spark, root, rows(0, 2000))
        VersionedTable.append(spark, root, rows(2000, 1500), 0)
        root
      }
      val fusedRoot = build("fused")
      val seqRoot = build("seq")
      // pre-pin both the same way so the repins start identical
      Seq(fusedRoot, seqRoot).foreach { r =>
        VersionedTable.enableNdvStats(spark, r, Seq("doc_id"))
        VersionedTable.enableQuantileStats(spark, r, Seq("n_chars"))
        VersionedTable.enableBloomFilters(spark, r, Seq("fp"))
      }
      val vBefore = VersionedTable.latestVersion(spark, fusedRoot)
      val vAfter = VersionedTable.repinStats(spark, fusedRoot,
        Seq("doc_id"))
      assert(vAfter == vBefore + 1,
        "fused ANALYZE must commit exactly ONE version")
      VersionedTable.repinNdvStats(spark, seqRoot, Seq("doc_id"))
      VersionedTable.repinQuantileStats(spark, seqRoot, Seq("n_chars"))
      // the same-content fixtures were committed through the same
      // sequence, so dir CONTENTS correspond even though uuid names
      // differ — compare the family outputs, not the raw lines
      val fusedNdv = VersionedTable.tableNdv(spark, fusedRoot)
      val seqNdv = VersionedTable.tableNdv(spark, seqRoot)
      assert(fusedNdv.keySet == seqNdv.keySet && fusedNdv.nonEmpty)
      assert(fusedNdv("doc_id") == seqNdv("doc_id"),
        s"HLL union is content-associative: fused $fusedNdv must " +
          s"equal sequential $seqNdv exactly")
      val fm = VersionedTable.tableColumnSketch(spark, fusedRoot,
        "n_chars").get.getQuantile(0.5)
      val sm = VersionedTable.tableColumnSketch(spark, seqRoot,
        "n_chars").get.getQuantile(0.5)
      assert(math.abs(fm - sm) <= 30,
        s"fused KLL median $fm must match sequential $sm within rank " +
          "error")
      // pins present and correct in the ONE new manifest
      assert(VersionedTable.ndvColumns(spark, fusedRoot)
        .contains(Seq("doc_id")))
      assert(VersionedTable.quantileColumns(spark, fusedRoot)
        .contains(Seq("n_chars")))
      // bloom sidecars rebuilt: point lookups prune
      val probe = spark.range(42, 43)
        .select(md5(col("id").cast("string"))).head.getString(0)
      val schema = VersionedTable.read(spark, fusedRoot).schema
      val pred = VersionedTable.resolveCondition(spark, schema,
        col("fp") === probe).get
      val (_, pruned, covered) = VersionedTable.prunedPaths(
        spark, fusedRoot, pred)
      assert(covered > 0 && pruned > 0,
        s"fused ANALYZE must rebuild sidecars that prune " +
          s"($pruned/$covered)")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("repinPinnedStats: the no-new-pin fused recovery re-sketches " +
    "exactly the PINNED families — a KLL+bloom table heals both in " +
    "one commit without acquiring an NDV pin; nothing pinned refuses") {
    val tmp = java.nio.file.Files.createTempDirectory("pinnedrepin")
    try {
      val root = tmp.resolve("t").toString
      def rows(from: Long, n: Long) = spark.range(from, from + n)
        .select(col("id").as("doc_id"),
          md5(col("id").cast("string")).as("fp"),
          (col("id") % 997).as("n_chars"))
      VersionedTable.init(spark, root, rows(0, 2000))
      VersionedTable.enableQuantileStats(spark, root, Seq("n_chars"))
      VersionedTable.enableBloomFilters(spark, root, Seq("fp"))
      val before = VersionedTable.latestVersion(spark, root)
      val v = VersionedTable.repinPinnedStats(spark, root)
      assert(v == before + 1, "one commit")
      assert(VersionedTable.ndvColumns(spark, root).isEmpty,
        "repinPinnedStats must NOT acquire an NDV pin")
      assert(VersionedTable.quantileColumns(spark, root)
        .contains(Seq("n_chars")))
      assert(VersionedTable.tableColumnSketch(spark, root, "n_chars")
        .isDefined)
      // sidecars rebuilt in the same pass: a point lookup prunes
      val probe = spark.range(9, 10)
        .select(md5(col("id").cast("string"))).head.getString(0)
      val pred = VersionedTable.resolveCondition(spark,
        VersionedTable.read(spark, root).schema,
        col("fp") === probe).get
      assert(VersionedTable.prunedPaths(spark, root, pred)._2 > 0)
      // an UNpinned table has nothing to re-sketch: loud refusal
      val bare = tmp.resolve("bare").toString
      VersionedTable.init(spark, bare, rows(0, 10))
      assert(intercept[IllegalArgumentException] {
        VersionedTable.repinPinnedStats(spark, bare)
      }.getMessage.contains("no family is pinned"))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("FUSED ANALYZE heals doctored-domain sketches AND sidecars in " +
    "one commit; a quantile pin narrowed to nothing leaves that " +
    "family untouched instead of half-applying") {
    val tmp = java.nio.file.Files.createTempDirectory("fusedheal")
    try {
      val root = tmp.resolve("t").toString
      def rows(from: Long, n: Long) = spark.range(from, from + n)
        .select(col("id").as("doc_id"),
          md5(col("id").cast("string")).as("fp"),
          (col("id") % 997).as("n_chars"))
      VersionedTable.init(spark, root, rows(0, 2000))
      VersionedTable.enableNdvStats(spark, root, Seq("doc_id"))
      VersionedTable.enableQuantileStats(spark, root, Seq("n_chars"))
      VersionedTable.enableBloomFilters(spark, root, Seq("fp"))
      // doctor every sidecar to a FUTURE probe domain (coverage
      // reads absent) — one fused ANALYZE must restore everything
      VersionedTable.dataDirs(spark, root).foreach { d =>
        val p = new java.io.File(d, BloomSkipping.SidecarName).toPath
        val bytes = java.nio.file.Files.readAllBytes(p)
        val buf = java.nio.ByteBuffer.wrap(bytes)
        buf.putInt(8, buf.getInt(8) + 1)
        java.nio.file.Files.write(p, bytes)
        new java.io.File(new java.io.File(d),
          s".${BloomSkipping.SidecarName}.crc").delete()
      }
      BloomSkipping.invalidateUnder(root)
      val probe = spark.range(7, 8)
        .select(md5(col("id").cast("string"))).head.getString(0)
      val schema = VersionedTable.read(spark, root).schema
      val pred = VersionedTable.resolveCondition(spark, schema,
        col("fp") === probe).get
      assert(VersionedTable.prunedPaths(spark, root, pred)._2 == 0,
        "doctored sidecars must read as no coverage")
      VersionedTable.repinStats(spark, root, Seq("doc_id"))
      assert(VersionedTable.prunedPaths(spark, root, pred)._2 > 0,
        "one fused ANALYZE must rebuild current-domain sidecars")
      assert(VersionedTable.tableNdv(spark, root).contains("doc_id"))
      assert(VersionedTable.tableColumnSketch(spark, root, "n_chars")
        .isDefined)
      // narrowed-to-nothing: a full rewrite that drops the pinned
      // quantile column leaves a pin with no eligible target — the
      // fused ANALYZE must still repin NDV, keep the stale quantile
      // pin VISIBLE (not silently drop it), and not throw
      VersionedTable.commit(spark, root,
        VersionedTable.read(spark, root).drop("n_chars"),
        expectedVersion = VersionedTable.latestVersion(spark, root))
      val v = VersionedTable.repinStats(spark, root, Seq("doc_id"))
      assert(VersionedTable.ndvColumns(spark, root, Some(v))
        .contains(Seq("doc_id")))
      assert(VersionedTable.quantileColumns(spark, root, Some(v))
        .contains(Seq("n_chars")),
        "a pin narrowed to nothing stays visible for the DBA to " +
          "disable or re-target")
      assert(VersionedTable.tableNdv(spark, root, Some(v))
        .contains("doc_id"))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
