package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.log.Bloom

/** Log-level Bloom file skipping: codec properties (no false negative,
  * honest FP band), sizing, the write-path build + read-path probe E2E,
  * and the property validation. */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("codec: inserted values always hit; absent values mostly miss") {
    val bits = new Array[Byte](Bloom.MinBits / 8)
    val present = (0 until 1000).map(i => Bloom.hashLiteral(s"val-$i"))
    present.foreach(h => Bloom.set(bits, h))
    assert(present.forall(h => Bloom.mightContain(bits, h)),
      "a bloom can never false-negative")
    val absent = (0 until 1000).count(i =>
      Bloom.mightContain(bits, Bloom.hashLiteral(s"other-$i")))
    // double hashing gives k=4 genuinely independent probes: at this
    // load (1000 keys / 16384 bits) fill ≈ 0.22, FP ≈ fill^4 ≈ 0.2% —
    // the band here allows 10x that
    assert(absent < 30, s"FP rate out of band: $absent/1000")
    // sizing: grows with rows, clamped both ends
    assert(Bloom.bitsFor(10) == Bloom.MinBits)
    assert(Bloom.bitsFor(10000) == 1 << 18)
    assert(Bloom.bitsFor(Long.MaxValue / 32) == Bloom.MaxBits)
    // probe positions: full m range reachable, k distinct for typical
    // hashes (h2 forced odd -> full-period stride mod power-of-two m)
    val ps = (0 until 1000).map(i =>
      Bloom.positions(Bloom.hashLiteral(s"p-$i"), Bloom.MaxBits))
    assert(ps.forall(_.forall(p => p >= 0 && p < Bloom.MaxBits)))
    assert(ps.count(_.distinct.length == Bloom.Probes) > 990,
      "4 probes must be independent, not windowed rehashes of each other")
    assert(ps.flatten.count(_ >= Bloom.MaxBits / 2) > 1500,
      "positions must cover the upper half of the array too")
    // saturation rule: an empty filter persists, a full one never does
    assert(Bloom.worthPersisting(new Array[Byte](2048)))
    assert(!Bloom.worthPersisting(Array.fill[Byte](2048)(0xFF.toByte)))
  }

  test("build + probe E2E: point lookups skip files, conservatively") {
    val dir = Files.createTempDirectory("bloom").resolve("nation").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    // two files interleaved by key parity: min/max ranges fully overlap
    Seq(0, 1).foreach { m =>
      graft.streaming.GwSink.append(
        src.filter(col("n_nationkey") % 2 === m).coalesce(1), dir,
        bootstrapProps = Map(Bloom.ColumnsProp -> "n_nationkey,n_name"))
    }
    val t = GwTable.forPath(spark, dir)
    val snap = t.snapshot()
    assert(snap.files.forall(f =>
      Bloom.ofFile(f, "n_nationkey").isDefined &&
        Bloom.ofFile(f, "n_name").isDefined))
    // the LOG stays O(1) per file: bitsets live in _bloom/ sidecars, the
    // stats JSON carries only path/offset/length/crc descriptors — at
    // 100 TB file counts log-resident bitsets would add GBs to every
    // checkpoint and to the driver's replay footprint
    snap.files.foreach { f =>
      val s = f.stats.get
      assert(s.length < 1200, s"stats JSON must stay descriptor-sized: ${s.length}")
      assert(!s.contains("\"gwBloom\":"), "no inline base64 bitsets in the log")
      val ref = Bloom.refOf(f, "n_nationkey").get
      assert(ref.path.contains("/_bloom/") && ref.length >= Bloom.MinBits / 8)
      assert(new java.io.File(
        new org.apache.hadoop.fs.Path(ref.path).toUri.getPath).exists,
        s"sidecar must exist on disk: ${ref.path}")
    }
    // equality constraints resolve through the bloom: key 4 lives in the
    // even file only
    import graft.log.{Bound, ColRange}
    def plannedFor(c: ColRange): Int = snap.filesForRanges(Seq(c)).size
    assert(plannedFor(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(4))), Some(Bound.Num(BigDecimal(4))))) == 1)
    // string column equality too
    val name = src.filter(col("n_nationkey") === 7).collect().head.getString(1)
    assert(plannedFor(ColRange("n_name",
      Some(Bound.Str(name)), Some(Bound.Str(name)))) == 1)
    // a value in no file prunes everything; a RANGE constraint never
    // consults the bloom (conservative)
    assert(plannedFor(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(999))), Some(Bound.Num(BigDecimal(999))))) == 0)
    assert(plannedFor(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(0))), Some(Bound.Num(BigDecimal(24))))) == 2)
    // IN-list constraints probe the bloom per member: {4, 6} both live in
    // the even file; {4, 7} straddles; {990, 999} hits nothing
    def inRange(vs: Int*): ColRange = {
      val bs = vs.map(v => Bound.Num(BigDecimal(v)))
      ColRange("n_nationkey", Some(bs.head), Some(bs.last), anyOf = bs)
    }
    assert(plannedFor(inRange(4, 6)) == 1)
    assert(plannedFor(inRange(4, 7)) == 2)
    assert(plannedFor(inRange(990, 999)) == 0)
    // full contents still read correctly through the connector
    assert(spark.read.format("gwdelta").load(dir).count() == 25)
    // maintenance rewrite REBUILDS the blooms on the compacted files:
    // point-lookup pruning survives OPTIMIZE instead of silently demoting
    // to rowgroup-level on the compacted mass
    assert(t.compact(targetFileBytes = 1L << 30) > 0)
    val folded = t.snapshot().files
    assert(folded.forall(f => Bloom.ofFile(f, "n_nationkey").isDefined &&
      Bloom.ofFile(f, "n_name").isDefined),
      "compacted files must carry rebuilt blooms for every declared column")
    assert(spark.read.format("gwdelta").load(dir)
      .filter(col("n_nationkey") === 4).count() == 1)
  }

  test("parquet-native rowgroup blooms: written by sink + compaction for declared columns") {
    import scala.jdk.CollectionConverters._
    def hasNativeBloom(path: String, column: String): Boolean = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.forall { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == column)
          .exists { cc =>
            cc.getBloomFilterOffset >= 0 &&
              r.getBloomFilterDataReader(b).readBloomFilter(cc) != null
          }
      } finally r.close()
    }
    val dir = Files.createTempDirectory("pqbloom").resolve("t").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    Seq(0, 1).foreach { m =>
      graft.streaming.GwSink.append(
        src.filter(col("n_nationkey") % 2 === m).coalesce(1), dir,
        bootstrapProps = Map(Bloom.ColumnsProp -> "n_nationkey"))
    }
    val t = GwTable.forPath(spark, dir)
    t.snapshot().files.foreach { f =>
      assert(hasNativeBloom(f.path, "n_nationkey"),
        s"sink-written file must carry a parquet-native bloom: ${f.path}")
      assert(!hasNativeBloom(f.path, "n_name"),
        "undeclared columns must not pay for a bloom")
    }
    // compaction rebuilds the ENGINE blooms AND keeps writing native
    // ones — file-level and rowgroup skipping both survive maintenance
    assert(t.compact(targetFileBytes = 1L << 30) > 0)
    val compacted = t.snapshot().files
    assert(compacted.forall(f => Bloom.refOf(f, "n_nationkey").isDefined),
      "compacted files must carry rebuilt engine blooms")
    compacted.foreach(f => assert(hasNativeBloom(f.path, "n_nationkey"),
      s"compacted file must carry a parquet-native bloom: ${f.path}"))
    assert(spark.read.format("gwdelta").load(dir)
      .filter(col("n_nationkey") === 4).count() == 1)
  }

  test("sidecar lifecycle: vacuum sweeps orphans, referenced sidecars survive") {
    val dir = Files.createTempDirectory("bloomvac").resolve("t").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    Seq(0, 1).foreach { m =>
      graft.streaming.GwSink.append(
        src.filter(col("n_nationkey") % 2 === m).coalesce(1), dir,
        bootstrapProps = Map(Bloom.ColumnsProp -> "n_nationkey"))
    }
    val t = GwTable.forPath(spark, dir)
    val sidecars = t.snapshot().files.flatMap(Bloom.sidecarPaths).distinct
      .map(p => new java.io.File(new org.apache.hadoop.fs.Path(p).toUri.getPath))
    assert(sidecars.nonEmpty && sidecars.forall(_.exists))
    // plant an orphan (a crashed build's debris) and backdate everything
    // past the debris age floor — only the orphan may be swept
    val orphan = new java.io.File(
      new org.apache.hadoop.fs.Path(dir, "_bloom/orphan.bin").toUri.getPath)
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - GwTable.DebrisMinAgeMs - 3600 * 1000)
    (orphan +: sidecars).foreach(f =>
      java.nio.file.Files.setLastModifiedTime(f.toPath, old))
    GwTable.withRetentionCheckDisabled(spark)(t.vacuum(retentionMs = 0L))
    assert(!orphan.exists, "orphaned sidecar must be debris-swept")
    assert(sidecars.forall(_.exists), "referenced sidecars must survive")
    // probing still prunes after the sweep
    import graft.log.{Bound, ColRange}
    assert(t.snapshot().filesForRanges(Seq(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(4))), Some(Bound.Num(BigDecimal(4)))))).size == 1)
  }

  test("deep clone owns its bloom sidecars: source deletion cannot degrade pruning") {
    val root = Files.createTempDirectory("bloomclone")
    val srcDir = root.resolve("src").toString
    val cloneDir = root.resolve("clone").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    Seq(0, 1).foreach { m =>
      graft.streaming.GwSink.append(
        src.filter(col("n_nationkey") % 2 === m).coalesce(1), srcDir,
        bootstrapProps = Map(Bloom.ColumnsProp -> "n_nationkey"))
    }
    assert(GwTable.forPath(spark, srcDir).deepCloneTo(cloneDir) == 0L)
    val c = GwTable.forPath(spark, cloneDir)
    // every descriptor must point INSIDE the clone's tree
    c.snapshot().files.foreach { f =>
      val ref = Bloom.refOf(f, "n_nationkey").get
      assert(ref.path.contains("/clone/") && ref.path.contains("/_bloom/"),
        s"clone descriptor still points at the source: ${ref.path}")
    }
    // the source disappearing entirely must not cost the clone its pruning
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    import graft.log.{Bound, ColRange}
    assert(c.snapshot().filesForRanges(Seq(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(4))), Some(Bound.Num(BigDecimal(4)))))).size == 1,
      "clone-owned sidecars must keep point-lookup pruning alive")
    assert(spark.read.format("gwdelta").load(cloneDir).count() == 25)
  }

  test("corrupt sidecar degrades to keep-the-file, never a fabricated miss") {
    val dir = Files.createTempDirectory("bloomcrc").resolve("t").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    Seq(0, 1).foreach { m =>
      graft.streaming.GwSink.append(
        src.filter(col("n_nationkey") % 2 === m).coalesce(1), dir,
        bootstrapProps = Map(Bloom.ColumnsProp -> "n_nationkey"))
    }
    val t = GwTable.forPath(spark, dir)
    // garbage every sidecar byte BEFORE any probe caches the real bits:
    // CRC verification must reject the load and pruning must keep both
    // files (conservative), not prune on garbage bits
    t.snapshot().files.flatMap(Bloom.sidecarPaths).distinct.foreach { p =>
      val f = new java.io.File(new org.apache.hadoop.fs.Path(p).toUri.getPath)
      val garbage = Array.fill[Byte](f.length.toInt)(0)
      java.nio.file.Files.write(f.toPath, garbage)
    }
    import graft.log.{Bound, ColRange}
    assert(t.snapshot().filesForRanges(Seq(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(4))), Some(Bound.Num(BigDecimal(4)))))).size == 2,
      "a CRC-failing sidecar must degrade to no-bloom (keep), not prune")
    assert(spark.read.format("gwdelta").load(dir)
      .filter(col("n_nationkey") === 4).count() == 1)
  }

  test("property validation: unknown column and non-hashable type refuse") {
    val dir = Files.createTempDirectory("bloomval").resolve("t").toString
    spark.read.parquet(s"$sf/customer.parquet").coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    val t = GwTable.forPath(spark, dir)
    intercept[IllegalArgumentException](
      t.updateProperties(Map(Bloom.ColumnsProp -> "nope")))
    intercept[IllegalArgumentException](
      t.updateProperties(Map(Bloom.ColumnsProp -> "c_acctbal"))) // double
    assert(t.updateProperties(Map(Bloom.ColumnsProp -> "c_custkey,c_name")) > 0)
    // the property can BYPASS updateProperties (bootstrap props, a
    // foreign-written configuration): the BUILD must re-check types from
    // the actual schema — a double/timestamp bloom would hash strings the
    // probe's canonical form never matches, silently pruning matches
    val dir2 = Files.createTempDirectory("bloomforeign").resolve("t").toString
    graft.streaming.GwSink.append(
      spark.read.parquet(s"$sf/customer.parquet").coalesce(1), dir2,
      bootstrapProps = Map(Bloom.ColumnsProp -> "c_acctbal,c_custkey"))
    val t2 = GwTable.forPath(spark, dir2)
    t2.snapshot().files.foreach { f =>
      assert(Bloom.refOf(f, "c_acctbal").isEmpty,
        "non-hashable declared column must be SKIPPED at build time")
      assert(Bloom.refOf(f, "c_custkey").isDefined,
        "hashable declared columns still build")
    }
  }

  test("build plan: map-side partial aggregation, no raw per-row hash shuffle") {
    // the CONVERT/backfill scale contract: the build's exchange must carry
    // one partially-built bitset per (file x partition), never every row's
    // (path, hash) — pinned as ObjectHashAggregate(partial) BELOW the
    // exchange and the final merge above it (a groupByKey.mapGroups shape
    // would plan MapGroups with the full row stream crossing the shuffle)
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .select(org.apache.spark.sql.functions.col("_metadata.file_path").as("__enc"),
        org.apache.spark.sql.functions.xxhash64(
          col("n_nationkey").cast("string")).as("n_nationkey"))
    val frame = Bloom.aggFrame(src, Seq("n_nationkey"),
      Map("dummy" -> Bloom.MinBits))
    val plan = frame.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    assert(aggs.size == 2, s"expected partial+final ObjectHashAggregate, got:\n$plan")
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, Final}
    assert(aggs.exists(_.aggregateExpressions.forall(_.mode == Partial)),
      "map-side partial bitset aggregation must sit below the exchange")
    assert(aggs.exists(_.aggregateExpressions.forall(_.mode == Final)),
      "final OR-merge must sit above the exchange")
    assert(plan.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
      "partial/final split must straddle a shuffle exchange")
    // the partial aggregate must be the exchange's CHILD (combine before shuffle)
    val ex = plan.collect { case e: ShuffleExchangeExec => e }.head
    assert(ex.child.collectFirst { case a: ObjectHashAggregateExec => a }
      .exists(_.aggregateExpressions.forall(_.mode == Partial)),
      "the exchange input must already be partially aggregated")
  }

  test("aggregate build produces the same bitsets as a direct fold") {
    // one file, known rows: the BloomBitsetAgg result must equal folding
    // the same canonical-string hashes into a bitset sized by numRecords
    val dir = Files.createTempDirectory("bloomagg").resolve("t").toString
    val src = spark.read.parquet(s"$sf/nation.parquet").coalesce(1)
    graft.streaming.GwSink.append(src, dir,
      bootstrapProps = Map(Bloom.ColumnsProp -> "n_name"))
    val f = GwTable.forPath(spark, dir).snapshot().files.head
    val bits = Bloom.ofFile(f, "n_name").get
    val n = graft.Dv.numRecords(f).get
    val expected = new Array[Byte](Bloom.bitsFor(n) / 8)
    src.select(col("n_name")).collect().foreach(r =>
      Bloom.set(expected, Bloom.hashLiteral(r.getString(0))))
    assert(java.util.Arrays.equals(bits, expected),
      "aggregate-built bitset must be byte-identical to the direct fold")
  }
}
