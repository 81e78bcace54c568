package graft

import graft.log._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/**
 * Spec-conformance goldens BEYOND the reference's four golden files
 * (`/root/reference/src/test/resources/delta/<v>.json` carry only plain
 * protocol/metaData/add/remove/commitInfo): the fixtures under
 * `/delta-conformance/` are hand-authored from the PUBLIC Delta
 * transaction-log protocol spec in the field order and value shapes
 * delta-spark itself emits — table-features protocol (3,7) with
 * reader/writer feature lists, partitioned metaData with configuration,
 * adds carrying partitionValues + stats + row-tracking fields + an inline
 * deletion vector, remove with `extendedFileMetadata`, `cdc`, `txn` with
 * `lastUpdated`, commitInfo with STRING-typed operationMetrics /
 * `engineInfo` / `userMetadata`, a foreign-written `domainMetadata`
 * action (parsed typed since the engine implements the feature), and a
 * fabricated `futureCompactionHint` action no engine knows (the
 * forward-compat skip case).
 *
 * This is the offline stand-in for foreign-reader interop (no delta jar
 * in the environment): the engine's reader must accept logs a FOREIGN
 * writer produced — foreign field order, unknown fields, unknown action
 * types — and replay them to the spec's snapshot semantics. The inverse
 * direction (foreign readers accepting OUR logs) is pinned by LogSpec's
 * byte-identical golden round trip and checkpoint-schema transcription.
 */
class LogConformanceSpec extends AnyFunSuite {

  private def fixtureLines: Seq[(Long, Seq[String])] =
    (0L to 2L).map { v =>
      val url = getClass.getResource(f"/delta-conformance/$v%020d.json")
      val text = new String(
        Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
      v -> text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    }

  test("every spec action parses; unknown action types skip (forward compat)") {
    val parsed = fixtureLines.flatMap(_._2).map(l => l -> Actions.fromJson(l))
    // exactly one line is an unknown action (futureCompactionHint) —
    // None, not a crash; the foreign domainMetadata parses TYPED
    val unknown = parsed.filter(_._2.isEmpty)
    assert(unknown.map(_._1).forall(_.contains("futureCompactionHint")),
      s"only futureCompactionHint may be unknown: ${unknown.map(_._1)}")
    assert(unknown.size == 1)
    assert(parsed.exists(_._2.exists(_ ==
      DomainMetadata("delta.clustering", """{"clusteringColumns":[]}"""))),
      "the foreign domainMetadata must parse typed")
    // every parsed action semantically round-trips through OUR writer
    // (byte order may differ — field order is the foreign writer's)
    parsed.collect { case (_, Some(a)) =>
      assert(Actions.fromJson(Actions.toJson(a)).contains(a))
    }
  }

  test("foreign-shaped fields land typed: features, DV, row ids, metrics, audit") {
    val acts = fixtureLines.flatMap(_._2).flatMap(Actions.fromJson)
    val proto = acts.collectFirst { case p: Protocol => p }.get
    assert(proto == Protocol(3, 7, Some(Seq("deletionVectors")),
      Some(Seq("deletionVectors", "changeDataFeed", "rowTracking",
        "appendOnly", "invariants"))))
    val meta = acts.collectFirst { case m: Metadata => m }.get
    assert(meta.partitionColumns == Seq("p"))
    assert(meta.configuration("delta.enableRowTracking") == "true")
    // delta-spark writes operationMetrics values as STRINGS — they must
    // still land as numbers, not zeros
    val ci = acts.collectFirst { case c: CommitInfo => c }.get
    assert(ci.numFiles == 2L && ci.numOutputBytes == 2048L)
    assert(acts.collectFirst {
      case c: CommitInfo if c.operation == "TRUNCATE" => c
    }.get.userMetadata.contains("quarterly purge, ticket OPS-1234"))
    // the DV'd re-add carries descriptor AND keeps its row-tracking base
    val dvAdd = acts.collect { case a: AddFile if a.dv.isDefined => a }
    assert(dvAdd.size == 1)
    assert(dvAdd.head.dv.get == DvDescriptor("i", "000000lW000000aC0000",
      Some(0), 16, 1L))
    assert(dvAdd.head.baseRowId.contains(0L) &&
      dvAdd.head.defaultRowCommitVersion.contains(0L))
    val txn = acts.collectFirst { case t: SetTransaction => t }.get
    assert(txn == SetTransaction("stream-app-1", 7L, Some(1700000001000L)))
    val cdc = acts.collectFirst { case c: CdcFile => c }.get
    assert(cdc.path.startsWith("_change_data/") && !cdc.dataChange)
  }

  test("replay through the REAL log reader matches spec snapshot semantics") {
    // materialize the fixtures as an actual _delta_log and read through
    // GwLog — version listing, JSON replay, checkpointing included
    val dir = Files.createTempDirectory("conformance").resolve("t")
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    fixtureLines.foreach { case (v, lines) =>
      Files.write(logDir.resolve(f"$v%020d.json"),
        (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    }
    val log = GwLog.forTable(new Configuration(), dir.toString)
    assert(log.listVersions() == Seq(0L, 1L, 2L))
    // v0: two live partitioned files, row ids assigned by the writer
    val s0 = log.snapshot(Some(0L))
    assert(s0.files.map(_.path).toSet == Set(
      "p=a/part-00000-aaaa.c000.snappy.parquet",
      "p=b/part-00001-bbbb.c000.snappy.parquet"))
    assert(s0.files.forall(_.partitionValues.nonEmpty))
    assert(s0.metadata.get.partitionColumns == Seq("p"))
    // v1: the DV re-add REPLACES the plain add for the same path
    // (last-writer-wins by path, per spec), txn high-water recorded, cdc
    // never part of table state
    val s1 = log.snapshot(Some(1L))
    assert(s1.files.size == 2)
    val dvFile = s1.files.find(_.path.startsWith("p=a/")).get
    assert(dvFile.dv.isDefined, "DV'd add must replace the plain add")
    assert(s1.transactions == Map("stream-app-1" -> 7L))
    assert(!s1.files.exists(_.path.startsWith("_change_data/")))
    // v2: remove tombstones p=b; the foreign domainMetadata lands as a
    // live domain; the unknown futureCompactionHint changes nothing
    val s2 = log.snapshot(None)
    assert(s2.version == 2L)
    assert(s2.domains ==
      Map("delta.clustering" -> """{"clusteringColumns":[]}"""))
    assert(s2.files.map(_.path) == Seq("p=a/part-00000-aaaa.c000.snappy.parquet"))
    assert(s2.tombstones.map(_.path) ==
      Seq("p=b/part-00001-bbbb.c000.snappy.parquet"))
    // stats survive foreign shape: file-skipping still prunes on them
    assert(s2.filesForRange("k", 5, 9).isEmpty)
    assert(s2.filesForRange("k", 1, 1).size == 1)
    // and every action the spec log carries survives OUR checkpoint
    // parquet transcription unchanged
    val conf = new Configuration()
    // checkpoint state excludes commit-scoped actions (commitInfo, cdc)
    // per the spec — the writer refuses them typed
    val all = fixtureLines.flatMap(_._2).flatMap(Actions.fromJson)
      .filterNot(a => a.isInstanceOf[CommitInfo] || a.isInstanceOf[CdcFile])
    val target = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("ckpt").toString, "c.parquet")
    Checkpoint.write(target, conf, all)
    assert(Checkpoint.read(target, conf) == all)
  }

  // ---- feature-COMBINATION goldens (`/delta-conformance-combo/`): one
  // log where in-commit timestamps, rowTracking fields, cdc actions, a
  // rowTracking domainMetadata, and (engine-written) MULTI-PART
  // checkpointing all co-occur — each feature is spec-conformant alone;
  // these pin that they stay conformant TOGETHER through parse, replay,
  // the ICT clock, and the multi-part checkpoint round trip.

  private def comboLines: Seq[(Long, Seq[String])] =
    (0L to 2L).map { v =>
      val url = getClass.getResource(f"/delta-conformance-combo/$v%020d.json")
      val text = new String(
        Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
      v -> text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    }

  private def materializeCombo(): (java.nio.file.Path, GwLog, Configuration) = {
    val dir = Files.createTempDirectory("combo").resolve("t")
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    comboLines.foreach { case (v, lines) =>
      Files.write(logDir.resolve(f"$v%020d.json"),
        (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    }
    val conf = new Configuration()
    (dir, GwLog.forTable(conf, dir.toString), conf)
  }

  test("combo: ICT + rowTracking + cdc co-occurring parse and replay to spec state") {
    val (_, log, _) = materializeCombo()
    // every line parses, the domainMetadata typed (the engine implements
    // the feature) and landing as a live domain
    val parsed = comboLines.flatMap(_._2).map(l => l -> Actions.fromJson(l))
    assert(parsed.forall(_._2.isDefined),
      s"unparsed: ${parsed.filter(_._2.isEmpty).map(_._1)}")
    val s = log.snapshot(None)
    assert(s.domains ==
      Map("delta.rowTracking" -> """{"rowIdHighWaterMark":3}"""))
    // live files after the CDC UPDATE rewrite + append: the rewrite's add
    // REPLACED part-00000 and minted fresh row ids; survivors keep theirs
    assert(s.files.map(f => (f.path, f.baseRowId, f.defaultRowCommitVersion))
      .sortBy(_._1) == Seq(
      ("part-00001-dddd.c000.snappy.parquet", Some(2L), Some(0L)),
      ("part-00002-eeee.c000.snappy.parquet", Some(4L), Some(1L)),
      ("part-00003-abcd.c000.snappy.parquet", Some(6L), Some(2L))))
    // cdc files are commit-scoped, never table state; txn high-water rides
    assert(!s.files.exists(_.path.startsWith("_change_data/")))
    assert(s.transactions == Map("combo-stream" -> 3L))
    assert(s.tombstones.map(_.path) == Seq("part-00000-cccc.c000.snappy.parquet"))
    // the cdc action itself parsed typed in its commit
    assert(log.readVersion(1L).collectFirst { case c: CdcFile => c }
      .exists(c => c.path.startsWith("_change_data/") && !c.dataChange))
  }

  test("combo: the ICT clock resolves time travel, immune to wall-clock regression") {
    val (_, log, _) = materializeCombo()
    // v1's WALL clock (1700000099000) runs BEHIND v0's, but its
    // inCommitTimestamp (prev + 1) keeps the commit clock monotone —
    // TIMESTAMP AS OF must resolve on the ICT, never the wall clock
    assert(log.versionAtTimestamp(1700000100123L) == 0L)
    assert(log.versionAtTimestamp(1700000100124L) == 1L)
    assert(log.versionAtTimestamp(1700000200499L) == 1L)
    assert(log.versionAtTimestamp(1700000200500L) == 2L)
    val icts = log.history().flatMap(_._2).map(_.effectiveTimestamp)
    assert(icts == icts.sorted && icts.distinct == icts,
      s"effective commit clock must be strictly monotone: $icts")
  }

  test("combo: multi-part checkpoint round-trips the full feature state") {
    val (_, log0, conf) = materializeCombo()
    val before = log0.snapshot(None)
    // force parts: 7 checkpointable actions (protocol, metadata, txn, the
    // rowTracking domainMetadata, 3 adds; the 2023-dated tombstone ages
    // OUT per the spec's retention) at 2 actions/part = 4 parts
    conf.setInt("graft.checkpoint.partSize", 2)
    log0.writeCheckpoint(2L)
    val parts = (1 to 4).map(p => log0.checkpointPartPathFor(2L, p, 4))
    parts.foreach(p => assert(
      new java.io.File(p.toUri.getPath).exists, s"missing part $p"))
    assert(!new java.io.File(
      log0.checkpointPathFor(2L).toUri.getPath).exists,
      "no single-file checkpoint when parts were written")
    assert(log0.listCheckpoints() == Seq(2L))
    // TORN SET: hide one part — the reader must refuse the partial set and
    // serve the identical snapshot from JSON replay
    val hidden = new java.io.File(parts(1).toUri.getPath)
    val aside = new java.io.File(hidden.getParentFile, "aside.bin")
    assert(hidden.renameTo(aside))
    val torn = log0.snapshot(None)
    assert(torn.files.map(_.path).sorted == before.files.map(_.path).sorted &&
      torn.transactions == before.transactions,
      "a torn multi-part set must fall back to JSON replay, never partial state")
    assert(aside.renameTo(hidden))
    // RESUME PATH: delete the pre-checkpoint JSONs (metadata-retention
    // shape) so the state can ONLY come from the parts — every feature
    // field must survive the parquet transcription across parts
    Seq(0L, 1L).foreach(v =>
      assert(new java.io.File(log0.logPathFor(v).toUri.getPath).delete()))
    val resumed = GwLog.forTable(conf, log0.tablePath.toString).snapshot(None)
    assert(resumed.version == 2L)
    assert(resumed.files.map(f =>
      (f.path, f.baseRowId, f.defaultRowCommitVersion, f.stats)).sortBy(_._1) ==
      before.files.map(f =>
        (f.path, f.baseRowId, f.defaultRowCommitVersion, f.stats)).sortBy(_._1),
      "row-tracking fields and stats must survive the multi-part transcription")
    assert(resumed.transactions == before.transactions)
    assert(resumed.metadata.map(_.configuration) == before.metadata.map(_.configuration))
    assert(resumed.protocol == before.protocol)
    assert(resumed.domains == before.domains && resumed.domains.nonEmpty,
      "live domains must survive the multi-part transcription")
    // expired tombstone dropped at checkpoint time (spec retention)
    assert(before.tombstones.nonEmpty && resumed.tombstones.isEmpty)
    // file-skipping still prunes from checkpoint-borne stats
    assert(resumed.filesForRange("k", 100, 200).isEmpty)
    assert(resumed.filesForRange("k", 5, 7).map(_.path) ==
      Seq("part-00003-abcd.c000.snappy.parquet"))
  }

  test("v2 checkpoint actions parse from and render to the spec wire shape") {
    // field names and shapes per the Delta protocol's v2Checkpoint spec
    val cm = """{"checkpointMetadata":{"version":7}}"""
    val sc = """{"sidecar":{"path":"016ae953-37a9-438e-8683-9a9a4a79a395.parquet","sizeInBytes":2304522,"modificationTime":1512909768000}}"""
    assert(Actions.fromJson(cm).contains(CheckpointMetadata(7L)))
    assert(Actions.fromJson(sc).contains(SidecarFile(
      "016ae953-37a9-438e-8683-9a9a4a79a395.parquet", 2304522L, 1512909768000L)))
    Seq(CheckpointMetadata(3L), SidecarFile("a.parquet", 10L, 20L)).foreach {
      a => assert(Actions.fromJson(Actions.toJson(a)).contains(a))
    }
  }

  test("combo: V2 checkpoint round-trips the full feature state") {
    val (_, log0, conf) = materializeCombo()
    // a FOREIGN writer opts the table into the v2 policy at v3 (the combo
    // protocol carries domainMetadata, which this engine rightly refuses
    // to WRITE through — so v3 is hand-authored like the fixtures): the
    // metadata gains delta.checkpointPolicy=v2 and the protocol gains the
    // v2Checkpoint feature in the same commit, as delta-spark emits
    val snap2 = log0.snapshot(None)
    val meta2 = snap2.metadata.get
    val p2 = snap2.protocol.get
    val v3Lines = Seq(
      Actions.toJson(p2.copy(
        readerFeatures = Some(p2.readerFeatures.getOrElse(Nil) :+ "v2Checkpoint"),
        writerFeatures = Some(p2.writerFeatures.getOrElse(Nil) :+ "v2Checkpoint"))),
      Actions.toJson(meta2.copy(configuration =
        meta2.configuration + ("delta.checkpointPolicy" -> "v2"))))
    Files.write(Paths.get(log0.logPathFor(3L).toUri.getPath),
      (v3Lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    val before = log0.snapshot(None)
    assert(before.protocol.exists(p =>
      p.readerFeatures.exists(_.contains("v2Checkpoint")) &&
        p.writerFeatures.exists(_.contains("v2Checkpoint"))))
    conf.setInt("graft.checkpoint.partSize", 2)
    try {
      log0.writeCheckpoint(3L)
      val cpFiles = log0.checkpointFilesFor(3L)
      assert(cpFiles.size == 1 && cpFiles.head.getName
        .matches(raw"0*3\.checkpoint\.[0-9a-f-]{36}\.parquet"),
        s"expected a UUID manifest, got $cpFiles")
      val manifest = Checkpoint.read(cpFiles.head, conf)
      assert(manifest.exists {
        case CheckpointMetadata(3L) => true; case _ => false })
      val refs = manifest.collect { case s: SidecarFile => s }
      assert(refs.size == 2, s"3 adds at partSize 2 = 2 sidecars, got $refs")
      assert(!manifest.exists(_.isInstanceOf[AddFile]))
      // TORN: hide a sidecar — never a partial snapshot
      val hidden = new java.io.File(
        new org.apache.hadoop.fs.Path(log0.sidecarDir, refs.head.path).toUri.getPath)
      val aside = new java.io.File(hidden.getParentFile, "aside.bin")
      assert(hidden.renameTo(aside))
      val torn = log0.snapshot(None)
      assert(torn.files.map(_.path).sorted == before.files.map(_.path).sorted)
      assert(aside.renameTo(hidden))
      // RESUME: state can only come from manifest + sidecars
      (0L to 2L).foreach(v =>
        assert(new java.io.File(log0.logPathFor(v).toUri.getPath).delete()))
      val resumed = GwLog.forTable(conf, log0.tablePath.toString).snapshot(None)
      assert(resumed.files.map(f =>
        (f.path, f.baseRowId, f.defaultRowCommitVersion, f.stats)).sortBy(_._1) ==
        before.files.map(f =>
          (f.path, f.baseRowId, f.defaultRowCommitVersion, f.stats)).sortBy(_._1))
      assert(resumed.transactions == before.transactions)
      assert(resumed.protocol == before.protocol)
      assert(resumed.filesForRange("k", 5, 7).map(_.path) ==
        Seq("part-00003-abcd.c000.snappy.parquet"),
        "stats-borne skipping must survive the sidecar transcription")
    } finally conf.unset("graft.checkpoint.partSize")
  }

  test("_last_checkpoint: typed parse of the full delta-spark schema; stale hints never mislead") {
    val dir = Files.createTempDirectory("conformance-lc").resolve("t")
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    def commitLine(v: Long, path: String): Unit =
      Files.write(logDir.resolve(f"$v%020d.json"), (Seq(
        if (v == 0L)
          """{"metaData":{"id":"cccc-1","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}"""
        else "") .filter(_.nonEmpty) ++ Seq(
        s"""{"add":{"path":"$path","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true}}"""))
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    commitLine(0L, "part-0.parquet")
    commitLine(1L, "part-1.parquet")
    commitLine(2L, "part-2.parquet")
    val log = GwLog.forTable(new Configuration(), dir.toString)
    // OUR emission round-trips typed with the delta-spark size fields
    log.writeCheckpoint(1L)
    val own = log.lastCheckpointHint().get
    assert(own.version == 1L && own.size > 0 &&
      own.sizeInBytes.exists(_ > 0L) && own.numOfAddFiles.contains(2L),
      s"got $own")
    // a FOREIGN delta-spark hint with the full optional field set parses
    // typed; unknown fields are carried past (forward compat). (Overwrite
    // through the hadoop fs so the local-fs CRC sidecar follows.)
    val hfs = new org.apache.hadoop.fs.Path(dir.toString)
      .getFileSystem(new Configuration())
    def putHint(s: String): Unit = {
      val out = hfs.create(new org.apache.hadoop.fs.Path(
        logDir.resolve("_last_checkpoint").toString), true)
      try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
    putHint("""{"version":2,"size":7,"parts":2,"sizeInBytes":123456,""" +
      """"numOfAddFiles":3,"checkpointSchema":{"type":"struct","fields":[]},""" +
      """"checksum":"abcd1234","tags":{"foo":"bar"},"futureField":9}""")
    val h = log.lastCheckpointHint().get
    assert(h == GwLog.LastCheckpointInfo(2L, 7L, Some(2), Some(123456L),
      Some(3L), Some("""{"type":"struct","fields":[]}"""), Some("abcd1234")),
      s"got $h")
    // the foreign hint is STALE/WRONG (no checkpoint exists at v2):
    // resolution stays listing-driven — snapshot serves all three adds
    // from the v1 checkpoint + JSON tail, never a torn v2 view
    assert(log.listCheckpoints() == Seq(1L))
    assert(log.snapshot(None).files.map(_.path).sorted ==
      Seq("part-0.parquet", "part-1.parquet", "part-2.parquet"))
    // a garbage hint parses to None and changes nothing
    putHint("not json")
    assert(log.lastCheckpointHint().isEmpty)
    assert(log.snapshot(None).files.size == 3)
  }

  test("foreign writer-only features the engine never writes replay typed; writes refuse") {
    val dir = Files.createTempDirectory("conformance-wf").resolve("t")
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    // invariants + icebergCompatV2: writer-burden features this engine
    // READS THROUGH (they constrain writers, not the read path) but must
    // never write through
    Files.write(logDir.resolve(f"${0L}%020d.json"), (Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors","invariants","icebergCompatV2"]}}""",
      """{"metaData":{"id":"dddd-1","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{"delta.enableIcebergCompatV2":"true"},"createdTime":1700000000000}}""",
      """{"add":{"path":"part-0.parquet","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true,"stats":"{\"numRecords\":2,\"minValues\":{\"k\":1},\"maxValues\":{\"k\":4},\"nullCount\":{\"k\":0}}"}}""")
      .mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    val log = GwLog.forTable(new Configuration(), dir.toString)
    val s = log.snapshot(None)
    // replay is fully typed: protocol lists carried verbatim, stats serve
    assert(s.protocol.exists(_.writerFeatures.exists(_.contains("icebergCompatV2"))))
    assert(s.files.size == 1 && s.filesForRange("k", 5, 9).isEmpty &&
      s.filesForRange("k", 2, 3).size == 1)
    Protocol.assertReadable("t", s.protocol.get)
    // ...but this engine must refuse to WRITE (it does not implement the
    // writer burdens those features impose) — the gate every batch/stream
    // write face resolves through (GwSink.tableMeta / GwTable.commitDml)
    val e = intercept[IllegalArgumentException] {
      Protocol.assertWritable("t", s.protocol.get)
    }
    assert(e.getMessage.contains("invariants") ||
      e.getMessage.contains("icebergCompatV2"))
  }

  test("checkpointProtection + vacuumProtocolCheck: foreign wire shapes parse; cleanup honors the marker") {
    val dir = Files.createTempDirectory("conformance-cp").resolve("t")
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    def write(v: Long, lines: Seq[String]): Unit =
      Files.write(logDir.resolve(f"$v%020d.json"),
        (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    // delta-spark wire shapes, hand-authored from the protocol spec: the
    // (3,7) feature lists plus the protected-history marker a TRUNCATE
    // HISTORY drop leaves behind
    write(0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck"],"writerFeatures":["vacuumProtocolCheck","checkpointProtection"]}}""",
      """{"metaData":{"id":"aaaabbbb-1111-2222-3333-444455556666","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{"delta.requireCheckpointProtectionBeforeVersion":"4"},"createdTime":1700000000000}}""",
      """{"add":{"path":"part-0.parquet","partitionValues":{},"size":100,"modificationTime":1700000000000,"dataChange":true}}"""))
    write(1L, Seq(
      """{"add":{"path":"part-1.parquet","partitionValues":{},"size":100,"modificationTime":1700000001000,"dataChange":true}}"""))
    write(2L, Seq(
      """{"add":{"path":"part-2.parquet","partitionValues":{},"size":100,"modificationTime":1700000002000,"dataChange":true}}"""))
    val log = GwLog.forTable(new Configuration(), dir.toString)
    val s = log.snapshot(None)
    assert(s.protocol.exists(p =>
      p.writerFeatures.exists(_.contains("checkpointProtection")) &&
        p.writerFeatures.exists(_.contains("vacuumProtocolCheck")) &&
        p.readerFeatures.exists(_.contains("vacuumProtocolCheck"))))
    assert(s.metadata.exists(_.configuration
      .get("delta.requireCheckpointProtectionBeforeVersion").contains("4")))
    // this engine implements both features: readable AND writable
    Protocol.assertReadable("t", s.protocol.get)
    Protocol.assertWritable("t", s.protocol.get)
    // a downlevel writer (no vacuumProtocolCheck) must refuse — the
    // feature's whole point is gating maintenance behind a protocol check
    intercept[IllegalArgumentException] {
      Protocol.assertWritable("t", s.protocol.get.copy(writerFeatures =
        Some(Seq("vacuumProtocolCheck", "aFutureVacuumRule"))))
    }
    // checkpoint BELOW the marker: a retention-0 cleanup must refuse the
    // partial sweep (it cannot clear past version 4 in one run)
    log.writeCheckpoint(2L)
    assert(log.cleanupExpiredLogs(0L) == 0,
      "cleanup below requireCheckpointProtectionBeforeVersion must no-op")
    assert(log.listVersions() == Seq(0L, 1L, 2L))
    // a foreign commit clears the marker: the same sweep now reclaims
    val meta = s.metadata.get
    write(3L, Seq(Actions.toJson(meta.copy(configuration =
      meta.configuration - "delta.requireCheckpointProtectionBeforeVersion"))))
    val log2 = GwLog.forTable(new Configuration(), dir.toString)
    log2.writeCheckpoint(3L)
    assert(log2.cleanupExpiredLogs(0L) > 0)
    assert(log2.listVersions().headOption.contains(3L),
      "one-run cleanup past the boundary reclaims the old versions")
  }

  test("snapshot cache: delete-and-recreate with identical (len, mtime) still misses") {
    // the shared snapshot cache's freshness identity must survive the
    // worst case: a table DELETED and RECREATED at the same path whose new
    // commit JSON has the SAME byte length and the SAME mtime (coarse
    // mtime granularity on some stores) — only the content hash prefix
    // can tell them apart
    val dir = Files.createTempDirectory("cacheid").resolve("t")
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    val v0 = logDir.resolve(f"${0L}%020d.json")
    def payload(name: String): Array[Byte] =
      (Actions.toJson(AddFile(s"$name.parquet", 1L, 0L)) + "\n")
        .getBytes(StandardCharsets.UTF_8)
    val mtime = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    Files.write(v0, payload("aa"))
    Files.setLastModifiedTime(v0, mtime)
    val conf = new Configuration()
    assert(GwLog.forTable(conf, dir.toString).snapshot(None)
      .files.map(_.path) == Seq("aa.parquet"))
    // recreate: same length, same mtime, different content
    Files.delete(v0)
    Files.write(v0, payload("bb"))
    Files.setLastModifiedTime(v0, mtime)
    assert(Files.size(v0) == payload("aa").length.toLong)
    assert(GwLog.forTable(conf, dir.toString).snapshot(None)
      .files.map(_.path) == Seq("bb.parquet"),
      "the shared snapshot cache served a stale snapshot for a recreated log")
  }

  test("post-commit snapshot advance is identical to a fresh replay, commit by commit") {
    // the advance continues the replay fold over the committed actions —
    // it must be STRUCTURALLY equal (file order included) to what a fresh
    // reader replays from disk, for every commit shape: bootstrap,
    // blind append, remove+re-add (DML shape), txn marks, domains,
    // metadata restatement
    val dir = Files.createTempDirectory("advance").resolve("t")
    val conf = new Configuration()
    val log = GwLog.forTable(conf, dir.toString)
    val meta = Metadata(id = "fixed", schemaString = """{"type":"struct","fields":[]}""",
      partitionColumns = Nil, configuration = Map.empty, createdTime = 1L)
    def ci(op: String, blind: Boolean) = CommitInfo(1L, op, "Append",
      numFiles = 1, numOutputBytes = 1, isBlindAppend = blind, txnId = "t-" + op)
    val shapes: Seq[Seq[Action]] = Seq(
      Seq(Protocol(), meta, AddFile("a.parquet", 1L, 0L), ci("CREATE TABLE", false)),
      Seq(AddFile("b.parquet", 2L, 0L), SetTransaction("app", 3L, Some(1L)),
        ci("WRITE", true)),
      Seq(RemoveFile("a.parquet", 1L, 5L), AddFile("c.parquet", 3L, 0L),
        DomainMetadata("d1", "{}"), ci("MERGE", false)),
      Seq(meta.copy(configuration = Map("k" -> "v")),
        AddFile("a.parquet", 9L, 1L), // re-add of a tombstoned path
        SetTransaction("app", 5L, Some(2L)), ci("WRITE", false)))
    shapes.zipWithIndex.foreach { case (actions, i) =>
      log.commit(actions)
      LogMetrics.reset()
      val cached = log.snapshot(None)
      // the bootstrap commit has no basis snapshot to advance from; every
      // later commit must serve the post-commit snapshot without a replay
      if (i > 0) assert(LogMetrics.snapshotReplays.sum() == 0L,
        "the post-commit advance must serve snapshot() without a replay")
      val fresh = new GwLog(new org.apache.hadoop.fs.Path(dir.toString), conf)
        .snapshot(None)
      assert(cached == fresh,
        s"advanced snapshot diverged from a fresh replay at v${fresh.version}")
    }
  }
}
