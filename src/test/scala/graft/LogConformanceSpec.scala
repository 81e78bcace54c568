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
 * `engineInfo` / `userMetadata`, and an unknown `domainMetadata` action.
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
    // exactly one line is an unknown action (domainMetadata) — None, not a crash
    val unknown = parsed.filter(_._2.isEmpty)
    assert(unknown.map(_._1).forall(_.contains("domainMetadata")),
      s"only domainMetadata may be unknown: ${unknown.map(_._1)}")
    assert(unknown.size == 1)
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
    // v2: remove tombstones p=b; the unknown domainMetadata changes nothing
    val s2 = log.snapshot(None)
    assert(s2.version == 2L)
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
}
