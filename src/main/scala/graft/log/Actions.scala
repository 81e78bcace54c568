package graft.log

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * Delta-protocol action model for the transaction log our engine generates.
 *
 * The target JSON-lines format is fixed by the reference's golden files
 * (`/root/reference/src/test/resources/delta/00000000000000000000.json` ..
 * `...03.json`): one action object per line, keys `protocol` / `metaData` /
 * `add` / `remove` / `commitInfo`. See SURVEY.md §2.3.
 *
 * Serialization is hand-built on Jackson `ObjectNode`s so field order and
 * shape match the golden files exactly; no reflection-based codecs.
 */
sealed trait Action

/** Delta protocol action. Plain tables stay at (1, 2) with no feature
  * lists (logs byte-identical to the golden files); the first commit that
  * USES a table feature upgrades to the Delta table-features protocol —
  * (3, 7) with explicit `readerFeatures`/`writerFeatures` — in the same
  * commit ([[GwLog]] auto-upgrade). Readers/writers refuse tables whose
  * demanded features they don't implement ([[Protocol.assertReadable]] /
  * [[Protocol.assertWritable]]) instead of corrupting them — the spec's
  * forward-compatibility contract. */
final case class Protocol(
    minReaderVersion: Int = 1,
    minWriterVersion: Int = 2,
    readerFeatures: Option[Seq[String]] = None,
    writerFeatures: Option[Seq[String]] = None) extends Action

object Protocol {
  /** Features this engine implements end to end — nothing is listed on
    * faith: every reader feature has a reconciling scan path, every
    * writer feature an enforcing write path (appendOnly included:
    * data-changing removes are refused on appendOnly tables). */
  val SupportedReaderFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "timestampNtz", "typeWidening",
      "v2Checkpoint", "vacuumProtocolCheck")
  val SupportedWriterFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "timestampNtz", "changeDataFeed",
      "checkConstraints", "generatedColumns", "identityColumns",
      "inCommitTimestamp", "appendOnly", "typeWidening",
      "allowColumnDefaults", "rowTracking", "v2Checkpoint", "domainMetadata",
      "vacuumProtocolCheck", "checkpointProtection")
  val MaxReaderVersion = 3
  val MaxWriterVersion = 7

  def assertReadable(table: String, p: Protocol): Unit = {
    require(p.minReaderVersion <= MaxReaderVersion,
      s"$table demands reader protocol version ${p.minReaderVersion} " +
        s"(this engine supports up to $MaxReaderVersion) — a newer writer " +
        "owns this table; refusing to read rather than misread it")
    val unknown = p.readerFeatures.getOrElse(Nil).toSet -- SupportedReaderFeatures
    require(unknown.isEmpty,
      s"$table demands reader table features ${unknown.mkString(", ")} this " +
        "engine does not implement — refusing to read rather than misread")
  }

  def assertWritable(table: String, p: Protocol): Unit = {
    assertReadable(table, p)
    require(p.minWriterVersion <= MaxWriterVersion,
      s"$table demands writer protocol version ${p.minWriterVersion} " +
        s"(this engine supports up to $MaxWriterVersion) — refusing to " +
        "write rather than corrupt it")
    val unknown = p.writerFeatures.getOrElse(Nil).toSet -- SupportedWriterFeatures
    require(unknown.isEmpty,
      s"$table demands writer table features ${unknown.mkString(", ")} this " +
        "engine does not implement — refusing to write rather than corrupt")
  }
}

final case class Metadata(
    id: String,
    schemaString: String,
    partitionColumns: Seq[String] = Nil,
    configuration: Map[String, String] = Map.empty,
    createdTime: Long = 0L) extends Action

/** Merge-on-read deletion vector attached to an [[AddFile]] — the deleted
  * row POSITIONS of this data file, encoded as a portable roaring bitmap
  * ([[RoaringBitmapArray]]), in the Delta protocol's `deletionVector`
  * action shape:
  *
  *  - `storageType` `"p"`: `pathOrInlineDv` is the absolute path of a
  *    sidecar file under `<table>/_dv/`; the bitmap's bytes sit at
  *    `offset` framed as [4-byte BE size][bitmap][4-byte BE CRC-32].
  *    One sidecar holds every on-disk DV of its commit.
  *  - `storageType` `"i"`: `pathOrInlineDv` IS the bitmap, Z85-encoded
  *    (zero-padded to 4 bytes; `sizeInBytes` trims it back).
  *
  * `sizeInBytes` is the serialized bitmap length, `cardinality` the number
  * of deleted positions. A DV'd file's bytes never move on DELETE; scans
  * decode the bitmap task-side and reconcile positions at read time, and
  * compaction folds the DV away. The driver only ever holds descriptors —
  * never materialized positions — so planning cost is O(DV'd files), not
  * O(deleted rows). */
final case class DvDescriptor(
    storageType: String,
    pathOrInlineDv: String,
    offset: Option[Int],
    sizeInBytes: Int,
    cardinality: Long) {
  def isOnDisk: Boolean = storageType == "p"
  def isInline: Boolean = storageType == "i"
}

final case class AddFile(
    path: String,
    size: Long,
    modificationTime: Long,
    dataChange: Boolean = true,
    partitionValues: Map[String, String] = Map.empty,
    stats: Option[String] = None,
    dv: Option[DvDescriptor] = None,
    // Row tracking (Delta rowTracking): first row id of this file and the
    // commit version stamped when the id range was assigned. Re-assertions
    // (DV growth, RESTORE) carry both through `copy`, so a file's ids are
    // stable for as long as the file itself lives.
    baseRowId: Option[Long] = None,
    defaultRowCommitVersion: Option[Long] = None) extends Action {
  /** Typed stats decoded from a checkpoint's `statsParsed` struct (Delta
    * `writeStatsAsStruct` parity) — populated by [[Checkpoint.read]] ONLY,
    * never serialized, never part of equality/`copy` (it is a read-side
    * cache: absent, the consumers parse the `stats` JSON as always). At
    * 10 M files this is what lets a snapshot loaded from a checkpoint
    * prune without one JSON parse per file. */
  @transient private[graft] var parsedStats: Option[ParsedStats] = None
}

/** Pre-parsed per-file stats, the typed twin of `AddFile.stats` JSON:
  * bounds carry the SAME `Bound` kinds pruning uses, with numeric values
  * preserved as exact decimal text at the parquet layer so the struct
  * path replays the JSON path bit-for-bit (a float64 re-encoding would
  * diverge on values like 0.1 and flip boundary prunes). */
final case class ParsedStats(
    numRecords: Option[Long],
    gwStatsV: Int,
    minValues: Map[String, Bound],
    maxValues: Map[String, Bound],
    nullCount: Map[String, Long])

final case class RemoveFile(
    path: String,
    size: Long,
    deletionTimestamp: Long,
    dataChange: Boolean = true,
    partitionValues: Map[String, String] = Map.empty) extends Action

final case class CommitInfo(
    timestamp: Long,
    operation: String, // WRITE
    mode: String, // Append | Overwrite
    numFiles: Long,
    numOutputBytes: Long,
    isBlindAppend: Boolean,
    txnId: String,
    /** Delta's in-commit timestamp (`delta.enableInCommitTimestamps`):
      * a MONOTONIC commit clock stamped by [[GwLog.commit]] — strictly
      * greater than the previous commit's, immune to wall-clock skew
      * between writers; `TIMESTAMP AS OF` resolves on it when present.
      * The wall-clock `timestamp` field stays for display parity. */
    inCommitTimestamp: Option[Long] = None,
    /** Delta's `userMetadata`: a caller-supplied audit string riding the
      * commit (`.option("userMetadata", ...)`), surfaced by DESCRIBE
      * HISTORY. Written only when present — plain logs stay golden. */
    userMetadata: Option[String] = None) extends Action {
  /** The timestamp time travel resolves on. */
  def effectiveTimestamp: Long = inCommitTimestamp.getOrElse(timestamp)
}

/** Delta's `cdc` action — a CHANGE-DATA file under `<table>/_change_data/`
  * carrying the commit's row-level changes (table columns +
  * `_change_type`: `insert` / `delete` / `update_preimage` /
  * `update_postimage`). Written by DML commits when the table property
  * `graft.enableChangeDataFeed` (or `delta.enableChangeDataFeed`) is true;
  * never part of the table's live state (`dataChange = false` per the
  * Delta spec), read only by the change-feed surfaces (`rowChanges`,
  * streaming `readChangeFeed`) — which prefer it over deriving the diff,
  * making rewrite/DV commits streamable. */
final case class CdcFile(
    path: String,
    size: Long,
    dataChange: Boolean = false,
    partitionValues: Map[String, String] = Map.empty) extends Action

/** Delta's `txn` action — an application's (streaming writer's) high-water
  * mark: a committed batch `version` for `appId` means every batch at or
  * below it is durably in the table. Carried in checkpoints, so
  * exactly-once replay detection survives any log length (the tail walk
  * over `CommitInfo.txnId` is bounded — see `GwSink.DedupWindow`). */
final case class SetTransaction(
    appId: String,
    version: Long,
    lastUpdated: Option[Long] = None) extends Action

/** Delta's `domainMetadata` action (writer feature `domainMetadata`,
  * PROTOCOL.md): a named metadata domain with an opaque configuration
  * string — the extension point table features hang per-table state on
  * (Delta's own liquid clustering keeps its column set in one). Replay is
  * latest-per-domain wins; `removed = true` is the domain's tombstone (it
  * erases the domain from the snapshot, and replaying past it can never
  * resurrect the old configuration). Writer-only: readers that don't know
  * a domain just carry it. */
final case class DomainMetadata(
    domain: String,
    configuration: String,
    removed: Boolean = false) extends Action

/** Delta's `checkpointMetadata` action (v2Checkpoint reader feature): the
  * self-description a V2 checkpoint carries — it only ever appears inside
  * a checkpoint file, never a commit. */
final case class CheckpointMetadata(version: Long) extends Action

/** Delta's `sidecar` action (v2Checkpoint): a reference from a V2
  * checkpoint manifest to a sidecar parquet holding a slice of the
  * snapshot's FILE actions. `path` is a file name relative to
  * `_delta_log/_sidecars/` (or absolute, per spec). */
final case class SidecarFile(
    path: String,
    sizeInBytes: Long,
    modificationTime: Long) extends Action

object Actions {
  private val mapper = new ObjectMapper()

  private def putMap(parent: ObjectNode, field: String, m: Map[String, String]): Unit = {
    val node = parent.putObject(field)
    m.foreach { case (k, v) => node.put(k, v) }
  }

  /** One action -> one JSON line (no trailing newline). */
  def toJson(a: Action): String = {
    val root = mapper.createObjectNode()
    a match {
      case Protocol(r, w, rf, wf) =>
        val n = root.putObject("protocol")
        n.put("minReaderVersion", r)
        n.put("minWriterVersion", w)
        // feature lists only when present: plain (1,2) logs stay byte-
        // identical to the golden files
        rf.foreach { fs => val a = n.putArray("readerFeatures"); fs.foreach(a.add) }
        wf.foreach { fs => val a = n.putArray("writerFeatures"); fs.foreach(a.add) }
      case Metadata(id, schemaString, partCols, conf, createdTime) =>
        val n = root.putObject("metaData")
        n.put("id", id)
        val fmt = n.putObject("format")
        fmt.put("provider", "parquet")
        fmt.putObject("options")
        n.put("schemaString", schemaString)
        putMap(n, "configuration", conf)
        val pc = n.putArray("partitionColumns")
        partCols.foreach(pc.add)
        n.put("createdTime", createdTime)
      case a: AddFile =>
        val n = root.putObject("add")
        n.put("path", a.path)
        n.put("size", a.size)
        putMap(n, "partitionValues", a.partitionValues)
        n.put("modificationTime", a.modificationTime)
        n.put("dataChange", a.dataChange)
        // row-tracking fields and stats/DV are only written when present,
        // so plain-table logs stay byte-identical to the golden files
        a.baseRowId.foreach(b => n.put("baseRowId", b))
        a.defaultRowCommitVersion.foreach(v => n.put("defaultRowCommitVersion", v))
        a.stats.foreach(s => n.put("stats", s))
        a.dv.foreach { d =>
          val dn = n.putObject("deletionVector")
          dn.put("storageType", d.storageType)
          dn.put("pathOrInlineDv", d.pathOrInlineDv)
          d.offset.foreach(o => dn.put("offset", o))
          dn.put("sizeInBytes", d.sizeInBytes)
          dn.put("cardinality", d.cardinality)
        }
      case RemoveFile(path, size, dts, dataChange, partVals) =>
        val n = root.putObject("remove")
        n.put("path", path)
        n.put("size", size)
        putMap(n, "partitionValues", partVals)
        n.put("deletionTimestamp", dts)
        n.put("dataChange", dataChange)
      case CdcFile(path, size, dataChange, partVals) =>
        val n = root.putObject("cdc")
        n.put("path", path)
        putMap(n, "partitionValues", partVals)
        n.put("size", size)
        n.put("dataChange", dataChange)
      case SetTransaction(appId, version, lastUpdated) =>
        val n = root.putObject("txn")
        n.put("appId", appId)
        n.put("version", version)
        lastUpdated.foreach(ts => n.put("lastUpdated", ts))
      case DomainMetadata(domain, configuration, removed) =>
        val n = root.putObject("domainMetadata")
        n.put("domain", domain)
        n.put("configuration", configuration)
        n.put("removed", removed)
      case CheckpointMetadata(version) =>
        root.putObject("checkpointMetadata").put("version", version)
      case SidecarFile(path, sizeInBytes, modificationTime) =>
        val n = root.putObject("sidecar")
        n.put("path", path)
        n.put("sizeInBytes", sizeInBytes)
        n.put("modificationTime", modificationTime)
      case CommitInfo(ts, op, mode, numFiles, numBytes, blind, txnId, ict, um) =>
        val n = root.putObject("commitInfo")
        n.put("timestamp", ts)
        // only written when the table enables in-commit timestamps, so
        // pre-ICT logs stay byte-identical
        ict.foreach(t => n.put("inCommitTimestamp", t))
        um.foreach(u => n.put("userMetadata", u))
        n.put("operation", op)
        val p = n.putObject("operationParameters")
        p.put("mode", mode)
        p.put("partitionBy", "[]")
        n.put("isolationLevel", "Serializable")
        val m = n.putObject("operationMetrics")
        m.put("numFiles", numFiles)
        m.put("numOutputBytes", numBytes)
        n.put("isBlindAppend", blind)
        n.put("txnId", txnId)
    }
    mapper.writeValueAsString(root)
  }

  private def strMap(n: JsonNode): Map[String, String] =
    if (n == null) Map.empty
    else {
      val it = n.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText) }
      b.result()
    }

  /** One JSON line -> action. Unknown action keys yield None (forward compat). */
  def fromJson(line: String): Option[Action] = {
    val root = mapper.readTree(line)
    if (root.has("protocol")) {
      val n = root.get("protocol")
      def features(field: String): Option[Seq[String]] =
        Option(n.get(field)).map(arr => (0 until arr.size()).map(arr.get(_).asText))
      Some(Protocol(n.get("minReaderVersion").asInt, n.get("minWriterVersion").asInt,
        features("readerFeatures"), features("writerFeatures")))
    } else if (root.has("metaData")) {
      val n = root.get("metaData")
      val parts = Option(n.get("partitionColumns")).map { arr =>
        (0 until arr.size()).map(arr.get(_).asText)
      }.getOrElse(Nil)
      Some(Metadata(
        id = n.get("id").asText,
        schemaString = n.get("schemaString").asText,
        partitionColumns = parts,
        configuration = strMap(n.get("configuration")),
        createdTime = Option(n.get("createdTime")).map(_.asLong).getOrElse(0L)))
    } else if (root.has("add")) {
      val n = root.get("add")
      Some(AddFile(
        path = n.get("path").asText,
        size = n.get("size").asLong,
        modificationTime = n.get("modificationTime").asLong,
        dataChange = Option(n.get("dataChange")).forall(_.asBoolean),
        partitionValues = strMap(n.get("partitionValues")),
        stats = Option(n.get("stats")).map(_.asText),
        dv = Option(n.get("deletionVector")).map(d => DvDescriptor(
          storageType = Option(d.get("storageType")).map(_.asText).getOrElse("p"),
          pathOrInlineDv = d.path("pathOrInlineDv").asText,
          offset = Option(d.get("offset")).map(_.asInt),
          sizeInBytes = d.path("sizeInBytes").asInt,
          cardinality = d.path("cardinality").asLong)),
        baseRowId = Option(n.get("baseRowId")).map(_.asLong),
        defaultRowCommitVersion =
          Option(n.get("defaultRowCommitVersion")).map(_.asLong)))
    } else if (root.has("remove")) {
      val n = root.get("remove")
      Some(RemoveFile(
        path = n.get("path").asText,
        size = Option(n.get("size")).map(_.asLong).getOrElse(0L),
        deletionTimestamp = Option(n.get("deletionTimestamp")).map(_.asLong).getOrElse(0L),
        dataChange = Option(n.get("dataChange")).forall(_.asBoolean),
        partitionValues = strMap(n.get("partitionValues"))))
    } else if (root.has("cdc")) {
      val n = root.get("cdc")
      Some(CdcFile(
        path = n.get("path").asText,
        size = Option(n.get("size")).map(_.asLong).getOrElse(0L),
        dataChange = Option(n.get("dataChange")).exists(_.asBoolean),
        partitionValues = strMap(n.get("partitionValues"))))
    } else if (root.has("txn")) {
      val n = root.get("txn")
      Some(SetTransaction(
        appId = n.get("appId").asText,
        version = n.get("version").asLong,
        lastUpdated = Option(n.get("lastUpdated")).map(_.asLong)))
    } else if (root.has("domainMetadata")) {
      val n = root.get("domainMetadata")
      Some(DomainMetadata(
        domain = n.get("domain").asText,
        configuration = Option(n.get("configuration")).map(_.asText).getOrElse(""),
        removed = Option(n.get("removed")).exists(_.asBoolean)))
    } else if (root.has("checkpointMetadata")) {
      Some(CheckpointMetadata(
        root.get("checkpointMetadata").get("version").asLong))
    } else if (root.has("sidecar")) {
      val n = root.get("sidecar")
      Some(SidecarFile(
        path = n.get("path").asText,
        sizeInBytes = Option(n.get("sizeInBytes")).map(_.asLong).getOrElse(0L),
        modificationTime =
          Option(n.get("modificationTime")).map(_.asLong).getOrElse(0L)))
    } else if (root.has("commitInfo")) {
      val n = root.get("commitInfo")
      val params = Option(n.get("operationParameters"))
      val metrics = Option(n.get("operationMetrics"))
      Some(CommitInfo(
        timestamp = Option(n.get("timestamp")).map(_.asLong).getOrElse(0L),
        operation = Option(n.get("operation")).map(_.asText).getOrElse("WRITE"),
        mode = params.flatMap(p => Option(p.get("mode"))).map(_.asText).getOrElse(""),
        numFiles = metrics.flatMap(m => Option(m.get("numFiles"))).map(_.asLong).getOrElse(0L),
        numOutputBytes = metrics.flatMap(m => Option(m.get("numOutputBytes"))).map(_.asLong).getOrElse(0L),
        isBlindAppend = Option(n.get("isBlindAppend")).exists(_.asBoolean),
        txnId = Option(n.get("txnId")).map(_.asText).getOrElse(""),
        inCommitTimestamp = Option(n.get("inCommitTimestamp")).map(_.asLong),
        userMetadata = Option(n.get("userMetadata")).map(_.asText)))
    } else None
  }
}
