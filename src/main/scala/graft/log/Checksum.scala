package graft.log

import com.fasterxml.jackson.databind.ObjectMapper

/**
 * Delta version checksum (`_delta_log/<version>.crc`): a one-line JSON
 * summary of the POST-commit table state, written best-effort alongside
 * every commit. Two jobs, both metadata-scale:
 *
 *  - **State verification.** Replay bugs (a lost remove, a double-counted
 *    re-assertion, a torn compacted segment served as truth) corrupt the
 *    live file set silently — results just come back wrong. The crc pins
 *    the writer's view of `numFiles`/`tableSizeBytes` at every version, so
 *    any later reader can cross-check its own replay ([[GwLog.verifyChecksum]])
 *    and fail LOUDLY instead. At 100 TB, where a snapshot is the only
 *    thing standing between a query and a million-file listing, this is
 *    the cheap invariant that catches metadata corruption the data never
 *    will.
 *  - **Listing-free table stats.** `tableSizeBytes`/`numFiles` at HEAD
 *    answer the planner's "how big is this table" (broadcast decisions,
 *    shuffle sizing) from ONE small-object read — no snapshot replay, no
 *    file listing.
 *
 * The counts mirror Delta OSS's VersionChecksum (delta-io/delta,
 * `org.apache.spark.sql.delta.stats.VersionChecksum`); like Delta the file
 * is advisory — absence or corruption never blocks a read (the version
 * JSONs stay the committed truth), only [[GwLog.verifyChecksum]] surfaces
 * a mismatch. Reference scope: the reference's single-writer log
 * (`Guidewire.scala:63-196`) carries no per-version state summary at all;
 * this is parity-plus hardening for the multi-writer/incremental paths.
 */
final case class VersionChecksum(
    tableSizeBytes: Long,
    numFiles: Long,
    numMetadata: Long,
    numProtocol: Long,
    numDeletionVectors: Long,
    numDeletedRecords: Long)

object VersionChecksum {
  private val mapper = new ObjectMapper()

  /** The checksum of a replayed snapshot — the single definition both the
    * write path and the verifier use, so they can never drift. */
  def of(s: Snapshot): VersionChecksum = VersionChecksum(
    tableSizeBytes = s.totalBytes,
    numFiles = s.files.size.toLong,
    numMetadata = s.metadata.size.toLong,
    numProtocol = s.protocol.size.toLong,
    numDeletionVectors = s.files.count(_.dv.isDefined).toLong,
    numDeletedRecords = s.files.flatMap(_.dv).map(_.cardinality).sum)

  def toJson(c: VersionChecksum): String = {
    val root = mapper.createObjectNode()
    root.put("tableSizeBytes", c.tableSizeBytes)
    root.put("numFiles", c.numFiles)
    root.put("numMetadata", c.numMetadata)
    root.put("numProtocol", c.numProtocol)
    root.put("numDeletionVectors", c.numDeletionVectors)
    root.put("numDeletedRecords", c.numDeletedRecords)
    mapper.writeValueAsString(root)
  }

  /** None on any parse problem — a damaged crc must read as ABSENT, never
    * as a verification failure by itself (verify recomputes and compares
    * only against a crc that parsed). */
  def fromJson(line: String): Option[VersionChecksum] =
    try {
      val n = mapper.readTree(line)
      def l(f: String): Option[Long] =
        Option(n.get(f)).filter(_.canConvertToLong).map(_.asLong())
      for {
        size <- l("tableSizeBytes")
        files <- l("numFiles")
      } yield VersionChecksum(
        tableSizeBytes = size,
        numFiles = files,
        numMetadata = l("numMetadata").getOrElse(0L),
        numProtocol = l("numProtocol").getOrElse(0L),
        numDeletionVectors = l("numDeletionVectors").getOrElse(0L),
        numDeletedRecords = l("numDeletedRecords").getOrElse(0L))
    } catch { case scala.util.control.NonFatal(_) => None }
}
