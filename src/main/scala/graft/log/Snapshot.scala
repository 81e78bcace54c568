package graft.log

import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Materialized state of a table at a given log version.
 *
 * Replay semantics (fixed by the reference's golden logs, SURVEY.md §2.3):
 *  - latest `metaData` wins;
 *  - live file set = adds minus removes, keyed by path, last-writer-wins
 *    (an `add` re-asserting an existing path replaces it);
 *  - `protocol` latest wins.
 */
final case class Snapshot(
    version: Long,
    protocol: Option[Protocol],
    metadata: Option[Metadata],
    files: Seq[AddFile]) {

  def schema: StructType =
    metadata
      .map(m => DataType.fromJson(m.schemaString).asInstanceOf[StructType])
      .getOrElse(new StructType())

  def filePaths: Seq[String] = files.map(_.path)

  def totalBytes: Long = files.map(_.size).sum
}

object Snapshot {
  /** Fold per-version action batches (ordered by version) into a snapshot. */
  def replay(version: Long, versions: Seq[Seq[Action]]): Snapshot = {
    var protocol: Option[Protocol] = None
    var metadata: Option[Metadata] = None
    // LinkedHashMap keeps commit order of surviving files deterministic.
    val live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    versions.foreach { actions =>
      actions.foreach {
        case p: Protocol => protocol = Some(p)
        case m: Metadata => metadata = Some(m)
        case a: AddFile => live(a.path) = a
        case r: RemoveFile => live.remove(r.path)
        case _: CommitInfo => ()
      }
    }
    Snapshot(version, protocol, metadata, live.values.toSeq)
  }
}
