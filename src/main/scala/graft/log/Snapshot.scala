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

  /**
   * Stats-based file skipping over harvested footer min/max (see
   * `SchemaProbe.readStats`): the live files whose value range for
   * `column` can intersect `[lower, upper]`. Files without usable stats
   * for the column are always kept — pruning may keep too much, never
   * too little. At 100 TB this is the difference between opening every
   * live file of a snapshot and opening only the ones a selective
   * predicate can touch.
   */
  def filesForRange(column: String, lower: Double, upper: Double): Seq[AddFile] =
    filesForRanges(Seq((column, lower, upper)))

  /** Conjunction of range constraints `(column, lower, upper)`. */
  def filesForRanges(constraints: Seq[(String, Double, Double)]): Seq[AddFile] =
    files.filter { f =>
      constraints.forall { case (column, lower, upper) =>
        Snapshot.statsBounds(f, column) match {
          case Some((mn, mx)) => mx >= lower && mn <= upper
          case None => true
        }
      }
    }
}

object Snapshot {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Numeric (min, max) of `column` from a file's stats JSON, if present. */
  private[log] def statsBounds(f: AddFile, column: String): Option[(Double, Double)] =
    f.stats.flatMap { s =>
      scala.util.Try {
        val root = mapper.readTree(s)
        val mn = root.path("minValues").path(column)
        val mx = root.path("maxValues").path(column)
        if (mn.isNumber && mx.isNumber) Some((mn.asDouble, mx.asDouble)) else None
      }.toOption.flatten
    }

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
