package org.apache.spark.sql.graftbridge

import graft.log.{AddFile, GwLog, Metadata}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset => OffsetV2, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset

/**
 * Stream offset over a gwdelta log: a log VERSION, plus — only while the
 * initial snapshot is being rate-limited — the index of the next snapshot
 * file to serve (`snapIdx`). A fully-consumed position serializes as the
 * bare version number, byte-identical to the pre-admission-control format,
 * so existing checkpoints restart under the new code (and checkpoints
 * written without a mid-snapshot position restart under the old).
 *
 * The snapshot slice order is the snapshot's file order, which is the
 * deterministic commit-order replay of the log ([[graft.log.Snapshot]]) —
 * the same log always yields the same slices.
 */
case class GwStreamOffset(version: Long, snapIdx: Long = -1L) extends OffsetV1 {
  override def json: String =
    if (snapIdx < 0) version.toString else s"""{"v":$version,"i":$snapIdx}"""
}

object GwStreamOffset {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parse(json: String): GwStreamOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val n = mapper.readTree(t)
      GwStreamOffset(n.path("v").asLong(), n.path("i").asLong(-1L))
    } else GwStreamOffset(t.toLong)
  }

  /** Any offset the engine hands back (ours, LongOffset, or a checkpoint's
    * SerializedOffset) -> the typed form; null = nothing consumed. */
  def of(o: OffsetV2): GwStreamOffset = o match {
    case null => GwStreamOffset(-1L)
    case g: GwStreamOffset => g
    case l: LongOffset => GwStreamOffset(l.offset)
    case other => parse(other.json)
  }
}

/**
 * Admission control shared by both stream faces of a gwdelta table (the V1
 * `format("gwdelta")` source and the V2 catalog `readStream.table` stream):
 * `maxFilesPerTrigger` / `maxBytesPerTrigger` bound each micro-batch, and
 * `Trigger.AvailableNow` runs the backlog in those bounded batches and
 * stops. The initial snapshot — the 100 TB case — is sliced WITHIN a
 * version by file index ([[GwStreamOffset]]); incremental tailing admits
 * whole versions (a version is one commit). Both paths always admit at
 * least one file / one version per batch, so a single oversized file can
 * never stall the stream.
 */
object GwStreamAdmission {

  /** (maxFiles, maxBytes) implied by a ReadLimit; None = unbounded. Row
    * limits are not expressible over a file log and admit everything. */
  def caps(limit: ReadLimit): (Option[Int], Option[Long]) = limit match {
    case f: ReadMaxFiles => (Some(f.maxFiles), None)
    case b: ReadMaxBytes => (None, Some(b.maxBytes))
    case c: CompositeReadLimit =>
      c.getReadLimits.map(caps).reduce { (a, b) =>
        (Seq(a._1, b._1).flatten.minOption, Seq(a._2, b._2).flatten.minOption)
      }
    case _ => (None, None)
  }

  /** The source's default ReadLimit from its read options. Bytes accept
    * size suffixes ("512m"). */
  def defaultLimit(options: String => Option[String]): ReadLimit = {
    val limits =
      options("maxFilesPerTrigger").map(v => ReadLimit.maxFiles(v.toInt)).toSeq ++
        options("maxBytesPerTrigger").map(v =>
          ReadLimit.maxBytes(org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)))
    limits match {
      case Nil => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Files a batch serves in an admitted range `(start, end]`. Snapshot
    * slices serve the files `[snapIdx_start, snapIdx_end)` of the pinned
    * version's snapshot; incremental ranges serve the `dataChange` adds of
    * the versions, skipping deletion-vector re-assertions (no new rows),
    * and stop the stream on a schema restatement. */
  def rangeFiles(log: GwLog, tablePath: String,
      start: GwStreamOffset, end: GwStreamOffset): Seq[AddFile] = {
    if (end.version < 0) return Nil
    if (start.version < 0 || start.snapIdx >= 0) {
      val sv = if (start.version < 0) end.version else start.version
      require(end.version == sv,
        s"snapshot-slice offsets must pin one version: $start -> $end")
      val files = log.snapshot(Some(sv)).files
      val from = math.max(start.snapIdx, 0L).toInt
      val to = if (end.snapIdx < 0) files.size else end.snapIdx.toInt
      files.slice(from, to)
    } else {
      val actions = ((start.version + 1) to end.version).flatMap(log.readVersion)
      if (actions.exists(_.isInstanceOf[Metadata]))
        throw new IllegalStateException(
          s"gwdelta stream at $tablePath hit a schema restatement in versions " +
            s"(${start.version}, ${end.version}]: the table was replaced; " +
            "restart the stream from a fresh checkpoint to consume the " +
            "restated snapshot")
      actions.collect { case a: AddFile if a.dataChange && a.dv.isEmpty => a }
    }
  }

  /** The next admitted end offset from `start` under `limit`, never past
    * `capVersion` (Trigger.AvailableNow's pin). Returns `start` itself when
    * there is nothing to admit. */
  def nextOffset(log: GwLog, start: GwStreamOffset, limit: ReadLimit,
      capVersion: Option[Long]): GwStreamOffset = {
    val latest = {
      val l = log.latestVersion().getOrElse(-1L)
      capVersion.fold(l)(math.min(l, _))
    }
    if (latest < 0) return start
    val (maxFiles, maxBytes) = caps(limit)

    if (start.version < 0 || start.snapIdx >= 0) {
      // initial snapshot, possibly mid-consumption: the version is pinned
      // for the whole snapshot; later commits arrive incrementally after
      val sv = if (start.version < 0) latest else start.version
      val files = log.snapshot(Some(sv)).files
      val from = math.max(start.snapIdx, 0L).toInt
      val to = sliceEnd(files, from, maxFiles, maxBytes)
      if (to >= files.size) GwStreamOffset(sv) else GwStreamOffset(sv, to)
    } else if (latest <= start.version) start
    else if (maxFiles.isEmpty && maxBytes.isEmpty) GwStreamOffset(latest)
    else {
      // whole versions, accumulating this batch's file count/bytes; always
      // at least one version of progress
      var v = start.version
      var admitted = start.version
      var nf = 0
      var nb = 0L
      while (v < latest) {
        v += 1
        val adds = log.readVersion(v)
          .collect { case a: AddFile if a.dataChange && a.dv.isEmpty => a }
        val overflow = maxFiles.exists(nf + adds.size > _) ||
          maxBytes.exists(nb + adds.map(_.size).sum > _)
        if (overflow && admitted > start.version) return GwStreamOffset(admitted)
        nf += adds.size
        nb += adds.map(_.size).sum
        admitted = v
        if (maxFiles.exists(nf >= _) || maxBytes.exists(nb >= _))
          return GwStreamOffset(admitted)
      }
      GwStreamOffset(admitted)
    }
  }

  /** End index (exclusive) of a snapshot slice starting at `from` under the
    * caps; at least one file when any remain. */
  private def sliceEnd(files: Seq[AddFile], from: Int,
      maxFiles: Option[Int], maxBytes: Option[Long]): Int = {
    if (maxFiles.isEmpty && maxBytes.isEmpty) return files.size
    var to = from
    var nb = 0L
    while (to < files.size) {
      val f = files(to)
      val overflow = maxFiles.exists(m => to - from + 1 > m) ||
        maxBytes.exists(m => nb + f.size > m)
      if (overflow && to > from) return to
      nb += f.size
      to += 1
      if (maxFiles.exists(m => to - from >= m) || maxBytes.exists(nb >= _))
        return to
    }
    files.size
  }
}
