package graft.log

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Transaction-log reader/writer over the Hadoop FileSystem API.
 *
 * Log layout mirrors the Delta protocol (as fixed by the reference's golden
 * files, SURVEY.md §2.3): `<tablePath>/_delta_log/<%020d-version>.json`,
 * JSON-lines, one action per line. Works on `file://`, `hdfs://`, `s3a://`.
 *
 * Commits use `FileSystem.create(path, overwrite = false)` — atomic
 * create-no-overwrite on HDFS/local — as optimistic concurrency control.
 * The indexer's fan-out guarantees a single writer per table
 * (reference behavior: one Spark task per table, Guidewire.scala:71-74),
 * so collisions only occur on misuse; we fail fast rather than retry.
 */
class GwLog(val tablePath: Path, conf: Configuration) {
  private val logDir = new Path(tablePath, GwLog.LogDirName)
  private def fs: FileSystem = logDir.getFileSystem(conf)

  def logPathFor(version: Long): Path = new Path(logDir, f"$version%020d.json")

  /** Sorted list of committed versions; empty when the table has no log. */
  def listVersions(): Seq[Long] = {
    val f = fs
    if (!f.exists(logDir)) Nil
    else
      f.listStatus(logDir).toSeq
        .map(_.getPath.getName)
        .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
        .map(_.stripSuffix(".json").toLong)
        .sorted
  }

  def latestVersion(): Option[Long] = listVersions().lastOption

  def readVersion(version: Long): Seq[Action] = {
    val in = fs.open(logPathFor(version))
    try {
      val text = new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).flatMap(Actions.fromJson).toSeq
    } finally in.close()
  }

  /** Write `actions` as the next version; returns the committed version. */
  def commit(actions: Seq[Action]): Long = {
    val version = latestVersion().map(_ + 1).getOrElse(0L)
    commitAt(version, actions)
    version
  }

  def commitAt(version: Long, actions: Seq[Action]): Unit = {
    val f = fs
    f.mkdirs(logDir)
    val target = logPathFor(version)
    val out = f.create(target, /* overwrite = */ false)
    try {
      val payload = actions.map(Actions.toJson).mkString("", "\n", "\n")
      out.write(payload.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** Replay actions of versions 0..version (or all) into a snapshot. */
  def snapshot(versionAsOf: Option[Long] = None): Snapshot = {
    val versions = listVersions()
    require(versions.nonEmpty, s"No transaction log at $logDir")
    val upTo = versionAsOf.getOrElse(versions.last)
    require(
      versions.contains(upTo),
      s"Version $upTo not found at $logDir (have ${versions.headOption.getOrElse(-1L)}..${versions.lastOption.getOrElse(-1L)})")
    val replayed = versions.takeWhile(_ <= upTo)
    Snapshot.replay(upTo, replayed.map(v => readVersion(v)))
  }

  /** (version, commitInfo) per version — basis of `GwTable.history`. */
  def history(): Seq[(Long, Option[CommitInfo])] =
    listVersions().map { v =>
      v -> readVersion(v).collectFirst { case ci: CommitInfo => ci }
    }

  def delete(): Unit = { fs.delete(tablePath, true); () }

  def exists(): Boolean = fs.exists(logDir) && listVersions().nonEmpty
}

object GwLog {
  val LogDirName = "_delta_log"
  def forTable(conf: Configuration, tablePath: String): GwLog =
    new GwLog(new Path(tablePath), conf)
}
